"""TPC-H-style composite showcase queries (t-series).

The corpus q-series tests operators one at a time; these four classics
compose them — multi-way joins, selective filters, grouped decimal
aggregates, top-k — the way a real analyst would, over the driver's
TPC-H-ish fixtures (TESTDATA.md; note the fixtures carry a subset of the
official columns, so Q3/Q5/Q10 substitute o_orderpriority for the missing
o_shippriority/phone/address fields).

Determinism conventions follow plans/corpus.py: money aggregates
accumulate in exact decimals and surface as doubles; every top-k ORDER BY
carries a unique tiebreaker.

Scale notes: dims (region, nation — and customer at fixture scale) ride
broadcast joins; the orders⨝lineitem spine is the only real shuffle, and
AQE re-plans it if skewed.  Each docstring notes the intended plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jurimetria_etl_spark.plans.corpus import Q, _fact, _t, dsum


def _davg(col, alias: str, prec: int = 28, scale: int = 8):
    """Deterministic double avg: exact decimal sum → double, ÷ count in
    double arithmetic (plain avg() would accumulate doubles in partition
    order; dividing while still decimal would hit engine-specific
    division-scale rules).  Rounded to 4 decimals: once the exact decimal
    sum exceeds 2⁵³ the decimal→double conversion itself is lossy and
    engines legitimately differ in the last ulp (observed at sf0.1:
    2828375807.434132 vs ...4341316) — the oracle SQL carries the same
    ROUND."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")
        / F.count("*"),
        4,
    ).alias(alias)


def t01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan grouped aggregate over lineitem.  One wide
    partial-agg before the (tiny, 4-group) shuffle; the shipdate filter is a
    parquet PushedFilter."""
    li = _fact(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # The (28,8) group sums exceed 2^53 unscaled at sf0.1, so the exact
    # decimal->double conversion itself is engine-ulp-sensitive (same
    # failure mode as _davg) - round to 4 decimals on both sides.
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.round(
                F.sum(disc_price.cast("decimal(28,8)")).cast("double"), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(charge.cast("decimal(28,8)")).cast("double"), 4
            ).alias("sum_charge"),
            _davg("l_quantity", "avg_qty"),
            _davg("l_extendedprice", "avg_price"),
            _davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


T01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def t02_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⨝ orders ⨝ lineitem, top-10
    unshipped orders by revenue.  Customer is the small side (broadcast);
    top-k plans as TakeOrderedAndProject, never a global sort."""
    cutoff = F.lit("1996-03-15").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _fact(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _fact(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                28,
                8,
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


T02_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def t03_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join where customer and supplier must share
    a nation.  region→nation broadcast-prunes the probe side before the
    fact shuffle; the c_nationkey = s_nationkey equality rides the join
    keys, not a post-filter."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    rn = F.broadcast(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "n_name")
    )
    cust = _t(spark, sf_dir, "customer")
    orders = _fact(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _fact(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(rn, cust.c_nationkey == rn.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                28,
                8,
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


T03_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def t04_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer for one quarter,
    top 20.  The R-flag filter prunes lineitem at the scan; nation is
    broadcast; one shuffle for the orders⨝lineitem spine, one for the
    customer rollup."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    orders = _fact(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _fact(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                28,
                8,
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


T04_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""



def t05_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in a quarter having at
    least one "late" lineitem — an EXISTS correlated on the join key plus a
    non-equi date predicate, planned as a LEFT SEMI join on the
    orders⨝lineitem spine (the fixture lacks commit/receipt dates, so
    "late" substitutes l_shipdate > o_orderdate + 60 days).  Semi-join
    output carries only the orders side, so the count never double-counts
    multi-lineitem orders.  Registered since round 3."""
    orders = _fact(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _fact(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


T05_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def t06_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the fixture carries no shipmode/commitdate, so the
    two-bucket conditional count rides order priority and ship lag):
    orders ⨝ lineitem, lines shipped > 90 days after the order date,
    split into high-priority (1-URGENT/2-HIGH) vs other counts per
    returnflag.  Plan: both facts widened, one shuffled equi-join, partial
    agg before the tiny final shuffle."""
    orders = _fact(spark, sf_dir, "orders")
    li = _fact(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull()
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("bigint")).alias("high_line_count"),
            F.sum((~hi).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


T06_SQL = """
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate IS NOT NULL
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def t07_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship-month.  part is
    the broadcast side; the conditional and total sums accumulate in
    exact decimals and divide as doubles (determinism convention)."""
    li = _fact(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = F.broadcast(_t(spark, sf_dir, "part"))
    disc = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(28,8)")
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(28,8)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


T07_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
                     ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


TPCH: dict[str, Q] = {
    "t01_pricing_summary": Q(t01_pricing_summary, T01_SQL),
    "t02_shipping_priority": Q(t02_shipping_priority, T02_SQL),
    "t03_local_supplier_volume": Q(t03_local_supplier_volume, T03_SQL),
    "t04_returned_items": Q(t04_returned_items, T04_SQL),
    "t05_order_priority": Q(t05_order_priority, T05_SQL),
}

# Outside the driver's 50-entry window: pytest-oracle + bench coverage.
TPCH_EXTRA: dict[str, Q] = {
    "t06_late_shipments": Q(t06_late_shipments, T06_SQL),
    "t07_promo_revenue": Q(t07_promo_revenue, T07_SQL),
}
