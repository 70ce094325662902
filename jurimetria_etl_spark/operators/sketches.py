"""Approximate / mergeable sketch operators — the cardinality and
frequency toolkit a 100 TB pipeline runs instead of exact global
aggregation when the answer only needs to be right to a few percent.

Spark-first design: everything here rides the built-in JVM sketch
aggregates (HLL++ via ``approx_count_distinct``, Apache DataSketches HLL
via ``hll_sketch_agg``/``hll_union_agg``, ``count_min_sketch``); the only
Python stage is the per-partition Misra-Gries summarizer, which is
Arrow-batched ``mapInPandas`` emitting ≤ k rows per partition — the whole
point of that operator is to make the shuffle *smaller* than the
exact-count alternative.

Scale cheat-sheet (SCALE.md §Aggregation):

- exact ``count_distinct`` shuffles every distinct value; HLL shuffles a
  ~KB sketch per group — the 100 TB daily-uniques query is HLL or it
  doesn't run.
- sketch *partials* (``hll_sketch_by``) are the ingest-time artifact: one
  sketch per (day, key) persisted next to the data lets any later rollup
  (week, month, all-time) union sketches instead of rescanning the lake.
- Misra-Gries candidates bound the frequent-items shuffle at
  k × partitions rows regardless of value cardinality, with the classic
  deterministic guarantee: every item with global frequency > N/(k+1)
  survives; an exact recount pass over the (tiny) candidate set turns the
  lower bounds into exact counts.

Oracle note: approximate answers are engine-specific by construction, so
these are deliberately NOT in the driver's DuckDB hash-compare registry;
tests/test_sketches.py pins exactness properties instead (error bounds,
partial-vs-direct identity, the MG superset guarantee, exactness of the
recount pass).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# ───────────────────────── distinct counting (HLL) ─────────────────────────
def approx_distinct(
    df: DataFrame, cols: list[str] | str, rsd: float = 0.05
) -> DataFrame:
    """Approximate distinct count per column — HyperLogLog++ with relative
    standard deviation ``rsd``.  One pass, one ~KB accumulator per column;
    the exact equivalent shuffles every distinct value."""
    if isinstance(cols, str):
        cols = [cols]
    return df.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct")
            for c in cols
        ]
    )


def hll_sketch_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Mergeable per-group HLL partials (DataSketches binary) — the
    persist-at-ingest artifact: store one sketch per (partition key) and
    every later coarser rollup is a sketch union, not a rescan.

    ``lg_config_k=12`` ⇒ 4 Ki buckets ≈ 1.6 % relative error and ~2 KB per
    group — tune up for tighter error, down for narrower shuffles."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(sketch_col)
    )


def hll_rollup(
    partials: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Roll mergeable HLL partials up to coarser keys (possibly none) and
    surface the distinct estimate.  Shuffles one ~KB sketch per input
    group — at 100 TB this is the difference between 'merge 365 daily
    sketches' and 're-read a year of data'.

    Union semantics are exact over sketches: rollup(partials) ≡ a direct
    sketch over the union of the underlying rows (pinned in tests)."""
    merged = F.hll_union_agg(sketch_col, F.lit(False))
    est = F.hll_sketch_estimate(merged).alias(estimate_col)
    if group_cols:
        return partials.groupBy(*group_cols).agg(est)
    return partials.agg(est)


# ───────────────────────── quantiles (KLL-style) ───────────────────────────
def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float] = (0.25, 0.5, 0.9),
    accuracy: int = 10_000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate quantiles via Spark's mergeable percentile sketch
    (``approx_percentile``, Greenwald-Khanna): rank error ≤ 1/accuracy,
    O(accuracy) state per group instead of the per-group sort exact
    percentiles cost (q32's documented expensive path).  The sketch
    partial-aggregates map-side, so shuffled bytes are sketch-sized, not
    row-sized — the 100 TB latency-percentile query."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    agg = F.approx_percentile(col, probs, F.lit(accuracy)).alias("quantiles")
    out = (
        df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)
    )
    # Percent-based, dot-free, unambiguous names: 0.5 -> p50, 1.0 -> p100,
    # 0.999 -> p99_9.  (The old '0.'-strip scheme named 0.5 'q5' — which
    # reads as the 5th percentile — and 1.0 'q1.0', whose dot breaks
    # F.col without backticks.)
    def _name(p: float) -> str:
        pct = p * 100
        return f"p{int(pct)}" if pct == int(pct) else (
            "p" + str(pct).replace(".", "_")
        )

    names = [_name(float(p)) for p in probabilities]
    return out.select(
        *(group_cols or []),
        *[
            F.col("quantiles").getItem(i).alias(n)
            for i, n in enumerate(names)
        ],
    )


# ──────────────────────── frequency (count-min) ────────────────────────────
def count_min(
    df: DataFrame,
    col: str | Column,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    sketch_col: str = "cms",
) -> DataFrame:
    """One-row count-min sketch of a column (Spark's built-in JVM
    aggregate): point-queryable frequency table in O(1/eps) space.
    Overcounts by at most eps·N with the given confidence, never
    undercounts."""
    c = F.col(col) if isinstance(col, str) else col
    return df.agg(
        F.count_min_sketch(
            c, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias(sketch_col)
    )


def cm_estimate_counts(
    spark: SparkSession, sketch_bytes: bytes, items: Iterable
) -> dict:
    """Point-query a serialized count-min sketch for the given items —
    driver-side (the sketch is a single bounded binary, not data).  Items
    must match the sketched column's JVM type (int/long/string)."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {item: cms.estimateCount(item) for item in items}


# ────────────────────── frequent items (Misra-Gries) ───────────────────────
def _mg_summarize(col_name: str, k: int):
    """Per-partition Misra-Gries summarizer for mapInPandas: ≤ k
    (item, weight) rows per partition, where weight lower-bounds the
    partition count by at most n_partition/(k+1)."""

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # vectorized per batch: exact value_counts, then one
            # mergeable-summaries reduction (Agarwal et al.): after
            # summing, subtract the (k+1)-th largest weight from every
            # counter and drop the non-positive — the undercount stays
            # bounded by n_partition/(k+1).
            vc = pdf[col_name].dropna().value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: w - sub for key, w in counters.items() if w > sub
                }
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "weight": list(counters.values())}
            )

    return summarize


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 100,
    min_count: int | None = None,
    exact_recount: bool = True,
) -> DataFrame:
    """Heavy hitters with the Misra-Gries mergeability guarantee: the
    candidate set provably contains every value whose global frequency
    exceeds N/(k+1) — per-partition summaries undercount by at most
    n_p/(k+1) each, so a value missing from every summary has global count
    ≤ Σ n_p/(k+1) = N/(k+1).

    Two phases, both bounded:

    1. ``mapInPandas`` MG summarizer → ≤ k rows *per partition* (the
       shuffle is k × partitions rows however wild the value cardinality);
       summaries merge by summing weights (a further lower bound).
    2. ``exact_recount=True`` (default) broadcast-semi-joins the candidate
       set back over the data for exact counts — one extra scan, zero
       wide shuffle, and the output is exact for every reported item.
       With ``exact_recount=False`` you get the one-pass lower bounds.

    Returns (item, cnt) sorted desc; ``min_count`` filters the tail.
    NULL values are ignored (an exact ``groupBy`` would count them as a
    group; nulls can't be heavy-hitter *items*).  Exact
    ``groupBy(col).count()`` remains the right call when the distinct
    cardinality is known to fit a shuffle — this operator is for the
    heavy-tailed token/URL/ngram columns where it doesn't."""
    field = df.schema[col]
    out_schema = f"item {field.dataType.simpleString()}, weight long"
    summaries = df.select(F.col(col)).mapInPandas(
        _mg_summarize(col, k), schema=out_schema
    )
    candidates = summaries.groupBy("item").agg(
        F.sum("weight").alias("weight_lb")
    )
    if not exact_recount:
        out = candidates.select(
            F.col("item"), F.col("weight_lb").alias("cnt")
        )
    else:
        # candidate set is ≤ k × partitions rows — broadcast it; the
        # recount is a map-side semi filter + partial agg, no wide
        # shuffle.  The input column is isolated first so a source column
        # literally named "item" can't make the join condition ambiguous.
        vals = df.select(F.col(col).alias("__fi_val"))
        out = (
            vals.join(
                F.broadcast(candidates.select("item")),
                F.col("__fi_val") == F.col("item"),
                "inner",
            )
            .groupBy("item")
            .agg(F.count("*").alias("cnt"))
        )
    if min_count is not None:
        out = out.where(F.col("cnt") >= min_count)
    return out.orderBy(F.col("cnt").desc(), F.col("item"))


def heavy_hitters_exact(
    df: DataFrame, col: str, min_share: float = 0.01
) -> DataFrame:
    """Exact heavy hitters (share ≥ ``min_share`` of all rows): partial
    agg → shuffle of |distinct| group rows → share filter.  The exactness
    baseline the sketch variants are tested against; right whenever the
    distinct cardinality fits a shuffle.

    The total N is derived from the SAME grouped counts (1-row broadcast
    re-aggregate), not a separate ``df.count()`` action: one job, one pass
    over the input (the two aggregate branches share the grouped shuffle
    via ReuseExchange), and the share threshold is always consistent with
    the counts even on a nondeterministic source."""
    grouped = df.groupBy(F.col(col).alias("item")).agg(
        F.count("*").alias("cnt")
    )
    total = grouped.agg(F.sum("cnt").alias("__total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= float(min_share) * F.col("__total"))
        .drop("__total")
        .orderBy(F.col("cnt").desc(), F.col("item"))
    )
