"""As-of / range / salted join semantics + plan-shape guarantees.

These operators are the generalized-library members Spark lacks as
built-ins (SURVEY §2.6 note); their scale contracts (single shuffle for
as-of, hash join for range) are asserted against the physical plan, not
just trusted from the docstring.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
    salted_join,
)

TS = dt.datetime


def _quotes(spark):
    return spark.createDataFrame(
        [
            ("A", TS(2024, 1, 1, 10, 0, 0), 100.0),
            ("A", TS(2024, 1, 1, 10, 5, 0), 101.0),
            ("A", TS(2024, 1, 1, 10, 5, 0), 102.0),  # tie on (key, ts)
            ("B", TS(2024, 1, 1, 9, 0, 0), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [
            ("A", TS(2024, 1, 1, 10, 3, 0), 1),   # matches 10:00 quote
            ("A", TS(2024, 1, 1, 10, 5, 0), 2),   # tie ts → inclusive match
            ("A", TS(2024, 1, 1, 9, 59, 0), 3),   # before any quote → NULL
            ("B", TS(2024, 1, 1, 12, 0, 0), 4),   # stale match (3 h old)
            ("C", TS(2024, 1, 1, 10, 0, 0), 5),   # key never quoted → NULL
        ],
        "sym string, ts timestamp, qty int",
    )


def test_asof_basic_semantics(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on="sym", right_cols=["px"]
    )
    got = {r["qty"]: r["px"] for r in out.collect()}
    assert got[1] == 100.0
    assert got[2] == 102.0  # inclusive at equal ts; max payload wins the tie
    assert got[3] is None
    assert got[4] == 50.0
    assert got[5] is None
    # matched right timestamp is exposed (suffixed, 'ts' clashes with left)
    assert "ts_r" in out.columns


def test_asof_tolerance(spark):
    out = asof_join(
        _trades(spark),
        _quotes(spark),
        on="sym",
        right_cols=["px"],
        tolerance="30 minutes",
    )
    got = {r["qty"]: r["px"] for r in out.collect()}
    assert got[1] == 100.0  # 3 min old: in tolerance
    assert got[4] is None   # 3 h old: dropped, row kept (left-outer)


def test_asof_single_shuffle(spark):
    plan = asof_join(
        _trades(spark), _quotes(spark), on="sym", right_cols=["px"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_matches_naive_and_stays_hash(spark, sf_dir):
    from jurimetria_etl_spark.sources.fixtures import load_fixture

    ev = load_fixture(spark, sf_dir, "events")
    pts = ev.select(F.col("user_id").alias("lu"), F.col("ts").alias("lts"))
    ivs = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        "ts",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi"),
    )
    bucketed = (
        range_join_bucketed(
            pts, ivs, pts["lts"], ivs["ts"], ivs["hi"],
            extra_cond=pts["lu"] == ivs["user_id"], bucket_seconds=600,
        )
        .groupBy("err_id").count()
    )
    naive = (
        pts.join(
            ivs,
            (pts["lu"] == ivs["user_id"])
            & (pts["lts"] >= ivs["ts"])
            & (pts["lts"] < ivs["hi"]),
        )
        .groupBy("err_id").count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, naive.collect())
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_salted_join_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    salted = salted_join(li, orders, on="o_orderkey", n_salts=8)
    plain = li.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    a = salted.groupBy("o_orderstatus").count().collect()
    b = plain.groupBy("o_orderstatus").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_salted_join_rejects_right_and_full_outer(spark):
    li = spark.createDataFrame([(1, "a")], "k long, v string")
    ri = spark.createDataFrame([(1, "b")], "k long, w string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="replicated"):
            salted_join(li, ri, on="k", n_salts=4, how=how)


def test_salted_join_left_outer_matches_plain(spark):
    li = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    ri = spark.createDataFrame([(1, "x"), (1, "y")], "k long, w string")
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(li, ri, on="k", n_salts=4, how="left").collect()
    )
    want = sorted(
        (r["k"], r["v"], r["w"]) for r in li.join(ri, "k", "left").collect()
    )
    assert got == want


def test_range_join_rejects_interval_side_outer(spark):
    pts = spark.createDataFrame([(TS(2024, 1, 1, 10, 0, 0),)], "ts timestamp")
    ivs = spark.createDataFrame(
        [(TS(2024, 1, 1, 9, 0, 0), TS(2024, 1, 1, 11, 0, 0))],
        "lo timestamp, hi timestamp",
    )
    with pytest.raises(ValueError, match="exploded"):
        range_join_bucketed(
            pts, ivs, pts["ts"], ivs["lo"], ivs["hi"], how="full"
        )


def test_range_join_ntz_correct_under_dst_session_tz(spark):
    """NTZ bucketing must be session-tz-free: with a DST-observing session
    zone and wall times inside the spring-forward gap, the bucket function
    derived from a session-tz cast would misplace points; the wall-clock
    derivation keeps every lo <= t < hi pair matched."""
    from jurimetria_etl_spark.operators.joins import range_join_bucketed

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # 2021-03-14 02:xx does not exist on America/New_York wall clocks
        # (clocks jump 02:00 -> 03:00); as NTZ values they are plain rows.
        pts = spark.sql(
            """SELECT * FROM VALUES
               (1, TIMESTAMP_NTZ'2021-03-14 02:30:00'),
               (2, TIMESTAMP_NTZ'2021-03-14 03:00:00')
               AS t(pid, ts)"""
        )
        ivs = spark.sql(
            """SELECT * FROM VALUES
               (10, TIMESTAMP_NTZ'2021-03-14 02:00:00',
                    TIMESTAMP_NTZ'2021-03-14 02:59:00'),
               (20, TIMESTAMP_NTZ'2021-03-14 02:45:00',
                    TIMESTAMP_NTZ'2021-03-14 03:40:00')
               AS t(iid, lo, hi)"""
        )
        got = {
            (r["pid"], r["iid"])
            for r in range_join_bucketed(
                pts, ivs, pts["ts"], ivs["lo"], ivs["hi"],
                bucket_seconds=600,
            ).collect()
        }
        assert got == {(1, 10), (2, 20)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_range_join_refuses_mixed_timestamp_types(spark):
    """Mixed NTZ/TIMESTAMP sides have no consistent bucket mapping
    (session-tz conversion is not DST-monotonic) — must refuse, not
    silently drop pairs."""
    import pytest as _pytest

    from jurimetria_etl_spark.operators.joins import range_join_bucketed

    pts = spark.sql(
        "SELECT 1 AS pid, TIMESTAMP_NTZ'2021-06-01 10:15:00' AS ts"
    )
    ivs = spark.sql(
        "SELECT 10 AS iid, TIMESTAMP'2021-06-01 10:00:00' AS lo, "
        "TIMESTAMP'2021-06-01 10:30:00' AS hi"
    )
    with _pytest.raises(ValueError, match="mix TIMESTAMP"):
        range_join_bucketed(pts, ivs, pts["ts"], ivs["lo"], ivs["hi"])


def test_asof_join_ignores_null_right_timestamps(spark):
    """r8 review (verified live pre-fix): a NULL-ts right row sorted
    first in the window and forward-filled as the 'latest' match for
    left rows with no real predecessor."""
    from datetime import datetime

    from jurimetria_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 5))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, "PAYLOAD")], "k long, ts timestamp, val string"
    )
    out = asof_join(left, right, on="k").collect()
    assert len(out) == 1
    assert out[0]["val"] is None and out[0]["ts_r"] is None
