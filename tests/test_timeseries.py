"""bucket_agg_gapfill: densified bucket aggregation with LOCF / linear
interpolation — DuckDB-oracle for locf on the events fixture, a Python
reference for linear, and structural/plan contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.timeseries import bucket_agg_gapfill
from jurimetria_etl_spark.sources.fixtures import load_fixture

SF = "/root/testdata/sf0.001"
BUCKET = 3600

LOCF_ORACLE = f"""
WITH per_bucket AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {BUCKET}) AS BIGINT) * {BUCKET} AS bucket_s,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS agg_v,
         TRUE AS obs
  FROM read_parquet('{SF}/events.parquet')
  GROUP BY 1, 2),
spans AS (
  SELECT event_type, MIN(bucket_s) AS lo, MAX(bucket_s) AS hi
  FROM per_bucket GROUP BY 1),
dense AS (
  SELECT s.event_type, gs.g AS bucket_s
  FROM spans s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, {BUCKET})) AS g) gs),
joined AS (
  SELECT d.event_type, d.bucket_s, p.agg_v, p.obs
  FROM dense d LEFT JOIN per_bucket p USING (event_type, bucket_s))
SELECT event_type, bucket_s,
       obs IS NULL AS is_filled,
       last_value(agg_v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket_s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
FROM joined
ORDER BY event_type, bucket_s
"""


def test_locf_matches_duckdb_oracle(spark):
    ev = load_fixture(spark, SF, "events")
    got = bucket_agg_gapfill(
        ev, BUCKET, keys=["event_type"], value_col="value", fill="locf"
    )
    got_rows = sorted(
        (
            r.event_type,
            int(r.bucket_start.timestamp()),
            r.is_filled,
            round(r.value, 6) if r.value is not None else None,
        )
        for r in got.collect()
    )
    want = [
        (t, int(b), bool(f), round(v, 6) if v is not None else None)
        for t, b, f, v in duckdb.sql(LOCF_ORACLE).fetchall()
    ]
    assert got_rows == sorted(want)


def test_linear_interpolation_reference(spark):
    rows = [
        ("a", 0, 10.0), ("a", 3600, 10.0),       # bucket 0 avg 10
        ("a", 4 * 3600, 40.0),                   # buckets 2,3 are holes
        ("a", 6 * 3600, 20.0),                   # bucket 5 hole
    ]
    df = spark.createDataFrame(
        [(k, t, v) for k, t, v in rows], "k string, sec long, value double"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "value")
    out = {
        int(r.bucket_start.timestamp()) // 3600: (r.value, r.is_filled)
        for r in bucket_agg_gapfill(
            df, 3600, keys=["k"], fill="linear"
        ).collect()
    }
    # observed buckets (0,1,4,6) keep exact values
    assert out[0] == (10.0, False)
    assert out[1] == (10.0, False)
    assert out[4] == (40.0, False)
    assert out[6] == (20.0, False)
    # holes 2,3 interpolate between 10@bucket1 and 40@bucket4; hole 5
    # between 40@bucket4 and 20@bucket6
    assert out[2] == (20.0, True)
    assert out[3] == (30.0, True)
    assert out[5] == (30.0, True)


def test_linear_leading_trailing_holes_stay_null(spark):
    df = spark.createDataFrame(
        [("a", 3600, 5.0), ("a", 3 * 3600, 7.0)],
        "k string, sec long, value double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "value")
    # only the interior hole exists here (span is min..max), so extend:
    # leading/trailing holes can't occur by construction — the dense range
    # is each key's own [min, max]. Assert exactly that contract instead.
    out = bucket_agg_gapfill(df, 3600, keys=["k"], fill="linear").collect()
    assert len(out) == 3  # buckets 1, 2, 3 — nothing outside the span
    assert {int(r.bucket_start.timestamp()) // 3600 for r in out} == {1, 2, 3}


def test_dense_and_plan_contracts(spark):
    ev = load_fixture(spark, SF, "events")
    out = bucket_agg_gapfill(ev, BUCKET, keys=["event_type"], fill="locf")
    # densify: per key, bucket count == span/step + 1
    per_key = (
        out.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (
                (
                    F.max(F.unix_timestamp("bucket_start"))
                    - F.min(F.unix_timestamp("bucket_start"))
                )
                / BUCKET
                + 1
            ).cast("long").alias("expected"),
        )
        .collect()
    )
    for r in per_key:
        assert r.n == r.expected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Cartesian" not in plan
    with pytest.raises(ValueError, match="locf"):
        bucket_agg_gapfill(ev, BUCKET, keys=["event_type"], fill="cubic")

def test_observed_all_null_bucket_is_not_marked_filled(spark):
    """r8 review (verified live pre-fix): a bucket with real input rows
    whose values are all NULL was flagged is_filled=True, conflating
    observed-but-null with synthesized gap rows."""
    from datetime import datetime

    rows = [
        ("k", datetime(2024, 1, 1, 0, 30), None),
        ("k", datetime(2024, 1, 1, 2, 30), 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    got = {
        int(r.bucket_start.timestamp()) // 3600: r.is_filled
        for r in bucket_agg_gapfill(ev, 3600, ["event_type"]).collect()
    }
    base = int(datetime(2024, 1, 1, 0).timestamp()) // 3600
    assert got[base] is False       # observed (all-NULL values)
    assert got[base + 1] is True    # the synthesized gap
    assert got[base + 2] is False   # observed
