"""Stream-stream join: batch equivalence for the inner form; watermark-tail
bounds for leftOuter (see streaming/joins.py module docstring)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.sources.fixtures import load_fixture
from jurimetria_etl_spark.streaming.joins import stream_stream_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events(spark):
    """views and purchases as separate 3-file parquet dirs whose files
    arrive in EVENT-TIME ORDER (lexicographic names + pinned mtimes).

    Chronological arrival is the realistic ingest shape AND the condition
    for stream≡batch on a watermarked stateful join: each batch's min ts
    is ≥ the previous batch's max, so no row ever lands below the
    watermark and no buffered row is evicted before its matches arrive.
    (Randomly-ordered file drops DO lose matches to watermark eviction —
    that is correct streaming semantics for late data, not a join bug.)"""
    import time

    from tests.conftest import stage_drop

    tmp = tempfile.mkdtemp(prefix="ss_join_")
    ev = (
        load_fixture(spark, SF, "events")
        .select("user_id", "ts", "event_type", "value")
        .persist()
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    base_t = time.time() - 3600
    for side, etype in (("views", "view"), ("purchases", "purchase")):
        part = ev.where(F.col("event_type") == etype)
        for i in range(3):
            sl = part.where(
                (F.col("ts") >= lo + i * span)
                & (F.col("ts") < (lo + (i + 1) * span if i < 2 else hi + span))
            )
            stage_drop(sl, f"{tmp}/{side}", f"{i:03d}", base_t + i * 600)
    ev.unpersist()
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


SCHEMA = "user_id bigint, ts timestamp, event_type string, value double"


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _run_join(spark, split_events, how, name):
    joined = stream_stream_join(
        _stream(spark, f"{split_events}/views"),
        _stream(spark, f"{split_events}/purchases"),
        key="user_id",
        max_delay="4 hours",
        watermark="1 hour",
        how=how,
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _batch_join(spark, split_events, how):
    return stream_stream_join(
        spark.read.parquet(f"{split_events}/views"),
        spark.read.parquet(f"{split_events}/purchases"),
        key="user_id",
        max_delay="4 hours",
        how=how,
    )


def _key_rows(df):
    return sorted(
        (r.user_id, r.l_ts, r.r_ts, r.l_value, r.r_value) for r in df.collect()
    )


def test_inner_stream_join_equals_batch(spark, split_events):
    got = _key_rows(_run_join(spark, split_events, "inner", "ssj_inner"))
    want = _key_rows(_batch_join(spark, split_events, "inner"))
    assert len(want) > 0, "fixture produced no view→purchase pairs"
    assert got == want


def test_left_outer_bounded_by_batch(spark, split_events):
    got = _run_join(spark, split_events, "leftOuter", "ssj_outer").collect()
    inner = _batch_join(spark, split_events, "inner")
    outer = _batch_join(spark, split_events, "leftOuter")
    matched = sorted(
        (r.user_id, r.l_ts, r.r_ts) for r in got if r.r_ts is not None
    )
    # matched rows are exactly the batch inner result (no invented pairs,
    # none lost)
    assert matched == sorted((r.user_id, r.l_ts, r.r_ts) for r in inner.collect())
    # null-extended emissions are a subset of the batch outer's unmatched
    # rows (the watermark tail may withhold some, never invent one)
    got_nulls = {(r.user_id, r.l_ts) for r in got if r.r_ts is None}
    want_nulls = {
        (r.user_id, r.l_ts) for r in outer.collect() if r.r_ts is None
    }
    assert got_nulls <= want_nulls


def test_rejects_unsupported_sides(spark):
    df = spark.range(1).select(
        F.col("id").alias("user_id"),
        F.current_timestamp().alias("ts"),
    )
    with pytest.raises(ValueError, match="rightOuter"):
        stream_stream_join(df, df, key="user_id", how="rightOuter")
