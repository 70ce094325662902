"""transformWithStateInPandas session summaries: streaming close-on-timeout
must reproduce the batch session_window aggregation for every session the
final watermark closed; the open tail is withheld, never wrong."""

from __future__ import annotations

import shutil
import tempfile
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.sources.fixtures import load_fixture
from jurimetria_etl_spark.streaming.sessions import session_summaries

SF = "/root/testdata/sf0.001"
GAP = "10 minutes"
WM = "30 minutes"


@pytest.fixture(scope="module")
def drops(spark):
    """events as 3 chronologically-arriving single-file drops."""
    from tests.conftest import stage_drop

    tmp = tempfile.mkdtemp(prefix="sessions_")
    ev = load_fixture(spark, SF, "events").select("user_id", "ts", "value").persist()
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    base_t = time.time() - 3600
    out = f"{tmp}/flat"
    for i in range(3):
        sl = ev.where(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < 2 else hi + span))
        )
        stage_drop(sl, out, f"{i:03d}", base_t + i * 600)
    ev.unpersist()
    yield out
    shutil.rmtree(tmp, ignore_errors=True)


def _canon(rows):
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in rows
    )


def test_stream_sessions_match_batch_closed_set(spark, drops):
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
    )
    q = (
        session_summaries(stream, gap=GAP, watermark=WM)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_tws")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _canon(spark.sql("SELECT * FROM sess_tws").collect())

    batch = session_summaries(spark.read.parquet(drops), gap=GAP)
    all_batch = _canon(batch.collect())
    # sessions provably closed by the final watermark (max_ts - WM >= end+gap)
    max_ts = spark.read.parquet(drops).agg(F.max("ts")).first()[0]
    wm = max_ts - __import__("datetime").timedelta(minutes=30)
    deadline = __import__("datetime").timedelta(minutes=10)
    closed = [r for r in all_batch if r[2] + deadline <= wm]

    assert len(closed) > 50  # the fixture yields plenty of closed sessions
    got_set = set(got)
    # every provably-closed batch session was emitted, byte-identical
    missing = [r for r in closed if r not in got_set]
    assert not missing, f"{len(missing)} closed sessions not emitted: {missing[:3]}"
    # nothing emitted that batch doesn't recognize
    assert got_set <= set(all_batch)


def test_batch_mode_is_session_window(spark):
    ev = load_fixture(spark, SF, "events").select("user_id", "ts", "value")
    got = session_summaries(ev, gap=GAP)
    # one row per (user, session); totals add up to the plain aggregate
    totals = got.agg(
        F.sum("n_events").alias("n"), F.round(F.sum("total_value"), 4).alias("v")
    ).first()
    plain = ev.agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")
    ).first()
    assert totals.n == plain.n
    assert abs(totals.v - plain.v) < 1e-3

def test_round_half_up6_matches_spark_round(spark):
    """The pandas-side rounding must be bit-identical to the batch path's
    F.round (HALF_UP over the shortest decimal repr) — Python's builtin
    banker's round() diverges on .xxxxxx5 ties (ADVICE r5)."""
    from pyspark.sql import functions as F

    from jurimetria_etl_spark.streaming.sessions import _round_half_up6

    ties = [0.0000025, 0.0000035, 1.9999995, 2.7182818, -0.0000025, 0.1 + 0.2]
    got = [_round_half_up6(v) for v in ties]
    want = [
        r[0]
        for r in spark.createDataFrame(
            [(v,) for v in ties], "v double"
        ).select(F.round("v", 6)).collect()
    ]
    assert got == want
    assert _round_half_up6(0.0000025) == 0.000003  # HALF_UP, not banker's


def test_tws_gate_raises_documented_error_when_dep_missing(spark, drops):
    """The Spark-4 transformWithStateInPandas path is import-gated on
    google.protobuf.  This test can never rot silently: when the
    dependency is absent it pins the documented ImportError; when a CI
    image carries protobuf it runs the REAL path against the same
    closed-session oracle as the applyInPandasWithState test."""
    from jurimetria_etl_spark.streaming import sessions as SESS

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
    )
    if not SESS._HAVE_TWS:
        with pytest.raises(ImportError, match="protobuf"):
            session_summaries(
                stream, gap=GAP, watermark=WM, use_transform_with_state=True
            )
        pytest.skip("google.protobuf absent: TWS gate pinned, path skipped")

    q = (
        session_summaries(
            stream, gap=GAP, watermark=WM, use_transform_with_state=True
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_tws_real")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = set(_canon(spark.sql("SELECT * FROM sess_tws_real").collect()))
    all_batch = _canon(session_summaries(spark.read.parquet(drops), gap=GAP).collect())
    max_ts = spark.read.parquet(drops).agg(F.max("ts")).first()[0]
    wm = max_ts - __import__("datetime").timedelta(minutes=30)
    deadline = __import__("datetime").timedelta(minutes=10)
    closed = [r for r in all_batch if r[2] + deadline <= wm]
    assert not [r for r in closed if r not in got]
    assert got <= set(all_batch)


def test_parse_seconds_units_and_multipart():
    """r8 review: session_window accepts day/week and multi-part
    intervals — the python gap parser must too."""
    import pytest

    from jurimetria_etl_spark.streaming.sessions import _parse_seconds

    assert _parse_seconds("1 day") == 86400
    assert _parse_seconds("2 weeks") == 1209600
    assert _parse_seconds("1 hour 30 minutes") == 5400
    with pytest.raises(ValueError):
        _parse_seconds("1 fortnight")
    with pytest.raises(ValueError):
        _parse_seconds("")


def test_null_user_key_does_not_crash_summary():
    """r8 review: int(None) killed the python worker; a NULL grouping
    key summarizes under user None like the batch path."""
    from jurimetria_etl_spark.streaming.sessions import (
        _key_user,
        _summary_frame,
    )

    assert _key_user((None,)) is None
    assert _key_user((7,)) == 7
    pdf = _summary_frame(None, [[0, 1_000_000, 2, 3.0]])
    assert pdf["user_id"].isna().all()
