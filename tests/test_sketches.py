"""Sketch operators: approximate answers can't ride the DuckDB
hash-compare, so exactness *properties* are pinned instead — error bounds,
the partial/rollup ≡ direct identity, the Misra-Gries superset guarantee
(vs exact counts), and exactness of the recount pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators import sketches as SK
from jurimetria_etl_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_quantized,
    dequantize_embeddings_int8,
    quantize_embeddings_int8,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from jurimetria_etl_spark.sources.fixtures import load_fixture

    return load_fixture(spark, SF, "events")


@pytest.fixture(scope="module")
def embeddings(spark):
    from jurimetria_etl_spark.sources.fixtures import load_fixture

    return load_fixture(spark, SF, "embeddings")


def test_approx_distinct_within_rsd(events):
    exact = events.select(
        F.count_distinct("user_id").alias("d")
    ).first()["d"]
    approx = SK.approx_distinct(events, "user_id", rsd=0.02).first()[
        "user_id_approx_distinct"
    ]
    assert abs(approx - exact) <= 0.1 * exact  # 5 sigma headroom on 2% rsd


def test_hll_partials_rollup_equals_direct(events):
    """Merging daily partials must give the SAME estimate as sketching the
    whole column directly — sketch union is exact over sketches."""
    daily = SK.hll_sketch_by(
        events.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    rolled = SK.hll_rollup(daily, []).first()["approx_distinct"]
    direct = (
        events.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("d")
        )
    ).first()["d"]
    assert rolled == direct
    exact = events.select(F.count_distinct("user_id").alias("d")).first()["d"]
    assert abs(rolled - exact) <= 0.1 * exact


def test_hll_rollup_grouped(events):
    """Grouped rollup: day-partials → per-week estimates, one sketch per
    group on the wire."""
    daily = SK.hll_sketch_by(
        events.withColumn("day", F.to_date("ts")).withColumn(
            "week", F.weekofyear(F.to_date("ts"))
        ),
        ["week", "day"],
        "user_id",
    )
    weekly = SK.hll_rollup(daily, ["week"])
    rows = weekly.collect()
    assert len(rows) >= 1
    assert all(r["approx_distinct"] > 0 for r in rows)


def test_count_min_overcounts_only(spark, events):
    """CMS never undercounts; overcount bounded by eps·N (w.h.p.)."""
    sk = SK.count_min(events, "event_type", eps=0.001, confidence=0.99)
    blob = sk.first()["cms"]
    exact = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n = events.count()
    est = SK.cm_estimate_counts(spark, blob, list(exact))
    for item, e in est.items():
        assert e >= exact[item]
        assert e <= exact[item] + 0.01 * n


def test_frequent_items_superset_and_exact(events):
    """MG guarantee: every value with global freq > N/(k+1) is reported;
    with exact_recount the reported counts equal groupBy().count()."""
    n = events.count()
    k = 50
    exact = {
        r["item"]: r["cnt"]
        for r in events.groupBy(F.col("event_type").alias("item"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = {
        r["item"]: r["cnt"]
        for r in SK.frequent_items(events, "event_type", k=k).collect()
    }
    for item, cnt in exact.items():
        if cnt > n / (k + 1):
            assert item in got, f"{item} (cnt={cnt}) missing from MG output"
    for item, cnt in got.items():
        assert cnt == exact[item]  # recount pass is exact


def test_frequent_items_lower_bounds(events):
    """Without recount, weights are lower bounds within N/(k+1)."""
    k = 50
    n = events.count()
    exact = {
        r["item"]: r["cnt"]
        for r in events.groupBy(F.col("event_type").alias("item"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = {
        r["item"]: r["cnt"]
        for r in SK.frequent_items(
            events, "event_type", k=k, exact_recount=False
        ).collect()
    }
    for item, w in got.items():
        assert w <= exact[item]
        assert w >= exact[item] - n / (k + 1) - 1


def test_heavy_hitters_exact_matches_groupby(events):
    hh = {
        r["item"]: r["cnt"]
        for r in SK.heavy_hitters_exact(events, "event_type", 0.05).collect()
    }
    n = events.count()
    exact = {
        r["item"]: r["cnt"]
        for r in events.groupBy(F.col("event_type").alias("item"))
        .agg(F.count("*").alias("cnt"))
        .collect()
        if r["cnt"] >= 0.05 * n
    }
    assert hh == exact


# ───────────────────────── int8 quantization ───────────────────────────────
def test_quantize_roundtrip_error_bound(embeddings):
    """|v̂ - v| ≤ scale/2 per element (symmetric rounding)."""
    q = quantize_embeddings_int8(embeddings)
    deq = dequantize_embeddings_int8(q)
    err = deq.select(
        F.aggregate(
            F.zip_with(
                "embedding", "embedding_deq", lambda a, b: F.abs(a - b)
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("maxerr"),
        (F.col("q_scale") / 2 + 1e-12).alias("bound"),
    )
    bad = err.where(F.col("maxerr") > F.col("bound")).count()
    assert bad == 0


def test_quantize_codes_in_range(embeddings):
    q = quantize_embeddings_int8(embeddings)
    out = q.select(
        F.aggregate(
            F.transform("q", lambda x: F.abs(x.cast("int"))),
            F.lit(0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("maxcode")
    )
    assert out.agg(F.max("maxcode")).first()[0] <= 127


def test_quantized_topk_recall(embeddings):
    """recall@5 of the quantized path vs exact cosine ≥ 0.8 on the fixture
    corpus (int8 perturbs scores by ~1e-2; neighbors barely move)."""
    probe = embeddings.select(F.min("vec_id")).first()[0]
    exact = {r["vec_id"] for r in cosine_topk(embeddings, probe, k=5).collect()}
    quant = {
        r["vec_id"]
        for r in cosine_topk_quantized(embeddings, probe, k=5).collect()
    }
    assert len(exact & quant) >= 4


def test_approx_quantiles_within_rank_error(events):
    """GK sketch rank error ≤ 1/accuracy: each reported quantile's true
    rank must sit within prob ± 1/accuracy (checked exactly by counting
    values below the estimate)."""
    n = events.count()
    acc = 1000
    got = SK.approx_quantiles(
        events, "value", [0.25, 0.5, 0.9], accuracy=acc
    ).first()
    for prob, key in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]:
        est = got[key]
        below = events.where(F.col("value") <= est).count()
        assert abs(below / n - prob) <= 1 / acc + 1 / n

def test_approx_quantiles_grouped(events):
    rows = SK.approx_quantiles(
        events, "value", [0.5], group_cols=["event_type"]
    ).collect()
    assert len(rows) == events.select("event_type").distinct().count()
    assert all(r["p50"] is not None for r in rows)


def test_profile_columns_one_pass(spark, events):
    """Profile values match exact per-column queries; the whole profile is
    ONE aggregation (no join, one exchange pair)."""
    from jurimetria_etl_spark.operators.stats import profile_columns

    prof = {r["column"]: r for r in profile_columns(events).collect()}
    assert set(prof) == set(events.columns)
    n = events.count()
    for c in ["event_id", "event_type"]:
        nulls = events.where(F.col(c).isNull()).count()
        assert abs(prof[c]["null_rate"] - nulls / n) < 1e-9
        exact_d = events.select(c).distinct().count()
        assert abs(prof[c]["approx_distinct"] - exact_d) <= 0.2 * exact_d + 2
    assert prof["event_type"]["min_str"] == events.agg(
        F.min("event_type")
    ).first()[0]
    plan = profile_columns(events)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_approx_quantile_names_are_unambiguous(events):
    """r8 review: 1.0 must name a selectable dot-free column (old scheme
    produced 'q1.0') and 0.5/0.05 must not collide or mislead."""
    row = SK.approx_quantiles(events, "value", [0.05, 0.5, 0.999, 1.0])
    assert row.columns == ["p5", "p50", "p99_9", "p100"]
    got = row.first()
    assert got["p100"] is not None and F is not None


def test_profile_columns_empty_frame_null_rate_zero(spark):
    """r8 review: sum() over zero rows is NULL — the empty-frame profile
    must report null_rate 0.0, not NULL."""
    from jurimetria_etl_spark.operators.stats import profile_columns

    df = spark.createDataFrame([], "a long, b string")
    rows = profile_columns(df).collect()
    assert len(rows) == 2
    assert all(r["null_rate"] == 0.0 for r in rows)
