"""Sampling / shard-packing operators (operators/sampling.py): stability,
stratification, and the two-phase prefix sum's equality with the naive
global-window packing it replaces."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.sampling import (
    deterministic_sample,
    pack_into_shards,
    stratified_sample,
)
from jurimetria_etl_spark.sources.fixtures import load_fixture

SF = "/root/testdata/sf0.001"


def test_deterministic_sample_is_stable_and_near_fraction(spark):
    docs = load_fixture(spark, SF, "documents")
    a = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect())
    b = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect())
    assert a == b  # same rows every run — not partitioning-dependent
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # loose band around the fraction

    # growing the fraction only ADDS rows (nested samples — hash threshold)
    c = set(r["doc_id"] for r in deterministic_sample(docs, 0.5, "doc_id").collect())
    assert set(a) <= c


def test_stratified_sample_respects_per_stratum_fractions(spark):
    docs = load_fixture(spark, SF, "documents")
    out = stratified_sample(
        docs, "lang", {"en": 0.0}, key_col="doc_id", default_fraction=1.0
    )
    kept = out.groupBy("lang").count().collect()
    assert all(r["lang"] != "en" for r in kept)  # en fully dropped
    other_in = docs.where(F.col("lang") != "en").count()
    assert sum(r["count"] for r in kept) == other_in  # rest fully kept


def test_pack_into_shards_matches_naive_global_window(spark):
    docs = load_fixture(spark, SF, "documents")
    fast = pack_into_shards(docs, "n_chars", "doc_id", 10_000).select(
        "doc_id", "shard_id"
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = docs.select(
        "doc_id",
        F.floor(
            (F.sum("n_chars").over(w) - F.col("n_chars")) / F.lit(10_000)
        ).cast("bigint").alias("shard_id"),
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_pack_into_shards_sequential_fill_semantics(spark):
    rows = [(1, 400), (2, 400), (3, 400), (4, 1200), (5, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_into_shards(df, "n_tok", "doc_id", 1000).collect()
    }
    # starts: 0, 400, 800, 1200, 2400 → shards 0,0,0,1,2
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}
