"""Corpus-curation composite: the chained lang→quality→dedup→near-dup
pipeline holds its contract — survivors meet every gate, no duplicates or
near-dups remain, and the funnel report accounts for every document."""

from __future__ import annotations

from pyspark.sql import functions as F

from jurimetria_etl_spark.operators import dedup as D
from jurimetria_etl_spark.plans.curation import curate_corpus, curation_report

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from jurimetria_etl_spark.sources.fixtures import load_fixture

    return load_fixture(spark, SF, "documents")


def test_curation_survivors_meet_gates(spark):
    docs = _docs(spark)
    curated = curate_corpus(docs, languages=("en",), min_quality=0.3).cache()
    rows = curated.collect()
    assert len(rows) > 0
    assert all(r["lang_pred"] == "en" for r in rows)
    assert all(r["quality"] >= 0.3 for r in rows)


def test_curation_no_exact_dups_remain(spark):
    docs = _docs(spark)
    curated = curate_corpus(docs)
    fps = curated.select(D.fingerprint("text").alias("fp"))
    assert fps.count() == fps.distinct().count()


def test_curation_no_near_dups_remain(spark):
    docs = _docs(spark)
    curated = curate_corpus(docs, near_dup_threshold=0.7).cache()
    remaining = D.minhash_near_duplicates(
        curated, "doc_id", "text", threshold=0.7
    )
    assert remaining.count() == 0


def test_curation_keeps_lower_id_of_planted_pair(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again today now"),
        (3, "an entirely different document about the weather and the ocean waves"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(
        docs, languages=("en",), min_quality=0.0, near_dup_threshold=0.5
    )
    assert sorted(r["doc_id"] for r in curated.collect()) == [1, 3]


def test_curation_report_funnel(spark):
    docs = _docs(spark)
    curated = curate_corpus(docs)
    rep = curation_report(docs, curated).first()
    assert rep["docs_in"] == docs.count()
    assert 0 < rep["docs_kept"] <= rep["docs_in"]
    assert rep["tokens_kept"] > 0


def test_curation_is_one_lazy_plan_no_python(spark):
    plan = (
        curate_corpus(_docs(spark))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "PythonUDF" not in plan


def test_prepare_training_shards_end_to_end(spark):
    from jurimetria_etl_spark.plans.curation import prepare_training_shards
    from jurimetria_etl_spark.sources.fixtures import load_fixture

    docs = load_fixture(spark, "/root/testdata/sf0.001", "documents")
    shards = prepare_training_shards(
        docs,
        languages=("en", "fr", "es", "de", "und"),
        min_quality=0.0,
        chunk_chars=240,
        overlap_chars=40,
        max_chars_per_shard=5_000,
    )
    rows = shards.select("doc_id", "chunk_idx", "chunk", "shard_id").collect()
    assert rows, "curation gates must keep some documents"
    # shard ids are a contiguous 0..N range
    ids = sorted({r["shard_id"] for r in rows})
    assert ids == list(range(len(ids)))
    # sequential fill: no shard except possibly the last exceeds the budget
    # by more than one chunk's length (a chunk never splits)
    from collections import defaultdict

    per = defaultdict(int)
    for r in rows:
        per[r["shard_id"]] += len(r["chunk"])
    for sid, total in per.items():
        assert total <= 5_000 + 240
    # chunks reassemble their source doc's prefix windows: spot-check one doc
    doc_rows = sorted(
        (r["chunk_idx"], r["chunk"]) for r in rows if r["doc_id"] == rows[0]["doc_id"]
    )
    text = [r["text"] for r in docs.collect() if r["doc_id"] == rows[0]["doc_id"]][0]
    for i, chunk in doc_rows:
        assert chunk == text[i * 200 : i * 200 + 240]
