"""Crash-recovery fault injection for the streaming curation pipeline
(VERDICT r4 item 6).

curation.py documents two crash windows in its append sequence
(corpus -> signature store -> fingerprint store) and claims that a
checkpoint retry converges: no document lost, no corpus row left without
a signature, duplicates possible only as at-least-once rows that any
downstream exact dedup removes.  These tests MAKE the crash happen —
a batch-handler step raises mid-sequence on its first attempt, the
query dies, and a restarted query on the same checkpoint replays the
batch — and assert the documented end state, not just the happy path.

Window 1: crash after the corpus append, before the signature append
          (injected by failing `build_near_dup_store`).
Window 2: crash after corpus + signature appends, before the fingerprint
          append (injected by failing `fingerprint`).
"""

from __future__ import annotations

import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.sources.fixtures import load_fixture

SF = "/root/testdata/sf0.001"


def _stage_two_drops(spark, tmp_path) -> str:
    """Two lexicographic, mtime-ordered single-file drops (batch 0 = even
    ids, batch 1 = odd ids), mirroring the equality test's setup."""
    from tests.conftest import stage_drop

    docs = load_fixture(spark, SF, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    flat = str(tmp_path / "flat")
    base_t = time.time() - 3600
    for i, parity in enumerate([0, 1]):
        stage_drop(
            docs.where(F.col("doc_id") % 2 == parity),
            flat,
            f"{i:03d}",
            base_t + i * 600,
        )
    return flat


def _sequential_reference(spark, flat: str) -> set[int]:
    from jurimetria_etl_spark.operators.dedup import (
        build_near_dup_store,
        dedup_incremental,
        fingerprint,
        minhash_dedup_incremental,
    )

    fp_store = spark.createDataFrame([], "fp bigint")
    sig_store = spark.createDataFrame(
        [],
        "doc_id long, bands array<struct<band:int,bkey:bigint>>, sh array<bigint>",
    )
    surv_all: set[int] = set()
    for f in sorted(Path(flat).glob("*.parquet")):
        batch = spark.read.parquet(str(f))
        fresh = dedup_incremental(batch, fp_store)
        surv = minhash_dedup_incremental(fresh, sig_store)
        surv_all |= {r["doc_id"] for r in surv.select("doc_id").collect()}
        fp_store = fp_store.unionByName(surv.select(fingerprint("text").alias("fp")))
        sig_store = sig_store.unionByName(build_near_dup_store(surv))
    return surv_all


def _run_with_injection(spark, tmp_path, monkeypatch, fail_symbol: str):
    """Start curation with `fail_symbol` poisoned to raise on the second
    micro-batch's first attempt; after the query dies, restore the symbol
    and restart on the same checkpoint.  Returns the store dirs."""
    import jurimetria_etl_spark.streaming.curation as cur

    flat = _stage_two_drops(spark, tmp_path)
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    sigs = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")

    real = getattr(cur, fail_symbol)
    calls = {"n": 0}

    def poisoned(*args, **kwargs):
        # handle_batch calls the poisoned symbol exactly once per batch;
        # invocation #2 is therefore mid-sequence of the SECOND batch —
        # after that batch's earlier appends have already landed.
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash: executor lost mid-append")
        return real(*args, **kwargs)

    monkeypatch.setattr(cur, fail_symbol, poisoned)
    stream = cur.read_documents_stream(spark, flat, max_files_per_trigger=1)
    q = cur.curate_document_stream(stream, corpus, fps, sigs, ckpt)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)

    # the crash really happened mid-sequence: batch 1's docs are NOT all
    # accounted for yet (fp store at most batch-0 sized)
    monkeypatch.setattr(cur, fail_symbol, real)
    stream2 = cur.read_documents_stream(spark, flat, max_files_per_trigger=1)
    q2 = cur.curate_document_stream(stream2, corpus, fps, sigs, ckpt)
    q2.awaitTermination(180)
    return flat, corpus, fps, sigs


@pytest.mark.parametrize(
    "fail_symbol",
    ["build_near_dup_store", "fingerprint"],
    ids=["crash-before-sig-append", "crash-before-fp-append"],
)
def test_curation_retry_converges_after_mid_append_crash(
    spark, tmp_path, monkeypatch, fail_symbol
):
    flat, corpus, fps, sigs = _run_with_injection(
        spark, tmp_path, monkeypatch, fail_symbol
    )
    expected = _sequential_reference(spark, flat)

    corpus_df = spark.read.parquet(corpus)
    got_ids = {r["doc_id"] for r in corpus_df.select("doc_id").distinct().collect()}
    # no document lost, none invented
    assert got_ids == expected

    # at-least-once: duplicate corpus ROWS are allowed (the crashed
    # batch's survivors were appended, then re-appended on replay), but a
    # downstream exact dedup must fully restore one-row-per-doc
    assert corpus_df.select("doc_id", "text").distinct().count() == len(expected)

    # every corpus doc has a signature in the near-dup store (the
    # invariant the append ORDER exists to protect)
    sig_ids = {
        r["doc_id"]
        for r in spark.read.parquet(sigs).select("doc_id").distinct().collect()
    }
    assert sig_ids == expected

    # the fingerprint gatekeeper converged: one fp per surviving document
    assert spark.read.parquet(fps).distinct().count() == len(expected)


def test_span_fp_store_converges_after_crash_at_span_append(
    spark, tmp_path, monkeypatch
):
    """r8 review: the span-fp append must run BEFORE the fp append.  A
    crash at the span append then replays the whole batch (its docs are
    not yet fp-gated), so the span store converges — under fp-first
    ordering the replay would drop the docs at the exact-dedup gate and
    their span candidacy would be omitted forever."""
    import jurimetria_etl_spark.operators.spans as spans_mod
    import jurimetria_etl_spark.streaming.curation as cur

    flat = _stage_two_drops(spark, tmp_path)
    corpus, fps, sigs, ckpt, spanfps = (
        str(tmp_path / n)
        for n in ("corpus", "fps", "sigs", "ckpt", "spanfps")
    )
    real = spans_mod.winnowed_fingerprints
    calls = {"n": 0}

    def poisoned(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash: executor lost mid-append")
        return real(*args, **kwargs)

    monkeypatch.setattr(spans_mod, "winnowed_fingerprints", poisoned)
    stream = cur.read_documents_stream(spark, flat, max_files_per_trigger=1)
    q = cur.curate_document_stream(
        stream, corpus, fps, sigs, ckpt, span_fp_store_dir=spanfps
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)

    monkeypatch.setattr(spans_mod, "winnowed_fingerprints", real)
    stream2 = cur.read_documents_stream(spark, flat, max_files_per_trigger=1)
    q2 = cur.curate_document_stream(
        stream2, corpus, fps, sigs, ckpt, span_fp_store_dir=spanfps
    )
    q2.awaitTermination(180)

    expected = _sequential_reference(spark, flat)
    got = {
        r["doc_id"]
        for r in spark.read.parquet(corpus).select("doc_id").distinct().collect()
    }
    assert got == expected
    # THE invariant: every curated document's span fingerprints are in
    # the store (dup appends allowed — candidacy hints dedup on read)
    span_ids = {
        r["doc_id"]
        for r in spark.read.parquet(spanfps).select("doc_id").distinct().collect()
    }
    assert span_ids == expected
