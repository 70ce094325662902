"""Distributed Bloom filter (operators/bloom.py): geometry math, the
no-false-negative guarantee, realized fpp vs configured, dense ≡ join
mode, lossless merge, parquet round-trip, and the composed
dedup_incremental_bloom ≡ dedup_incremental contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.bloom import (
    Bloom,
    bloom_build,
    bloom_from_words,
    bloom_merge,
    bloom_might_contain,
    bloom_params,
    dedup_incremental_bloom,
)
from jurimetria_etl_spark.operators.dedup import dedup_incremental, fingerprint

N = 10_000


@pytest.fixture(scope="module")
def keys(spark):
    df = spark.range(N).select((F.col("id") * 7919).alias("k")).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def absent(spark):
    # +1 off the 7919 lattice → provably disjoint from `keys`
    df = (
        spark.range(2 * N)
        .select((F.col("id") * 7919 + 1).alias("k"))
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def built(keys):
    return bloom_build(keys, "k", fpp=0.01)


def test_params_textbook_optimum():
    m, k = bloom_params(1_000_000, 0.01)
    # −n·ln(0.01)/ln²2 ≈ 9.585 bits/key, k = m/n·ln2 ≈ 7
    assert 9_500_000 < m < 9_700_000 and m % 64 == 0
    assert k == 7
    with pytest.raises(ValueError):
        bloom_params(10, 0.0)


def test_no_false_negatives(keys, built):
    flagged = bloom_might_contain(keys, "k", built)
    assert flagged.where(~F.col("might_contain")).count() == 0


def test_realized_fpp_near_configured(absent, built):
    hits = (
        bloom_might_contain(absent, "k", built)
        .where(F.col("might_contain"))
        .count()
    )
    rate = hits / (2 * N)
    # 1% configured; allow generous sampling/hash slack but catch a
    # broken build (≈100%) or a degenerate one (≈0% would fail the FN
    # test anyway)
    assert rate < 0.03, f"false-positive rate {rate:.4f} ≫ configured 0.01"


def test_dense_and_join_modes_agree(absent, built):
    dense = bloom_might_contain(absent, "k", built, mode="dense")
    joined = bloom_might_contain(
        absent.withColumn("rid", F.col("k")), "k", built,
        id_col="rid", mode="join",
    ).select("k", "might_contain")
    assert sorted(map(tuple, dense.collect())) == sorted(
        map(tuple, joined.collect())
    )


def test_join_mode_requires_id_and_rejects_bad_mode(keys, built):
    with pytest.raises(ValueError, match="id_col"):
        bloom_might_contain(keys, "k", built, mode="join")
    with pytest.raises(ValueError, match="unknown mode"):
        bloom_might_contain(keys, "k", built, mode="chaos")


def test_merge_is_lossless_union(spark, keys, built):
    """OR-merging two half-builds of identical geometry must equal one
    build over the union — bit-for-bit (same words, same bits)."""
    lo = keys.where(F.col("k") < 7919 * (N // 2))
    hi = keys.where(F.col("k") >= 7919 * (N // 2))
    # identical geometry: size both from the FULL count
    bl_lo = bloom_build(lo, "k", expected_items=N, fpp=0.01)
    bl_hi = bloom_build(hi, "k", expected_items=N, fpp=0.01)
    merged = bloom_merge(bl_lo, bl_hi)
    full = bloom_build(keys, "k", expected_items=N, fpp=0.01)
    assert (merged.n_bits, merged.n_hashes) == (full.n_bits, full.n_hashes)
    a = sorted(map(tuple, merged.words.select("word_idx", "word").collect()))
    b = sorted(map(tuple, full.words.select("word_idx", "word").collect()))
    assert a == b
    with pytest.raises(ValueError, match="geometries differ"):
        bloom_merge(built, bloom_build(keys, "k", expected_items=5, fpp=0.5))


def test_parquet_round_trip(spark, tmp_path, keys, built):
    path = str(tmp_path / "bloom_words")
    built.words.write.parquet(path)
    back = bloom_from_words(spark.read.parquet(path))
    assert (back.n_bits, back.n_hashes) == (built.n_bits, built.n_hashes)
    assert (
        bloom_might_contain(keys, "k", back)
        .where(~F.col("might_contain"))
        .count()
        == 0
    )
    with pytest.raises(ValueError, match="empty word frame"):
        bloom_from_words(built.words.limit(0))


def test_dedup_incremental_bloom_matches_plain(spark):
    """The composed prefilter must be a pure plan optimization: the
    surviving fingerprint set equals dedup_incremental's exactly —
    duplicates of the store dropped, batch-internal dupes collapsed,
    fresh rows kept — regardless of Bloom false positives."""
    store_texts = [f"seen document number {i}" for i in range(500)]
    new_texts = (
        [f"seen document number {i}" for i in range(0, 500, 5)]  # dupes
        + [f"fresh document number {i}" for i in range(300)]
        + [f"fresh document number {i}" for i in range(0, 300, 3)]  # internal
    )
    from jurimetria_etl_spark.operators.dedup import fingerprint

    store = (
        spark.createDataFrame([(t,) for t in store_texts], "text string")
        .select(fingerprint("text").alias("fp"))
    )
    batch = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_texts)], "doc_id long, text string"
    )
    plain = dedup_incremental(batch, store)
    via_bloom = dedup_incremental_bloom(batch, store)
    want = {r["text"] for r in plain.collect()}
    got = {r["text"] for r in via_bloom.collect()}
    assert got == want
    assert via_bloom.columns == batch.columns


@pytest.mark.parametrize("seed", [2, 17, 41])
def test_dedup_incremental_bloom_matches_plain_randomized(spark, seed):
    """Seeded-random equivalence sweep for the r13 one-join re-check
    shape: random overlap patterns (store dupes, batch-internal dupes,
    fresh rows, empty/whitespace texts, store-duplicated fp rows) must
    produce EXACTLY dedup_incremental's surviving set, in both probe
    modes (dense bitset and word-join), at an fpp high enough to force
    real false positives through the residual re-check."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(30)]
    def text(): return " ".join(rng.choices(vocab, k=rng.randint(1, 6)))
    store_texts = [text() for _ in range(80)]
    batch_texts = (
        [rng.choice(store_texts) for _ in range(30)]  # store dupes
        + [text() for _ in range(60)]                 # mostly fresh
        + ["", "   "]                                 # degenerate texts
    )
    rng.shuffle(batch_texts)
    from jurimetria_etl_spark.operators.dedup import fingerprint

    store = spark.createDataFrame(
        [(t,) for t in store_texts + store_texts[:10]], "text string"
    ).select(fingerprint("text").alias("fp"))  # duplicated store rows
    batch = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    def norm_set(df):
        # compare at fingerprint granularity: survivor ROW choice within
        # a duplicate group is arbitrary (e.g. "" vs "   " share an fp),
        # the surviving fp SET is the contract
        return {
            (r["text"] or "").strip() and " ".join(r["text"].split())
            for r in df.collect()
        }

    want = norm_set(dedup_incremental(batch, store))
    for mode in ("dense", "join"):
        got = norm_set(
            dedup_incremental_bloom(
                batch, store, fpp=0.3, mode=mode, id_col="doc_id"
            )
        )
        assert got == want, f"mode={mode}"


def test_plan_has_no_python_nodes(spark, keys, built):
    """§2.11 contract: build and both probe modes are pure native
    expressions — no BatchEvalPython / ArrowEvalPython anywhere."""
    for df in (
        built.words,
        bloom_might_contain(keys, "k", built, mode="dense"),
        bloom_might_contain(
            keys.withColumn("rid", F.col("k")), "k", built,
            id_col="rid", mode="join",
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_dedup_bloom_join_mode_defaults_without_id_col(spark):
    """r8 review: the advertised call shape (no id_col) must survive a
    filter past the dense ceiling — the fingerprint itself is the join
    key (dedup collapses duplicate fingerprints anyway)."""
    from jurimetria_etl_spark.operators.bloom import (
        bloom_build,
        dedup_incremental_bloom,
    )

    seen = spark.createDataFrame(
        [("the quick brown fox",)], "text string"
    ).select(F.expr("xxhash64(text)").alias("fp"))
    from jurimetria_etl_spark.operators.dedup import fingerprint

    seen = spark.createDataFrame(
        [("seen doc one two three",)], "text string"
    ).select(fingerprint("text").alias("fp"))
    batch = spark.createDataFrame(
        [
            (1, "seen doc one two three"),   # store dup -> dropped
            (2, "fresh doc alpha beta"),
            (3, "fresh doc alpha beta"),     # in-batch dup -> one survives
        ],
        "doc_id long, text string",
    )
    bl = bloom_build(seen, "fp")
    out = dedup_incremental_bloom(batch, seen, bloom=bl, mode="join")
    texts = {r["text"] for r in out.collect()}
    assert texts == {"fresh doc alpha beta"}
    assert out.count() == 1


def test_join_mode_keeps_null_key_rows(spark):
    """r8 ADVICE (medium): a NULL join key never matches the verdict
    fold-back equi-join, so without the coalesce a NULL-id row got a
    NULL verdict and vanished from BOTH branches of the maybe split.
    Contract: join mode must report True (the safe Bloom direction) for
    NULL-key rows, and dedup_incremental_bloom must keep a NULL-text
    row in every mode, exactly like dedup_incremental."""
    seen = spark.createDataFrame(
        [("seen doc one two three",)], "text string"
    ).select(fingerprint("text").alias("fp"))
    batch = spark.createDataFrame(
        [
            (1, "seen doc one two three"),  # store dup -> dropped
            (2, "fresh doc alpha beta"),    # fresh -> kept
            (3, None),                      # NULL text -> NULL fp -> kept
        ],
        "doc_id long, text string",
    )
    bl = bloom_build(seen, "fp")
    plain = dedup_incremental(batch, seen)
    for mode in ("dense", "join"):
        out = dedup_incremental_bloom(batch, seen, bloom=bl, mode=mode)
        got = sorted(
            (r["doc_id"], r["text"]) for r in out.collect()
        )
        want = sorted((r["doc_id"], r["text"]) for r in plain.collect())
        assert got == want, f"mode={mode}"
        assert (2, "fresh doc alpha beta") in got and (3, None) in got

    # and at the probe level: a NULL id_col value cannot fold back
    # through the equi-join, so join mode must report True (the safe
    # Bloom direction), never NULL
    null_ids = spark.createDataFrame(
        [(None, 777), (2, 12345)], "rid long, k long"
    )
    flagged = bloom_might_contain(
        null_ids, "k", bl, id_col="rid", mode="join"
    )
    verdicts = {r["rid"]: r["might_contain"] for r in flagged.collect()}
    assert verdicts[None] is True
    assert verdicts[2] is not None
