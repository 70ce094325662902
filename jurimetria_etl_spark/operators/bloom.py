"""Distributed Bloom filter over a DataFrame column — built and probed
entirely with native Spark expressions (zero Python UDFs, zero
driver-side bitsets).

PySpark 4 removed ``df.stat.bloomFilter`` and does not expose the SQL
``bloom_filter_agg`` aggregate, so the membership-prefilter pattern a
100 TB incremental pipeline leans on (test a batch against a compact
summary of a multi-billion-row store BEFORE paying the exact anti-join)
has no built-in. This module re-expresses it Spark-first:

- **Build** (``bloom_build``): k bit positions per key via
  Kirsch–Mitzenmacher double hashing (two ``xxhash64`` calls, positions
  ``(h1 + i·h2) mod m`` — collision statistics of k independent hashes
  at the cost of two), explode → ``groupBy(pos >> 6)`` →
  ``bit_or(shiftleft(1, pos & 63))``.  The filter IS a DataFrame of
  packed 64-bit words ``(word_idx, word)`` — it shuffles as longs,
  persists as parquet, and merges with a further ``bit_or`` (Bloom
  filters of identical geometry OR together losslessly, so per-shard
  builds union for free).
- **Probe** (``bloom_might_contain``): two modes behind one size-gated
  switch, the same posture as the span survivor sets
  (operators/spans.py ``_survivor_semi_filter``):

  * *dense* (filters ≤ ``dense_max_bits``, default 2²⁷ bits = 16 MB):
    the word frame is compacted to ONE row holding the full
    ``array<long>`` bitset and broadcast-cross-joined; the membership
    test is a pure column expression (``element_at`` + bit mask per
    position, AND over k) — no shuffle of the probe side at all.
  * *join* (arbitrarily large filters): probe positions explode to
    (id, word_idx) rows and equi-join the word frame — the bitset is
    never materialized in one piece anywhere, so the filter can exceed
    any single executor's memory; the probe side shuffles k 16-byte
    rows per key.

- **Compose** (``dedup_incremental_bloom``): the production pattern —
  rows whose fingerprint the Bloom rejects are DEFINITELY fresh (a
  Bloom filter has no false negatives) and never look the store up;
  only the ~fpp false-positive sliver plus true duplicates pay the
  exact re-check, carried as the residual of ONE conditional left join
  (see the function's shape rationale).  Output is row-for-row the
  same contract as ``dedup_exact``/``dedup_incremental``
  (operators/dedup.py) — the Bloom is a plan optimization, never a
  semantics change.

Cited vs reference: no counterpart (the 566-LoC reference has no
incremental or approximate operators); this extends the brief's
training-data axis (incremental corpus dedup at scale).  Geometry math
is the textbook optimum (m = −n·ln p/ln²2, k = (m/n)·ln 2), public
knowledge from Bloom (1970) / Kirsch–Mitzenmacher (2006).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed hash-pair seeds: hashing (value, seed) through xxhash64 yields two
# independent 64-bit streams; h2 is forced odd so the double-hash stride
# never degenerates to 0 (all k positions identical).
_BLOOM_SEED_1 = 0x5EED_B100
_BLOOM_SEED_2 = 0xB100_F17E

# Above this bit count the dense single-row bitset (n_bits/8 bytes on one
# row, broadcast to every executor) stops being obviously cheap; flip to
# the word-join mode, which never materializes the bitset in one piece.
DENSE_MAX_BITS = 1 << 27  # 16 MB


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for ``expected_items`` keys at false-
    positive rate ``fpp``; n_bits is rounded up to whole 64-bit words."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"bloom_params: fpp must be in (0, 1), got {fpp}")
    n = max(1, int(expected_items))
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, k


@dataclass(frozen=True)
class Bloom:
    """A built filter: the packed-word frame plus its geometry.  ``words``
    is self-describing (constant ``n_bits``/``n_hashes`` columns ride
    every row, dictionary-encoded to nothing in parquet), so a persisted
    filter round-trips through ``bloom_from_words`` without a sidecar."""

    words: DataFrame
    n_bits: int
    n_hashes: int


def _positions(col: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions per key, Kirsch–Mitzenmacher double hashing.  Both
    partial hashes are reduced mod m BEFORE the stride multiply so every
    intermediate stays < k·m ≪ 2⁶³ — safe under ANSI overflow checking."""
    m = F.lit(n_bits).cast("long")
    h1 = F.pmod(F.xxhash64(col, F.lit(_BLOOM_SEED_1)), m)
    h2 = F.pmod(
        F.xxhash64(col, F.lit(_BLOOM_SEED_2)).bitwiseOR(F.lit(1)), m
    )
    return [
        F.pmod(h1 + F.lit(i).cast("long") * h2, m) for i in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame,
    col: str | Column,
    expected_items: int | None = None,
    fpp: float = 0.01,
    geometry: tuple[int, int] | None = None,
) -> Bloom:
    """Build a Bloom filter over ``col``.  ``expected_items=None`` sizes
    the geometry from ``df.count()`` (one cheap job; an upper bound on
    distinct keys only ever over-sizes, which lowers the realized fpp).
    Pass ``geometry=(n_bits, n_hashes)`` to pin an EXISTING filter's
    shape instead — the delta-build form ``bloom_merge`` requires
    (mismatched geometries never merge).

    Plan: positions explode to longs (narrow) → one shuffle keyed by
    word index (≤ m/64 distinct keys with map-side partial ``bit_or``)
    → ≤ m/64 result rows.  Nothing key-sized ever reaches the driver.
    """
    c = F.col(col) if isinstance(col, str) else col
    if geometry is not None:
        n_bits, n_hashes = geometry
        if n_bits % 64 != 0 or n_bits <= 0 or n_hashes <= 0:
            raise ValueError(
                f"bloom_build: geometry {geometry} invalid — n_bits must "
                "be a positive multiple of 64 and n_hashes ≥ 1"
            )
    else:
        if expected_items is None:
            expected_items = df.count()
        n_bits, n_hashes = bloom_params(expected_items, fpp)
    pos = F.explode(F.array(*_positions(c, n_bits, n_hashes))).alias("__pos")
    words = (
        df.select(pos)
        .select(
            F.shiftright(F.col("__pos"), 6).alias("word_idx"),
            F.col("__pos").bitwiseAND(F.lit(63)).cast("int").alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), __bit)")
            ).alias("word")
        )
        .withColumn("n_bits", F.lit(n_bits).cast("long"))
        .withColumn("n_hashes", F.lit(n_hashes).cast("int"))
    )
    return Bloom(words=words, n_bits=n_bits, n_hashes=n_hashes)


def bloom_merge(a: Bloom, b: Bloom) -> Bloom:
    """OR two filters of identical geometry — lossless (the union filter
    is bit-for-bit what a single build over both inputs produces), which
    is what makes per-shard / per-day builds compose at 100 TB."""
    if (a.n_bits, a.n_hashes) != (b.n_bits, b.n_hashes):
        raise ValueError(
            "bloom_merge: geometries differ "
            f"({a.n_bits},{a.n_hashes}) vs ({b.n_bits},{b.n_hashes}); "
            "filters only merge when built with identical (n_bits, n_hashes)"
        )
    words = (
        a.words.select("word_idx", "word")
        .unionByName(b.words.select("word_idx", "word"))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .withColumn("n_bits", F.lit(a.n_bits).cast("long"))
        .withColumn("n_hashes", F.lit(a.n_hashes).cast("int"))
    )
    return Bloom(words=words, n_bits=a.n_bits, n_hashes=a.n_hashes)


BLOOM_WORDS_SCHEMA = "word_idx long, word long, n_bits long, n_hashes int"


def bloom_fold_words(words: DataFrame) -> DataFrame:
    """Fold an APPEND-ONLY delta log of word frames into one filter
    frame: ``bit_or`` per word index.  Because OR is idempotent, a
    retried append (at-least-once ``foreachBatch``) changes nothing —
    which is why the streaming Bloom store is an append log folded on
    read instead of an overwritten file (no torn-write window at all).
    Mixed geometries in one log are corruption, not mergeable input —
    they raise."""
    geoms = words.select("n_bits", "n_hashes").distinct().collect()
    if len(geoms) > 1:
        raise ValueError(
            f"bloom_fold_words: {len(geoms)} distinct geometries in one "
            "store — an appended delta was built with the wrong shape"
        )
    return (
        words.groupBy("word_idx", "n_bits", "n_hashes")
        .agg(F.bit_or("word").alias("word"))
        .select("word_idx", "word", "n_bits", "n_hashes")
    )


def bloom_from_words(words: DataFrame) -> Bloom:
    """Rehydrate a persisted filter from its self-describing word frame
    (one ``first()`` — a single-row driver fetch — reads the geometry).
    An EMPTY frame cannot state its geometry and raises: persist filters
    with ``bloom_build``'s output, which always carries ≥ 1 word row for
    ≥ 1 key, and represent "no store yet" as ``None`` at the call site.
    """
    head = words.select("n_bits", "n_hashes").first()
    if head is None:
        raise ValueError(
            "bloom_from_words: empty word frame has no geometry; "
            "an absent store should be None, not an empty filter"
        )
    return Bloom(
        words=words, n_bits=int(head["n_bits"]), n_hashes=int(head["n_hashes"])
    )


def bloom_might_contain(
    df: DataFrame,
    col: str | Column,
    bloom: Bloom,
    result_col: str = "might_contain",
    id_col: str | None = None,
    mode: str = "auto",
    dense_max_bits: int = DENSE_MAX_BITS,
) -> DataFrame:
    """Add boolean ``result_col``: False ⇒ the key is DEFINITELY not in
    the built set (no false negatives); True ⇒ present or a ~fpp false
    positive.

    ``mode="auto"`` picks *dense* (single-row bitset broadcast, pure
    expression test, probe side untouched) while the filter fits
    ``dense_max_bits``, else *join* (positions explode and equi-join the
    word frame — needs ``id_col``, a unique row key, to fold the k
    per-position verdicts back onto rows).  Both modes compute the same
    answer; the gate is a memory posture, not a semantics switch
    (pinned in tests/test_bloom.py).  One deliberate asymmetry: a NULL
    ``id_col`` key cannot fold back through the equi-join, so join mode
    reports True (maybe-present) for such rows — the only direction a
    Bloom filter is allowed to err — where dense mode evaluates the
    hash of the NULL probe key row-local.  Downstream exact re-checks
    (``dedup_incremental_bloom``) make the two indistinguishable.
    """
    c = F.col(col) if isinstance(col, str) else col
    if mode == "auto":
        mode = "dense" if bloom.n_bits <= dense_max_bits else "join"
    pos = _positions(c, bloom.n_bits, bloom.n_hashes)

    if mode == "dense":
        n_words = bloom.n_bits // 64
        spark = df.sparkSession
        # Dense zero-filled bitset as ONE array<long> row: range join fills
        # the gaps, array_sort on (word_idx, word) structs gives positional
        # order (collect_list alone has no order contract).
        dense = (
            spark.range(n_words)
            .withColumnRenamed("id", "word_idx")
            .join(bloom.words.select("word_idx", "word"), "word_idx", "left")
            .na.fill({"word": 0})
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("word_idx", "word"))
                    ),
                    lambda s: s["word"],
                ).alias("__bloom_bits")
            )
        )
        probed = df
        for i, p in enumerate(pos):
            probed = probed.withColumn(f"__bp{i}", p)
        tests = " AND ".join(
            f"(element_at(__bloom_bits, CAST(shiftright(__bp{i}, 6) + 1 "
            f"AS INT)) & shiftleft(CAST(1 AS BIGINT), "
            f"CAST(__bp{i} & 63 AS INT))) != 0"
            for i in range(len(pos))
        )
        return (
            probed.join(F.broadcast(dense))
            .withColumn(result_col, F.expr(tests))
            .drop("__bloom_bits", *[f"__bp{i}" for i in range(len(pos))])
        )

    if mode != "join":
        raise ValueError(f"bloom_might_contain: unknown mode {mode!r}")
    if id_col is None:
        raise ValueError(
            "bloom_might_contain: join mode needs id_col (a unique row "
            "key) to fold per-position verdicts back onto rows"
        )
    probes = df.select(
        F.col(id_col).alias("__bid"),
        F.explode(F.array(*pos)).alias("__pos"),
    ).select(
        "__bid",
        F.shiftright(F.col("__pos"), 6).alias("word_idx"),
        F.col("__pos").bitwiseAND(F.lit(63)).cast("int").alias("__bit"),
    )
    verdicts = (
        probes.join(bloom.words.select("word_idx", "word"), "word_idx", "left")
        .select(
            "__bid",
            (
                F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), __bit)")
                )
                != F.lit(0)
            ).alias("__hit"),
        )
        .groupBy("__bid")
        .agg(F.min("__hit").alias(result_col))
    )
    # NULL join keys never match the verdict frame, so without the
    # coalesce a NULL-id row would get a NULL verdict and vanish from
    # BOTH branches of any maybe/not-maybe split (silent row loss, and a
    # semantics divergence from dense mode, which evaluates the test
    # expression row-local).  Defaulting to True routes NULL-key rows to
    # the "suspect" side, where the exact re-check decides — a Bloom
    # false positive is always safe, a false negative never is.
    return df.join(
        verdicts.withColumnRenamed("__bid", id_col), id_col, "left"
    ).withColumn(result_col, F.coalesce(F.col(result_col), F.lit(True)))


def dedup_incremental_bloom(
    new_df: DataFrame,
    seen_fps: DataFrame,
    bloom: Bloom | None = None,
    text_col: str = "text",
    fp_col: str = "fp",
    fpp: float = 0.01,
    id_col: str | None = None,
    mode: str = "auto",
) -> DataFrame:
    """``dedup_incremental`` (operators/dedup.py:125) with a Bloom
    prefilter: identical output contract, different cost shape.

    The plain form anti-joins the WHOLE batch against the WHOLE store
    every batch.  Here rows the filter rejects are definitely-fresh and
    never PROBE the store: the exact re-check is ONE left join whose
    condition is ``__maybe AND __fp == store_fp`` — the equi key still
    drives the hash/sort-merge strategy, and the ``__maybe`` residual
    makes every Bloom-negative row a guaranteed non-match that keeps
    its output row without a store lookup.  Exactness is unconditional:
    no-false-negatives means nothing fresh is ever misdropped, and
    every Bloom positive is re-checked exactly.

    Shape rationale (r13): the previous form SPLIT the flagged batch
    into fresh/suspect branches and unioned them back — that re-executed
    the scan+fingerprint+probe lineage once per branch (two BNLJ bloom
    attaches in the plan) and then paid the final ``dropDuplicates``
    shuffle on top of the suspect join's own exchange.  The single
    conditional join keeps one lineage execution, and because its
    output is already hash-partitioned by ``__fp``, the trailing
    ``dropDuplicates(["__fp"])`` REUSES that exchange — one shuffle of
    the surviving batch total, in both the broadcast-store and
    shuffled-store regimes (measured 4.4× faster at sf1).

    Pass a prebuilt ``bloom`` (the maintenance-time artifact, refreshed
    when the store compacts — ``bloom_merge`` folds per-batch deltas in
    between); ``None`` builds one from ``seen_fps`` inline, which only
    pays off if the result is persisted for later batches.
    """
    from jurimetria_etl_spark.operators.dedup import fingerprint

    if bloom is None:
        bloom = bloom_build(seen_fps, fp_col, fpp=fpp)
    batch = new_df.withColumn("__fp", fingerprint(text_col))
    # Join-mode probing needs a unique row key; when the caller supplies
    # none, the fingerprint IS one — dedup drops duplicate fingerprints
    # anyway, so folding the k per-position verdicts per __fp is exact.
    # Without this, the default call shape (no id_col) would raise in
    # bloom_might_contain exactly when the store outgrows the dense
    # bitset ceiling — the scale this operator exists for.
    flagged = bloom_might_contain(
        batch, F.col("__fp"), bloom, result_col="__maybe",
        id_col=id_col or "__fp", mode=mode,
    )
    seen = seen_fps.select(F.col(fp_col).alias("__seen_fp"))
    return (
        flagged.join(
            seen,
            F.col("__maybe") & (F.col("__fp") == F.col("__seen_fp")),
            "left",
        )
        .where(F.col("__seen_fp").isNull())
        .dropDuplicates(["__fp"])
        .drop("__fp", "__maybe", "__seen_fp")
    )
