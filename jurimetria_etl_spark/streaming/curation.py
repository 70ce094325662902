"""Streaming corpus curation — the append path as a Structured Streaming
pipeline (SURVEY §2.12 + §2.10 composed).

Each micro-batch of documents is deduplicated against the corpus so far —
exact first (fingerprint store, ``dedup_incremental``), then near-dup
(signature store, ``minhash_dedup_incremental``) — and the survivors are
appended to the corpus sink plus both stores.  State lives in PARQUET
STORES, not in Spark streaming state: at 100 TB the seen-fingerprint set
cannot live in executor memory, and stores double as the restart ledger
(the checkpoint directory only tracks source offsets).

Delivery semantics (documented, not hand-waved): plain parquet appends are
at-least-once under foreachBatch retries.  Append order is corpus →
signature store → fingerprint store: the fp store is the exact-dedup
gatekeeper, so once a doc's fingerprint lands there a retried batch drops
the doc before reaching any sink — meaning every sink written EARLIER
must already hold it.  A crash mid-sequence can therefore duplicate
corpus/signature rows on retry (duplicates die in any downstream exact
dedup) but can never lose a document or leave a corpus row without its
signature.  Swap the sinks for a transactional table format for
exactly-once; the operator composition is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.dedup import (
    build_near_dup_store,
    dedup_incremental,
    fingerprint,
    minhash_dedup_incremental,
)

DOCS_SCHEMA = "doc_id long, source string, lang string, text string"


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based micro-batch source over document parquet drops — one
    dropped file ≈ one ingest batch."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Empty frame ONLY when the store does not exist yet (first batch).
    Any other read failure must propagate and fail the micro-batch so the
    checkpoint retries it — swallowing a transient FS error here would
    silently skip the dedup pass and append duplicates forever.

    ``path`` resolves through ``store_data_dir``: once a store has been
    compacted into the manifested layout (sinks/maintenance.py), each
    micro-batch re-resolves the CURRENT version — which is what makes
    between-batch compaction safe for this stream."""
    from jurimetria_etl_spark.sinks.maintenance import store_data_dir

    path = store_data_dir(path)
    # the PUBLIC base class — catches both classic (captured) and Spark
    # Connect implementations
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.schema(schema).parquet(path)
        df.head(1)  # force path existence check now, not mid-plan
        return df
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


_AUDIT_SCHEMA = (
    "batch_id long, n_in long, n_gated long, n_fresh long, n_kept long"
)


def _append_audit(
    spark: SparkSession,
    audit_dir: str,
    batch_id: int,
    n_in: int,
    n_gated: int,
    n_fresh: int,
    n_kept: int,
) -> None:
    """One funnel row per micro-batch, appended to the audit log
    (manifest-resolved like every other store append)."""
    from jurimetria_etl_spark.sinks.maintenance import store_data_dir

    spark.createDataFrame(
        [(int(batch_id), int(n_in), int(n_gated), int(n_fresh), int(n_kept))],
        _AUDIT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(store_data_dir(audit_dir))


def load_curation_audit(spark: SparkSession, audit_dir: str) -> DataFrame:
    """The per-batch curation funnel, with at-least-once replays folded:
    one row per batch_id, each count the MAX over that batch's appended
    rows.  The fold is exact under the writer's ordering contract
    (``curate_document_stream(audit_dir=…)``): replays of an incomplete
    batch recompute identical counts, and the only divergent replay —
    re-running a batch whose fp append already landed — produces
    strictly SMALLER counts (its documents dedup away), which max
    discards.

    Generation dependency (r12 ADVICE): the exactness argument also
    assumes the gate's FIXED inputs — benchmark store, strip lists,
    classifier weights — are unchanged between a batch's first run and
    any replay of it.  Rebuilding one of those mid-stream is a
    generation change (the span stores' fixed-strip-list rule): a
    replay under the new generation can legitimately gate differently,
    and max would silently keep whichever generation counted higher.
    Operational contract: swap gate assets only between streams (stop,
    rebuild, restart with a fresh checkpoint), exactly as the store
    maintenance contracts require."""
    from jurimetria_etl_spark.sinks.maintenance import store_data_dir

    df = spark.read.schema(_AUDIT_SCHEMA).parquet(store_data_dir(audit_dir))
    return df.groupBy("batch_id").agg(
        *[
            F.max(c).alias(c)
            for c in ("n_in", "n_gated", "n_fresh", "n_kept")
        ]
    )


# id field formatted per stream (name AND type from the live batch —
# hardcoding "doc_id long" would break renamed/string-id streams)
_SIG_SCHEMA = (
    "{id_col} {id_t}, bands array<struct<band:int,bkey:bigint>>, "
    "sh array<bigint>"
)


def curate_document_stream(
    docs_stream: DataFrame,
    corpus_dir: str,
    fp_store_dir: str,
    sig_store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    available_now: bool = True,
    span_fp_store_dir: str | None = None,
    span_len: int = 40,
    span_k: int = 8,
    strip_spans: DataFrame | None = None,
    strip_lines: DataFrame | None = None,
    bloom_store_dir: str | None = None,
    bloom_capacity: int = 10_000_000,
    bloom_fpp: float = 0.01,
    semdedup_store_dir: str | None = None,
    semdedup_centroids: list[tuple[int, list[float]]] | None = None,
    semdedup_eps: float = 0.95,
    vec_col: str = "embedding",
    classifier: tuple[list[float], float] | None = None,
    classifier_threshold: float = 0.5,
    text_index_dir: str | None = None,
    text_index_fold_accents: bool = False,
    ann_store_dir: str | None = None,
    ann_centroids: list[tuple[int, list[float]]] | None = None,
    ann_quantize: bool = False,
    benchmark: DataFrame | None = None,
    benchmark_store_dir: str | None = None,
    decontam_ngram: int = 5,
    decontam_min_overlap: int = 1,
    decontam_min_ratio: float = 0.0,
    decontam_spans: bool = False,
    audit_dir: str | None = None,
):
    """Run the incremental curation pipeline over a document stream.

    Per micro-batch: exact-dedup vs the fingerprint store → near-dup vs
    the signature store (both also dedup within the batch) → append the
    survivors to ``corpus_dir`` and their fingerprints/signatures to the
    stores.  Returns the started ``StreamingQuery``.

    ``span_fp_store_dir`` (optional) additionally maintains a WINNOWED
    span-fingerprint store (operators/spans.py) over the curated corpus:
    each batch appends its survivors' fingerprints, so
    ``duplicate_spans_against(new, corpus, right_fps=store)`` runs
    cross-batch span detection without re-winnowing history — the
    fingerprint-store pattern applied to the suffix-array-dedup axis.
    Append order: BEFORE the fp store, like every other sink — the store
    is the ONLY source of right-side candidacy in
    ``duplicate_spans_against``, so a crash between the fp append and a
    later span-fp append would permanently omit those documents' span
    candidacy (the replay drops them at the exact-dedup gate).  A
    retried batch's duplicate rows only repeat candidacy hints and are
    deduplicated on read.

    ``strip_spans`` (optional) applies a STATIC boilerplate strip-list —
    a prior offline ``boilerplate_spans`` run over the corpus — to every
    micro-batch FIRST (``strip_boilerplate_bulk`` in replace mode), so
    fingerprints, signatures, and the landed corpus all see content, not
    template: two documents differing only in boilerplate deduplicate.
    The list must stay FIXED for the life of the stores (fingerprints
    are of stripped text — a different list means a new store
    generation, same rule as changing ``k``/``bands``); the bounded list
    is re-collected per micro-batch (one tiny job), keeping this
    function stateless across restarts.

    ``strip_lines`` (optional) is the LINE-level twin: a prior offline
    ``duplicate_lines`` strip-list applied per batch with
    ``strip_duplicate_lines`` in replace mode, BEFORE ``strip_spans`` —
    the same two-axis order ``plans.curation.curate_corpus`` uses (lines
    first: whole-line removals shrink the span surface) — so documents
    differing only in boilerplate LINES (nav menus, cookie banners)
    deduplicate across batches too.  Same fixed-list-per-store-generation
    rule as ``strip_spans``.

    ``bloom_store_dir`` (optional) maintains a Bloom filter summarizing
    the fingerprint store (operators/bloom.py) so each batch's exact
    dedup runs ``dedup_incremental_bloom``: Bloom-negative rows skip the
    store anti-join entirely — at 100 TB the store is billions of rows
    and the batch is not, so the prefilter is the difference between
    "shuffle the store per batch" and "broadcast packed words".  The
    store is an APPEND-ONLY delta log of word frames, folded with
    ``bit_or`` on read (``bloom_fold_words``) — OR-idempotence makes
    at-least-once retries free and removes any overwrite/torn-write
    window.  ORDERING INVARIANT: the batch's Bloom delta appends BEFORE
    the fingerprint append, keeping the filter a SUPERSET of the store
    at every instant — a crash between the two leaves extra Bloom bits
    (false-positive-like: re-checked exactly, zero harm), never a
    store fingerprint the filter misses (which would admit duplicates
    as "definitely fresh").  ``bloom_capacity`` provisions the fixed
    geometry at first batch (a Bloom cannot grow; oversubscribing only
    raises the false-positive rate — correctness is unconditional since
    every positive re-checks against the real store, so a saturated
    filter degrades to plain ``dedup_incremental`` cost, not to wrong
    output).

    ``semdedup_store_dir`` (optional, requires ``semdedup_centroids``
    and a ``vec_col`` embedding column on the stream) additionally
    deduplicates each batch SEMANTICALLY against every kept vector so
    far (``semdedup_incremental``, operators/semdedup.py): the store
    holds (cell, id, vector) for survivors, batches scan only the cells
    they touch, and same-id store matches are excluded so the
    at-least-once replay invariant matches the minhash store's.  The
    centroid set is part of the store's generation contract —
    re-clustering means a new store, the fixed-list rule again.  Store
    append rides between the signature and fingerprint appends (it
    filters future batches, so it must land only after the corpus
    holds the doc).

    ``classifier=(weights, bias)`` (optional) applies the hashed-linear
    quality gate (operators/classify.py) to each micro-batch AFTER the
    strip lists and BEFORE any fingerprinting — the same rounded-score
    ``quality_prob ≥ classifier_threshold`` predicate
    ``plans.curation.curate_corpus`` applies, so a document the batch
    pipeline would reject never enters the streamed corpus or its
    dedup stores (r8 verdict: the streaming path previously curated
    without the quality filter the batch path applies).  Weights are a
    generation contract like the strip lists: retrained weights change
    which documents land, so pair a weight change with a new corpus
    generation, not an in-place swap.

    ``benchmark`` / ``benchmark_store_dir`` (optional) gate each
    micro-batch against an evaluation set BEFORE any fingerprinting —
    the batch pipeline's decontamination stage
    (``plans.curation.curate_corpus(benchmark=…)``) applied per batch,
    so a contaminated document never enters the streamed corpus or
    seeds any dedup store (where it could become the cluster survivor
    that evicts its CLEAN near-dups).  ``benchmark`` is the static eval
    frame; ``benchmark_store_dir`` (preferred for a long-running
    stream) is a persisted ``build_benchmark_store`` directory whose
    shingle-hash set — and span fingerprints when ``decontam_spans``
    — each batch joins directly, so the benchmark text is never
    re-shingled per batch; the store verifies ``decontam_ngram`` (and
    ``span_len``/``span_k``) against its recorded generation contract.
    ``decontam_spans=True`` additionally drops documents sharing an
    EXACT ``span_len``-char span with the benchmark and requires the
    ``benchmark`` frame (span verification resolves the benchmark
    text).  The benchmark version is a generation contract like the
    strip lists: swapping eval sets mid-stream changes which documents
    land, so pair it with a new corpus generation.

    ``text_index_dir`` (optional) maintains the incremental BM25 index
    (operators/search.py:append_text_index) over the curated corpus:
    each batch appends its survivors' postings + document lengths, so
    ``bm25_search(load_text_index(spark, dir), queries)`` serves
    keyword search over everything curated so far without re-indexing
    history.  Appends ride between the span-fp and fp appends (the
    gatekeeper rule); replays fold away at load.  The tokenizer
    settings — including ``text_index_fold_accents`` — are the store's
    generation contract; search the loaded index with the same
    ``fold_accents`` flag.

    ``ann_store_dir`` (optional, requires ``ann_centroids`` and a
    ``vec_col`` embedding column on the stream) maintains the persisted
    incremental IVF ANN index (operators/ann_store.py) over the curated
    corpus: each batch appends its survivors' (cell, id, vector) rows —
    a narrow literal-matrix assignment, partitioned by cell on disk —
    so ``ann_ivf_topk_store(_batch)`` serves dense retrieval over
    everything curated so far without a per-session re-index.  Appends
    ride between the span-fp and text-index appends (the gatekeeper
    rule: BEFORE the fp store — once a doc's fingerprint lands, a
    replay drops it before reaching any later sink, and a crash between
    fp and ANN appends would permanently omit the doc from dense
    retrieval).  A replayed append is byte-identical and
    ``load_ann_store`` folds it away.  The centroid set is the store's
    generation contract — ``append_ann_store`` verifies it per batch
    against the store's ``_CENTROIDS.json`` and re-clustering goes
    through ``sinks.maintenance.recluster_ann_store`` in a maintenance
    window (hand the SAME new set here from the next batch on).
    ``ann_quantize=True`` stores int8 codes + per-vector scale
    (~8× smaller rows); the flag is part of the generation contract
    like the tokenizer settings.

    ``audit_dir`` (optional) appends ONE funnel row per non-empty
    micro-batch — (batch_id, n_in, n_gated, n_fresh, n_kept): raw rows
    in, survivors of the gate section (strips → classifier →
    decontamination), survivors of exact dedup, and what landed — the
    streaming counterpart of ``plans.curation.curation_funnel``, giving
    a long-running stream its drop-rate monitor (a batch whose n_gated
    collapses signals upstream drift; n_fresh≈0 signals a duplicate
    storm).  Costs up to three extra micro-batch-sized counts per batch
    (the dedup frame is checkpointed so the count never re-executes the
    store anti-join).  The row is appended BEFORE the corpus append, so
    under at-least-once retries every replay of an incomplete batch
    recomputes IDENTICAL counts (the fp store is unchanged until the
    batch's final append), while a replay of a COMPLETED batch writes a
    zeros-ish row — ``load_curation_audit`` folds replays with a
    per-batch max, which is exact under exactly that asymmetry.

    ``available_now=True`` drains everything currently in the source then
    stops — the backfill/test mode; ``False`` runs continuously.
    """
    if ann_store_dir is not None and ann_centroids is None:
        raise ValueError(
            "ann_store_dir requires ann_centroids — the centroid set is "
            "the store's generation contract"
        )
    if decontam_spans and benchmark is None:
        raise ValueError(
            "decontam_spans requires the benchmark frame — span "
            "verification resolves the benchmark text (the persisted "
            "store holds only fingerprints)"
        )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.head(1):
            return
        n_in = batch_df.count() if audit_dir is not None else None
        if strip_lines is not None:
            from jurimetria_etl_spark.operators.spans import (
                strip_duplicate_lines,
            )

            batch_df = strip_duplicate_lines(
                batch_df,
                strip_lines,
                id_col,
                text_col,
                replace=True,
            )
        if strip_spans is not None:
            from jurimetria_etl_spark.operators.spans import (
                strip_boilerplate_bulk,
            )

            batch_df = strip_boilerplate_bulk(
                batch_df,
                strip_spans,
                span_len,
                id_col,
                text_col,
                replace=True,
            )
        if classifier is not None:
            from jurimetria_etl_spark.operators.classify import (
                linear_quality_score,
            )

            # Same rounded-score gate as curate_corpus (plans/curation.py)
            # so stream and batch keep/reject identical documents.
            batch_df = batch_df.where(
                linear_quality_score(text_col, *classifier)
                >= F.lit(classifier_threshold)
            )
            if not batch_df.head(1):
                if audit_dir is not None:
                    _append_audit(spark, audit_dir, batch_id, n_in, 0, 0, 0)
                return
        if benchmark is not None or benchmark_store_dir is not None:
            # Decontaminate BEFORE any fingerprinting (curate_corpus's
            # stage order): a contaminated doc must not seed the fp/sig
            # stores, where its fingerprint would shadow clean near-dups
            # in every later batch.
            from jurimetria_etl_spark.operators.decontaminate import (
                remove_contaminated,
            )

            bench_set = None
            bench_fps = None
            if benchmark_store_dir is not None:
                from jurimetria_etl_spark.operators.decontaminate import (
                    load_benchmark_store,
                )

                # Re-load per batch (one tiny parquet listing), so a
                # maintenance-window rebuild is picked up at the next
                # batch; the loader verifies the generation contract.
                bs = load_benchmark_store(
                    spark,
                    benchmark_store_dir,
                    n=decontam_ngram,
                    span_len=span_len if decontam_spans else None,
                    span_k=span_k if decontam_spans else None,
                )
                bench_set = bs.shingles
                bench_fps = bs.span_fps
            batch_df = remove_contaminated(
                batch_df,
                benchmark,
                id_col,
                text_col,
                n=decontam_ngram,
                min_overlap=decontam_min_overlap,
                min_overlap_ratio=decontam_min_ratio,
                bench_set=bench_set,
            )
            if decontam_spans:
                from jurimetria_etl_spark.operators.decontaminate import (
                    remove_span_contaminated,
                )

                batch_df = remove_span_contaminated(
                    batch_df,
                    benchmark,
                    span_len=span_len,
                    k=span_k,
                    id_col=id_col,
                    text_col=text_col,
                    bench_fps=bench_fps,
                )
            if not batch_df.head(1):
                if audit_dir is not None:
                    _append_audit(spark, audit_dir, batch_id, n_in, 0, 0, 0)
                return
        n_gated = batch_df.count() if audit_dir is not None else None
        fp_store = _read_or_empty(spark, fp_store_dir, "fp bigint")
        # Store read-back schemas derive the id column's NAME and TYPE
        # from the live batch (same rule as the semdedup store below and
        # spans.py's out_schema): a renamed or string-typed id must
        # round-trip, not coerce through a hardcoded "doc_id long".
        id_t = batch_df.schema[id_col].dataType.simpleString()
        sig_store = _read_or_empty(
            spark, sig_store_dir, _SIG_SCHEMA.format(id_col=id_col, id_t=id_t)
        )
        bloom = None
        if bloom_store_dir is not None:
            from jurimetria_etl_spark.operators.bloom import (
                BLOOM_WORDS_SCHEMA,
                bloom_build,
                bloom_fold_words,
                bloom_from_words,
            )

            word_log = _read_or_empty(
                spark, bloom_store_dir, BLOOM_WORDS_SCHEMA
            )
            if word_log.head(1):
                bloom = bloom_from_words(bloom_fold_words(word_log))
            elif fp_store.head(1):
                # Bloom store enabled on a stream with fp HISTORY: the
                # filter must cover every store fingerprint (the
                # superset invariant — a filter seeded only from this
                # batch would pass old duplicates as "definitely fresh"
                # and skip the store anti-join).  One-time backfill from
                # the fp store, appended to the log first so a retry
                # sees a non-empty log and does not backfill twice
                # (bit_or fold makes a double append harmless anyway).
                from jurimetria_etl_spark.sinks.maintenance import (
                    store_data_dir as _sdd,
                )

                seed = bloom_build(
                    fp_store, "fp",
                    expected_items=bloom_capacity, fpp=bloom_fpp,
                )
                seed.words.write.mode("append").parquet(
                    _sdd(bloom_store_dir)
                )
                bloom = seed
        if bloom is not None:
            from jurimetria_etl_spark.operators.bloom import (
                dedup_incremental_bloom,
            )

            # id_col lets mode="auto" switch to the join probe when the
            # provisioned filter outgrows the dense bitset ceiling (large
            # bloom_capacity) instead of raising in bloom_might_contain.
            fresh = dedup_incremental_bloom(
                batch_df, fp_store, bloom=bloom, text_col=text_col,
                id_col=id_col,
            )
        else:
            fresh = dedup_incremental(batch_df, fp_store, text_col)
        if audit_dir is not None:
            # checkpoint so the audit count and the near-dup consumer
            # share one execution of the store anti-join
            fresh = fresh.localCheckpoint()
            n_fresh = fresh.count()
        survivors = minhash_dedup_incremental(
            fresh, sig_store, id_col, text_col, threshold, k, bands, n
        )
        if semdedup_store_dir is not None:
            from jurimetria_etl_spark.operators.semdedup import (
                semdedup_incremental,
            )

            if semdedup_centroids is None:
                raise ValueError(
                    "semdedup_store_dir requires semdedup_centroids — "
                    "the centroid set is the store's generation contract"
                )
            if vec_col not in batch_df.columns:
                raise ValueError(
                    f"semdedup_store_dir requires a {vec_col!r} column "
                    "on the document stream"
                )
            # Derive id/vector types from the live batch — the store was
            # written from these columns, so a string id or array<double>
            # embedding must round-trip, not coerce through a hardcoded
            # long/float (same rule as spans.py's out_schema).
            id_t = batch_df.schema[id_col].dataType.simpleString()
            vec_t = batch_df.schema[vec_col].dataType.simpleString()
            sem_store = _read_or_empty(
                spark,
                semdedup_store_dir,
                f"sem_cluster int, {id_col} {id_t}, {vec_col} {vec_t}",
            )
            survivors = semdedup_incremental(
                survivors,
                sem_store,
                semdedup_centroids,
                eps=semdedup_eps,
                id_col=id_col,
                vec_col=vec_col,
                # the store is cell-partitioned (the append below) —
                # make the cell read a partition filter by contract,
                # not DPP luck
                static_prune=True,
            )
        # One deterministic materialization: everything below appends
        # pieces of `survivors`; recomputing it per sink would re-run the
        # dedup joins three times (and could diverge under source retry).
        survivors = survivors.localCheckpoint()
        if audit_dir is not None:
            # BEFORE the corpus append: a replay of an INCOMPLETE batch
            # recomputes identical counts (the fp gatekeeper is unchanged
            # until the batch's final append), so the only divergent
            # replay row is the post-completion zeros row the loader's
            # max-fold discards (see docstring).
            _append_audit(
                spark, audit_dir, batch_id,
                n_in, n_gated, n_fresh, survivors.count(),
            )
        # Append order matters for retry consistency: corpus first (never
        # lose documents), then the SIGNATURE store, then the fingerprint
        # store LAST.  The fp store is the exact-dedup gatekeeper — once a
        # doc's fingerprint lands there, a retried batch drops the doc
        # before reaching any later sink, so every earlier sink must
        # already hold it.  (fp-before-sig would leave a crash window
        # whose retry permanently omits signatures: corpus rows whose
        # near-dups are never detected again.)  A crash between sig and
        # fp appends is safe because minhash_dedup_incremental excludes
        # same-id store matches: the replayed doc is not dropped by its
        # own stored signature, so the fp append eventually lands.
        # Appends resolve the store manifests too (no-op for plain dirs):
        # re-resolving per batch means a between-batch compaction's new
        # version receives every later append.
        from jurimetria_etl_spark.sinks.maintenance import store_data_dir

        survivors.write.mode("append").parquet(store_data_dir(corpus_dir))
        build_near_dup_store(survivors, id_col, text_col, k, bands, n).write.mode(
            "append"
        ).parquet(store_data_dir(sig_store_dir))
        if semdedup_store_dir is not None:
            from jurimetria_etl_spark.operators.semdedup import (
                build_semdedup_store,
            )

            # partitioned BY CELL — the layout build_semdedup_store's
            # contract names (r14: previously appended flat, which made
            # the "incremental scan reads only the batch's cells" claim
            # DPP luck instead of a partition filter; the ann store's
            # append posture, applied here).  Pre-r14 flat stores are
            # REFUSED before the write (r14 ADVICE): a hive append next
            # to flat files would corrupt the tree silently and surface
            # later in an unrelated read — the guard turns it into an
            # upgrade instruction while the store is still intact.
            from jurimetria_etl_spark.sinks.maintenance import (
                require_cell_partitioned,
            )

            require_cell_partitioned(
                store_data_dir(semdedup_store_dir),
                "sem_cluster",
                "curate_document_stream semdedup append",
            )
            build_semdedup_store(
                survivors.select(id_col, vec_col),
                semdedup_centroids,
                id_col,
                vec_col,
            ).write.mode("append").partitionBy("sem_cluster").parquet(
                store_data_dir(semdedup_store_dir)
            )
        if span_fp_store_dir is not None:
            # BEFORE the fp append, like every other store: the fp store
            # is the exact-dedup gatekeeper — once a doc's fingerprint
            # lands there a replay drops the doc before reaching any
            # later sink, so a crash between fp and span-fp appends would
            # permanently omit the batch's span fingerprints (and with
            # them its duplicate/leak candidacy in
            # duplicate_spans_against).
            from jurimetria_etl_spark.operators.spans import (
                winnowed_fingerprints,
            )

            winnowed_fingerprints(
                survivors, span_len, span_k, id_col, text_col
            ).write.mode("append").parquet(store_data_dir(span_fp_store_dir))
        if ann_store_dir is not None:
            # BEFORE the fp append (gatekeeper rule — see docstring); a
            # replayed append is byte-identical and folds away at load.
            # append_ann_store resolves the store manifest and verifies
            # the centroid generation per batch.
            from jurimetria_etl_spark.operators.ann_store import (
                append_ann_store,
            )

            if vec_col not in batch_df.columns:
                raise ValueError(
                    f"ann_store_dir requires a {vec_col!r} column on "
                    "the document stream"
                )
            append_ann_store(
                survivors.select(id_col, vec_col),
                ann_store_dir,
                ann_centroids,
                id_col=id_col,
                vec_col=vec_col,
                quantize=ann_quantize,
            )
        if text_index_dir is not None:
            # BEFORE the fp append (gatekeeper rule): once a doc's
            # fingerprint lands, a replay drops it before reaching any
            # later sink — a crash between fp and index appends would
            # permanently omit the doc from keyword search.  A replayed
            # index append is byte-identical and load_text_index folds
            # it away (append_text_index's retry contract).
            from jurimetria_etl_spark.operators.search import (
                append_text_index,
            )

            append_text_index(
                survivors, text_index_dir, id_col, text_col,
                fold_accents=text_index_fold_accents,
            )
        new_fps = survivors.select(fingerprint(text_col).alias("fp"))
        if bloom_store_dir is not None:
            # BEFORE the fp append (superset invariant — see docstring).
            # Geometry: the existing log's, else provisioned capacity.
            from jurimetria_etl_spark.operators.bloom import bloom_build

            geom = (
                (bloom.n_bits, bloom.n_hashes)
                if bloom is not None
                else None
            )
            delta = bloom_build(
                new_fps,
                "fp",
                expected_items=bloom_capacity,
                fpp=bloom_fpp,
                geometry=geom,
            )
            delta.words.write.mode("append").parquet(
                store_data_dir(bloom_store_dir)
            )
        new_fps.write.mode("append").parquet(store_data_dir(fp_store_dir))

    writer = (
        docs_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
