"""Layout maintenance: small-file compaction for append-heavy parquet dirs.

The streaming curation path (streaming/curation.py) and any foreachBatch
append sink write one file set PER MICRO-BATCH — after a day of 1-minute
triggers a table holds thousands of KB-sized files, and every downstream
scan pays file-open + footer + task-schedule cost per file (the classic
small-files problem; at 100 TB it is the difference between a listing
that takes seconds and one that takes hours).

``compact_parquet`` rewrites a directory into ~``target_file_bytes``
files: size the output file count from the CURRENT bytes on disk, rewrite
via one round-robin repartition (or per-partition for hive layouts), then
swap directories.  The swap is two renames — NOT atomic: a reader racing
the swap can see a missing directory.  For stores with concurrent
readers, use the MANIFESTED-STORE api below instead: data lives in
version directories under ``<store>/_versions/<hex>/`` and a single
``<store>/_MANIFEST`` file names the current one; publishing a new
version is ONE ``os.replace`` (atomic on POSIX), and old version
directories are retained until an explicit ``store_prune`` — a reader
that resolved the previous version keeps a fully-intact directory for as
long as the pruning grace lasts.  The underscore prefixes mean Spark's
file listing ignores the internals, so a legacy plain-directory reader
pointed at the store root still sees exactly the legacy root files.

Compaction never deletes data it has not verified: the rewritten tree's
row count must equal the source's or the swap is abandoned (original
kept, report says so).

What this does NOT solve: coordination with concurrent WRITERS.  An
appender that resolved the current version, then raced a compaction and
a prune, appends into a directory the prune deletes.  Bare
parquet-on-filesystem has no transaction log; run compaction+prune in
the writer's maintenance window (streaming/curation.py appends re-resolve
per micro-batch, so between-batch compaction is safe and prune needs one
retained generation of grace), or adopt a transactional table format.
Correctness (row multiset identical, partition layout preserved, pruning
still effective, manifest atomicity under a racing reader) is
value-tested in tests/test_maintenance.py.
"""

from __future__ import annotations

import math
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a local parquet dir tree.
    Local-FS walk; on HDFS/S3 swap in the Hadoop FileSystem listing —
    the compaction logic above it is unchanged."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` into ≈``target_file_bytes`` parquet files.

    Unpartitioned: one round-robin repartition to
    ``ceil(total_bytes / target)`` files.  Hive-partitioned (pass the
    ``partition_cols``): repartition on the partition columns so each
    output task writes whole partitions (files per hive dir ≈ dirs'
    share), preserving the directory layout and its pruning.

    Returns a report dict {files_before, files_after, bytes, skipped}.
    No-ops (skipped=True) when the dir already has fewer than
    ``min_files_to_compact`` files — compaction must be idempotent-cheap
    so a scheduler can run it blindly.
    """
    files_before, total = dir_stats(path)
    if files_before < min_files_to_compact:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total,
            "skipped": True,
        }
    n_out = max(1, math.ceil(total / target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    _rewrite(df, tmp, n_out, partition_cols)
    # Verify BEFORE destroying anything: a silently short rewrite (lost
    # task output, truncated write) must abandon the swap, not delete the
    # only good copy.  Row count is the cheap sufficient check here — the
    # rewrite is a pure repartition, so any loss shows up as a count
    # mismatch.
    src_rows = _rows_in(spark, path)
    new_rows = _rows_in(spark, tmp)
    if new_rows != src_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total,
            "skipped": True,
            "verified": False,
            "reason": f"rewrite rows {new_rows} != source rows {src_rows}",
        }
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    files_after, _ = dir_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total,
        "skipped": False,
        "verified": True,
    }


def _rewrite(
    df: DataFrame, out: str, n_out: int, partition_cols: list[str] | None
) -> None:
    if partition_cols:
        (
            df.repartition(n_out, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(out)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(out)


def _rows_in(spark: SparkSession, path: str) -> int:
    """Row count of a parquet tree (parquet metadata count — no data scan)."""
    return spark.read.parquet(path).count()


# ───────────────────── manifested store (atomic swap) ──────────────────────

_MANIFEST = "_MANIFEST"
_VERSIONS = "_versions"


def _manifest_file(store: str) -> str:
    return os.path.join(store, _MANIFEST)


def store_data_dir(store: str) -> str:
    """Resolve the directory readers should scan.

    Manifested store → the version directory the ``_MANIFEST`` names.
    Plain directory (no manifest) → the directory itself, so every
    consumer can resolve through this unconditionally and legacy stores
    keep working unchanged."""
    mf = _manifest_file(store)
    try:
        with open(mf, encoding="utf-8") as f:
            version = f.read().strip()
    except FileNotFoundError:
        return store
    return os.path.join(store, _VERSIONS, version)


def require_cell_partitioned(data_dir: str, partition_col: str, op: str) -> None:
    """Refuse to mix a hive-partitioned write into a legacy FLAT store
    (r14 ADVICE): appending ``partition_col=…`` directories next to flat
    parquet files succeeds at write time but produces a tree Spark's
    parquet reader rejects — the corruption lands silently and the
    failure surfaces later in an unrelated-looking read, where
    at-least-once replay can't repair it.  Called BEFORE the first
    partitioned append so the migration error is caught while the store
    is still intact.  A missing or empty data dir (fresh store) passes;
    a dir holding only ``partition_col=…`` subdirs passes."""
    try:
        names = os.listdir(data_dir)
    except (FileNotFoundError, NotADirectoryError):
        return
    flat = [
        f
        for f in names
        if f.endswith(".parquet") and os.path.isfile(os.path.join(data_dir, f))
    ]
    if flat:
        raise ValueError(
            f"{op}: store data dir {data_dir!r} holds flat parquet files "
            f"(legacy pre-partitioned layout) — appending "
            f"{partition_col}=… hive directories next to them would "
            "corrupt the tree (mixed layouts don't read); run "
            f"compact_store(store, partition_cols=[{partition_col!r}], "
            "min_files_to_compact=1) once to upgrade (the explicit "
            "min_files matters: a single-file store would otherwise be "
            "skipped as already-compact)"
        )
    # a store hive-partitioned by a DIFFERENT column is just as
    # corruptible: the appended {partition_col}= dirs would land next to
    # the foreign ones and the mixed tree fails the same way (e.g. an
    # ann_store_dir pointed at a sem_cluster-partitioned semdedup store)
    foreign = sorted(
        {
            n.split("=", 1)[0]
            for n in names
            if "=" in n
            and not n.startswith(("_", "."))
            and os.path.isdir(os.path.join(data_dir, n))
        }
        - {partition_col}
    )
    if foreign:
        raise ValueError(
            f"{op}: store data dir {data_dir!r} is hive-partitioned by "
            f"{foreign} — not by {partition_col!r}; this is a different "
            "store layout (wrong store dir?), and appending "
            f"{partition_col}=… directories next to it would corrupt "
            "the tree"
        )


def _publish(store: str, version: str) -> None:
    """Atomically point the manifest at ``version`` — one ``os.replace``
    of a same-filesystem temp file, so a reader sees either the old or
    the new manifest in full, never a torn or missing one."""
    os.makedirs(store, exist_ok=True)
    tmp = _manifest_file(store) + f".tmp_{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_file(store))


def _copy_sidecars(src_dir: str, dst_dir: str) -> None:
    """Copy ``_*.json`` generation-sidecar files (geometry contracts,
    not data) from one generation directory into another.  Spark's file
    listing ignores the ``_`` prefix, so sidecars ride version dirs for
    free; parquet/data files are never touched."""
    if not os.path.isdir(src_dir):
        return
    for name in os.listdir(src_dir):
        if name.startswith("_") and name.endswith(".json"):
            full = os.path.join(src_dir, name)
            if os.path.isfile(full):
                shutil.copy2(full, os.path.join(dst_dir, name))


def compact_store(
    spark: SparkSession,
    store: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
    min_files_to_compact: int = 2,
) -> dict:
    """Reader-safe compaction: rewrite the store's current data into a NEW
    version directory, verify the row count, then atomically publish it.
    The previous data (old version dir, or the legacy root files when
    upgrading a plain directory) is RETAINED so any reader that resolved
    it mid-compaction keeps an intact directory; reclaim space later with
    ``store_prune`` once in-flight readers have drained.

    Works on both layouts: a plain append directory is upgraded to a
    manifested store on first compaction (legacy root files stay behind
    for legacy readers until pruned — Spark ignores the ``_``-prefixed
    internals, so those readers see exactly what they saw before the
    upgrade)."""
    src = store_data_dir(store)
    files_before, total = dir_stats(src)
    if files_before < min_files_to_compact:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total,
            "skipped": True,
        }
    n_out = max(1, math.ceil(total / target_file_bytes))
    version = uuid.uuid4().hex[:12]
    vdir = os.path.join(store, _VERSIONS, version)
    _rewrite(spark.read.parquet(src), vdir, n_out, partition_cols)
    src_rows = _rows_in(spark, src)
    new_rows = _rows_in(spark, vdir)
    if new_rows != src_rows:
        shutil.rmtree(vdir, ignore_errors=True)
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total,
            "skipped": True,
            "verified": False,
            "reason": f"rewrite rows {new_rows} != source rows {src_rows}",
        }
    # Propagate generation-sidecar metadata (e.g. the ANN store's
    # embedded ``_CENTROIDS.json``) from the source generation into the
    # new one BEFORE the publish: compaction preserves geometry, and a
    # version dir without its sidecar would fall back to the store-root
    # copy — re-opening the recluster race this embedding closes.
    _copy_sidecars(src, vdir)
    _publish(store, version)
    files_after, _ = dir_stats(vdir)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total,
        "skipped": False,
        "verified": True,
        "version": version,
    }


def _infer_partition_cols(data_dir: str) -> list[str] | None:
    """Infer a single-level hive partition column from the directory
    layout (``col=value`` subdirectories) so a maintenance rewrite
    PRESERVES it — compacting a cell-partitioned store (the semdedup /
    ANN layouts) flat would silently destroy every consumer's partition
    pruning (r14).  Only the repo's store layouts are in scope: one
    partition level, one column."""
    cols = set()
    try:
        entries = os.listdir(data_dir)
    except (FileNotFoundError, NotADirectoryError):
        return None
    for name in entries:
        if name.startswith(("_", ".")):
            continue
        if "=" in name and os.path.isdir(os.path.join(data_dir, name)):
            cols.add(name.split("=", 1)[0])
    if len(cols) == 1:
        return [next(iter(cols))]
    return None


def maintain_stores(
    spark: SparkSession,
    stores: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    prune_previous: bool = True,
) -> dict[str, dict]:
    """One maintenance-window pass over a set of append stores (the
    streaming-curation corpus + fp/sig/span stores): reader-safe
    ``compact_store`` each, then — when ``prune_previous`` — reclaim the
    generations left by the PREVIOUS pass.  Prune-before-compact order
    gives every generation one full maintenance interval of reader
    grace: a reader that resolved generation N keeps it intact until the
    N+2 pass.  Returns per-store reports (compaction report plus a
    ``pruned`` count).

    Text-index stores piggyback their stop-list refresh on this window
    (r11 verdict task 4): when a ``.../postings`` store's index has a
    published ``stop_list/_STOPLIST.json``, the list is re-materialized
    at its RECORDED ratio + strict_stats flavor — the staleness
    contract (operators/search.py ``materialize_stop_list``: appends
    can push terms over the ratio until the next materialization) is
    enforced by the maintenance entry point instead of operator memory.
    The refresh report rides the postings store's entry under
    ``stop_list``."""
    import json

    reports: dict[str, dict] = {}
    for store in stores:
        pruned = store_prune(store) if prune_previous else []
        # preserve a hive layout through the rewrite: cell-partitioned
        # stores (semdedup/ANN) passed through this generic pass must
        # keep their partition pruning
        data_dir = store_data_dir(store)
        part_cols = _infer_partition_cols(data_dir)
        upgraded = False
        min_files = min_files_to_compact
        if part_cols is None:
            # opportunistic legacy-layout upgrade (r14 verdict task 5):
            # a FLAT store whose rows carry a cell column (pre-r14
            # semdedup/ANN layouts) is re-written cell-partitioned here,
            # so split_semdedup_cell / split_cell / the partition-pruned
            # probes work without the operator telling the caller to run
            # compact_store(partition_cols=…) by hand.  One parquet
            # footer sniff — no Spark job — and the upgrade compacts
            # even a single-file store (the rewrite's purpose is the
            # layout, not the file count).
            from jurimetria_etl_spark.operators.ann_store import (
                _sniff_store_columns,
            )

            sniffed = _sniff_store_columns(data_dir)
            cell_cols = [
                c
                for c in ("sem_cluster", "ivf_cell")
                if sniffed is not None and c in sniffed
            ]
            if len(cell_cols) == 1:
                part_cols = cell_cols
                upgraded = True
                min_files = 1
        report = compact_store(
            spark,
            store,
            target_file_bytes=target_file_bytes,
            partition_cols=part_cols,
            min_files_to_compact=min_files,
        )
        if upgraded and not report.get("skipped"):
            report["layout_upgraded"] = part_cols[0]
        report["pruned"] = len(pruned)
        if os.path.basename(os.path.normpath(store)) == "postings":
            index_dir = os.path.dirname(os.path.normpath(store))
            meta_path = os.path.join(
                index_dir, "stop_list", "_STOPLIST.json"
            )
            if os.path.exists(meta_path):
                from jurimetria_etl_spark.operators.search import (
                    materialize_stop_list,
                )

                with open(meta_path, encoding="utf-8") as f:
                    meta = json.load(f)
                report["stop_list"] = materialize_stop_list(
                    spark,
                    index_dir,
                    max_df_ratio=float(meta["max_df_ratio"]),
                    strict_stats=bool(meta.get("strict_stats", False)),
                )
        reports[store] = report
    return reports


def recluster_semdedup_store(
    spark: SparkSession,
    store: str,
    new_centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_file_bytes: int = 128 * 1024 * 1024,
    assign: str = "auto",
) -> dict:
    """Re-cluster a SemDeDup store onto a NEW centroid set — the
    maintenance remedy for geometry drift (operators/semdedup.py: the
    centroid set is the store's generation contract, and
    ``max_cluster_rows`` overflows advise "re-cluster" — this is the
    operator that makes that advice actionable).

    Reads the current generation's survivor (id, vector) rows,
    re-assigns each to its nearest NEW centroid
    (``build_semdedup_store``'s kernel), writes the re-assigned rows
    into a fresh version directory partitioned by ``sem_cluster`` (so
    incremental batches keep partition-pruned cell reads), verifies the
    row count, and atomically publishes the manifest.  Readers that
    resolved the old generation keep an intact directory — reclaim with
    ``store_prune`` after the grace interval, the ``compact_store``
    posture exactly.

    The survivor SET is intentionally unchanged: which vectors were
    kept was decided when they streamed in; re-clustering rebalances
    the cells future batches scan against, it does not re-litigate
    history.  Callers must hand the SAME ``new_centroids`` to
    ``semdedup_incremental`` / ``curate_document_stream`` from the next
    batch on (pass both atomically — a mixed-generation read is exactly
    what the manifest swap prevents).  Derive the new set from the
    store's own vectors with ``similarity.train_ivf_centroids`` (e.g.
    ``n_clusters = rows // target_occupancy`` — the scaled-cells rule
    SCALE.md measures).

    Run inside the same maintenance window as ``compact_store``: an
    append that resolved the OLD generation's path concurrently with
    the swap lands in a directory the manifest no longer names (the
    documented writer-vs-maintenance contract of every manifested
    store — bare parquet has no transaction log)."""
    from jurimetria_etl_spark.operators.semdedup import build_semdedup_store

    src = store_data_dir(store)
    cur = spark.read.parquet(src)
    for col in (id_col, vec_col):
        if col not in cur.columns:
            raise ValueError(
                f"recluster_semdedup_store: store at {src!r} has no "
                f"{col!r} column — not a semdedup store?"
            )
    reassigned = build_semdedup_store(
        cur.select(id_col, vec_col), new_centroids, id_col, vec_col, assign
    )
    _, total = dir_stats(src)
    n_out = max(1, math.ceil(total / target_file_bytes))
    version = uuid.uuid4().hex[:12]
    vdir = os.path.join(store, _VERSIONS, version)
    _rewrite(reassigned, vdir, n_out, ["sem_cluster"])
    src_rows = _rows_in(spark, src)
    new_rows = _rows_in(spark, vdir)
    if new_rows != src_rows:
        shutil.rmtree(vdir, ignore_errors=True)
        return {
            "skipped": True,
            "verified": False,
            "reason": f"rewrite rows {new_rows} != source rows {src_rows}",
        }
    _publish(store, version)
    return {
        "skipped": False,
        "verified": True,
        "version": version,
        "rows": new_rows,
        "n_clusters": len(new_centroids),
    }


def recluster_ann_store(
    spark: SparkSession,
    store: str,
    new_centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_file_bytes: int = 128 * 1024 * 1024,
    assign: str = "auto",
) -> dict:
    """Re-cluster a persisted IVF ANN store onto a NEW centroid set — the
    maintenance remedy ``operators/ann_store.py``'s generation contract
    promises (``_check_generation`` refuses mismatched appends and points
    here; without this, a drifted store has only manual surgery).

    Reads the current generation's ``(ivf_cell, id, vector)`` rows, folds
    replayed appends (``load_ann_store``'s ``(ivf_cell, id)`` dedup — a
    recluster is also a compaction of the replay log), re-assigns each
    vector to its nearest NEW centroid with the writer's own kernel
    (``build_ann_store``), writes the re-assigned rows AND the new
    ``_CENTROIDS.json`` into a fresh version directory partitioned by
    ``ivf_cell`` (probes keep partition-pruned cell reads), verifies
    the row count against the folded source, atomically publishes the
    manifest, then refreshes the store-root ``_CENTROIDS.json`` copy
    for legacy readers and plain-directory back-compat.

    A QUANTIZED store (``q``/``q_scale`` columns) stays quantized: the
    stored int8 codes are per-vector and independent of the cell layout,
    so re-clustering re-assigns cells from the dequantized values and
    carries the original codes through unchanged — zero re-quantization
    error.

    Geometry swaps WITH the data (r11 verdict task 5): the new
    centroids are embedded in the new version directory BEFORE the
    manifest publish, and ``resolve_ann_store`` reads a generation's
    embedded sidecar through the same manifest read that names its
    data dir — so a probe racing this swap sees either (old data, old
    centroids) or (new data, new centroids), never a mix.  The
    store-root copy refreshed after the publish is a back-compat
    fallback only.  Still run inside the maintenance window for
    WRITER coordination (an append that resolved the old generation's
    path lands in a directory the manifest no longer names — bare
    parquet has no transaction log); readers that resolved the OLD
    version keep an intact directory until ``store_prune``.

    The row SET is intentionally unchanged: what was indexed stays
    indexed; re-clustering rebalances the cells probes scan against.
    Derive the new set from the store's own vectors with
    ``similarity.train_ivf_centroids`` (e.g. ``n_clusters = rows //
    target_occupancy`` — the scaled-cells rule SCALE.md measures).
    Pattern: ``recluster_semdedup_store`` above."""
    from pyspark.sql import functions as F

    from jurimetria_etl_spark.operators.ann_store import write_ann_centroids
    from jurimetria_etl_spark.operators.semdedup import _assign_cells
    from jurimetria_etl_spark.operators.similarity import (
        dequantize_embeddings_int8,
    )

    src = store_data_dir(store)
    cur = spark.read.parquet(src)
    if "ivf_cell" not in cur.columns or id_col not in cur.columns:
        raise ValueError(
            f"recluster_ann_store: store at {src!r} has no "
            f"(ivf_cell, {id_col}) columns — not an ann store?"
        )
    quantized = "q" in cur.columns and vec_col not in cur.columns
    # Fold the replay log FIRST (the load-time dedup, made durable here):
    # the rewrite's row count is then checked against the folded count,
    # not the raw append count.
    folded = cur.dropDuplicates(["ivf_cell", id_col]).drop("ivf_cell")
    if quantized:
        work = dequantize_embeddings_int8(folded, vec_col=vec_col)
    elif vec_col not in cur.columns:
        raise ValueError(
            f"recluster_ann_store: store at {src!r} has neither "
            f"{vec_col!r} nor quantized (q, q_scale) columns"
        )
    else:
        work = folded
    # One narrow map end-to-end: assign the new cell on the same row the
    # payload lives on (no join-back), carrying the ORIGINAL int8 codes
    # through on a quantized store — re-assignment only moves rows between
    # cells, it never touches the payload.
    payload = ["q", "q_scale"] if quantized else [vec_col]
    reassigned = _assign_cells(work, new_centroids, vec_col, assign).select(
        F.col("sem_cluster").alias("ivf_cell"), id_col, *payload
    )
    _, total = dir_stats(src)
    n_out = max(1, math.ceil(total / target_file_bytes))
    version = uuid.uuid4().hex[:12]
    vdir = os.path.join(store, _VERSIONS, version)
    _rewrite(reassigned, vdir, n_out, ["ivf_cell"])
    src_rows = folded.count()
    new_rows = _rows_in(spark, vdir)
    if new_rows != src_rows:
        shutil.rmtree(vdir, ignore_errors=True)
        return {
            "skipped": True,
            "verified": False,
            "reason": f"rewrite rows {new_rows} != folded source rows {src_rows}",
        }
    # Embed the generation's geometry INSIDE its version dir BEFORE the
    # publish — the manifest swap then flips data+centroids atomically
    # for resolve_ann_store readers.
    write_ann_centroids(vdir, new_centroids, quantize=quantized)
    _publish(store, version)
    # legacy-root fallback copy, posture included
    write_ann_centroids(store, new_centroids, quantize=quantized)
    return {
        "skipped": False,
        "verified": True,
        "version": version,
        "rows": new_rows,
        "n_cells": len(new_centroids),
        "quantized": quantized,
    }


def _link_tree_except(
    src: str, dst: str, skip_top: set[str], skip_rel_dirs: set[str]
) -> None:
    """Hardlink ``src``'s data tree into ``dst``, skipping ``skip_top``
    top-level names, any ``_``/``.``-prefixed entry (manifest internals,
    sidecars, temp files — Spark's listing ignores them anyway), and any
    relative directory in ``skip_rel_dirs``.  Hardlinks make a new
    generation's untouched partitions FREE (same-filesystem inode
    shares; parquet files are immutable, and ``store_prune`` unlinking
    an old version never breaks the links).  Falls back to copy when
    the filesystem refuses the link."""
    for root, dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        rel = "" if rel == "." else rel
        if rel == "":
            dirs[:] = [
                d
                for d in dirs
                if d not in skip_top
                and not d.startswith(("_", "."))
                and d not in skip_rel_dirs
            ]
        else:
            dirs[:] = [
                d
                for d in dirs
                if not d.startswith(("_", "."))
                and os.path.join(rel, d) not in skip_rel_dirs
            ]
        for name in files:
            if name.startswith(("_", ".")):
                continue
            if rel == "" and name in skip_top:
                continue
            out_dir = os.path.join(dst, rel) if rel else dst
            os.makedirs(out_dir, exist_ok=True)
            s = os.path.join(root, name)
            d = os.path.join(out_dir, name)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def split_cell(
    spark: SparkSession,
    store: str,
    cell_id: int,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 5,
    target_file_bytes: int = 128 * 1024 * 1024,
    assign: str = "auto",
) -> dict:
    """Targeted IVF cell split: re-Lloyd ONLY the hot cell's vectors
    into ``k`` sub-cells and publish the result as a new generation —
    the bounded remedy for single-cell occupancy drift (embedding
    drift concentrating appends in one cell) that previously required
    ``recluster_ann_store``'s full-store rewrite (r13 verdict task 5).

    Cost is proportional to the HOT CELL, not the store: every other
    cell's partition is HARDLINKED into the new version directory
    (same-filesystem inode shares — no data movement), only the split
    cell's rows are read (partition-pruned scan), k-means-ed
    (``similarity.train_ivf_centroids`` on just those vectors,
    dequantized when the store is quantized), re-assigned among the k
    NEW sub-centroids, and rewritten.  The split cell's replay
    duplicates are folded while we're here (``load_ann_store``'s
    ``(ivf_cell, id)`` dedup made durable for that cell); other cells'
    files are byte-identical.

    Geometry: the new centroid set drops ``cell_id`` and appends the k
    sub-centroids under FRESH ids (max existing id + 1..k) — occupancy
    probes see the split explicitly, and no partition directory is
    ever reused across meanings.  Assignment among ONLY the k
    sub-centroids is a restricted Voronoi refinement: rows stay inside
    the old cell's region, so a probe that ranked the old cell now
    ranks its sub-cells by the same geometry (the sub-centroids live
    inside the old cell's region) — global re-optimality across ALL
    cells remains ``recluster_ann_store``'s job.  Publish order matches
    it: rows verified against the expected count, new ``_CENTROIDS``
    embedded in the version dir BEFORE the manifest swap, store-root
    copy refreshed after (legacy fallback).  Run in the maintenance
    window for writer coordination, same as every swap here."""
    from pyspark.sql import functions as F

    from jurimetria_etl_spark.operators.ann_store import (
        resolve_ann_store,
        write_ann_centroids,
    )
    from jurimetria_etl_spark.operators.semdedup import _assign_cells
    from jurimetria_etl_spark.operators.similarity import (
        dequantize_embeddings_int8,
        train_ivf_centroids,
    )

    if k < 2:
        raise ValueError(f"split_cell: k={k} — a split needs k >= 2")
    src, centroids = resolve_ann_store(store)
    by_id = dict(centroids)
    if int(cell_id) not in by_id:
        raise ValueError(
            f"split_cell: cell {cell_id} not in the store's centroid set "
            f"(cells: {sorted(by_id)})"
        )
    cur = spark.read.parquet(src)
    quantized = "q" in cur.columns and vec_col not in cur.columns
    hot_raw = cur.where(F.col("ivf_cell") == int(cell_id))
    total_raw = cur.count()
    hot_raw_n = hot_raw.count()
    folded = hot_raw.dropDuplicates(["ivf_cell", id_col]).drop("ivf_cell")
    hot_n = folded.count()
    if hot_n < k:
        raise ValueError(
            f"split_cell: cell {cell_id} holds {hot_n} distinct rows — "
            f"cannot split into k={k} sub-cells"
        )
    work = (
        dequantize_embeddings_int8(folded, vec_col=vec_col)
        if quantized
        else folded
    )
    # k-means over the hot cell only, then relabel 0..k-1 to fresh ids
    sub = train_ivf_centroids(
        work, n_cells=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    next_id = max(by_id) + 1
    sub_cents = [(next_id + i, vec) for i, (_, vec) in enumerate(sub)]
    new_centroids = sorted(
        [(cid, vec) for cid, vec in centroids if cid != int(cell_id)]
        + sub_cents
    )
    # restricted assignment: nearest of the k sub-centroids only
    payload = ["q", "q_scale"] if quantized else [vec_col]
    reassigned = _assign_cells(work, sub_cents, vec_col, assign).select(
        F.col("sem_cluster").alias("ivf_cell"), id_col, *payload
    )
    version = uuid.uuid4().hex[:12]
    vdir = os.path.join(store, _VERSIONS, version)
    os.makedirs(vdir, exist_ok=True)
    _link_tree_except(
        src,
        vdir,
        skip_top={_MANIFEST},
        skip_rel_dirs={_VERSIONS, f"ivf_cell={int(cell_id)}"},
    )
    hot_bytes = dir_stats(os.path.join(src, f"ivf_cell={int(cell_id)}"))[1]
    n_out = max(1, math.ceil(hot_bytes / target_file_bytes))
    (
        reassigned.repartition(n_out, "ivf_cell")
        .write.mode("append")
        .partitionBy("ivf_cell")
        .parquet(vdir)
    )
    expected = (total_raw - hot_raw_n) + hot_n
    new_rows = _rows_in(spark, vdir)
    if new_rows != expected:
        shutil.rmtree(vdir, ignore_errors=True)
        return {
            "skipped": True,
            "verified": False,
            "reason": (
                f"rewrite rows {new_rows} != expected {expected} "
                f"(untouched {total_raw - hot_raw_n} + folded hot {hot_n})"
            ),
        }
    _copy_sidecars(src, vdir)
    write_ann_centroids(vdir, new_centroids, quantize=quantized)
    _publish(store, version)
    # legacy-root fallback copy, posture included
    write_ann_centroids(store, new_centroids, quantize=quantized)
    return {
        "skipped": False,
        "verified": True,
        "version": version,
        "split_cell": int(cell_id),
        "new_cells": [cid for cid, _ in sub_cents],
        "rows_moved": hot_n,
        "rows": new_rows,
        "n_cells": len(new_centroids),
        "quantized": quantized,
    }


def split_semdedup_cell(
    spark: SparkSession,
    store: str,
    centroids: list[tuple[int, list[float]]],
    cell_id: int,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 5,
    target_file_bytes: int = 128 * 1024 * 1024,
    assign: str = "auto",
) -> dict:
    """``split_cell``'s SemDeDup-store sibling: re-Lloyd one hot cell's
    survivor vectors into ``k`` sub-cells under fresh ids, hardlink
    every other cell's partition into a new generation, and publish —
    the bounded remedy for a single drifted cell where
    ``recluster_semdedup_store`` would rewrite the whole store.

    The SemDeDup store has NO centroid sidecar — the caller owns the
    set (the ``semdedup_incremental`` contract) — so the current set is
    an argument and the split set comes back in the report
    (``new_centroids``): hand exactly that list to every subsequent
    ``semdedup_incremental`` / ``curate_document_stream`` call, the
    same handoff ``recluster_semdedup_store`` documents.  Semantics are
    recluster's accepted trade: the survivor SET is untouched, only
    cell membership moves, so future near-dups of a survivor are caught
    iff they assign to its (sub-)cell — on drifted-cell geometry the
    sub-centroids are strictly closer to their rows than the stale
    parent was.

    Requires the CELL-PARTITIONED layout (the r14 streaming append /
    ``recluster_semdedup_store`` rewrite); a flat store mixes cells in
    shared files, so a bounded per-cell split is impossible — compact
    with ``partition_cols=["sem_cluster"]`` once to upgrade.  Rows are
    NOT folded (the store's multiset is the recluster posture); the
    count check is exact."""
    from pyspark.sql import functions as F

    from jurimetria_etl_spark.operators.semdedup import (
        build_semdedup_store,
    )
    from jurimetria_etl_spark.operators.similarity import (
        train_ivf_centroids,
    )

    if k < 2:
        raise ValueError(f"split_semdedup_cell: k={k} — a split needs k >= 2")
    by_id = dict(centroids)
    if int(cell_id) not in by_id:
        raise ValueError(
            f"split_semdedup_cell: cell {cell_id} not in the given "
            f"centroid set (cells: {sorted(by_id)})"
        )
    src = store_data_dir(store)
    hot_dir = os.path.join(src, f"sem_cluster={int(cell_id)}")
    try:
        require_cell_partitioned(src, "sem_cluster", "split_semdedup_cell")
    except ValueError as e:
        raise ValueError(
            f"{e} — flat files mix cells, so a bounded split cannot "
            "hardlink untouched cells"
        ) from None
    if not os.path.isdir(hot_dir):
        raise ValueError(
            f"split_semdedup_cell: store at {src!r} has no "
            f"sem_cluster={int(cell_id)} partition — the cell is empty "
            "or the store is not sem_cluster-partitioned"
        )
    cur = spark.read.parquet(src)
    for col in ("sem_cluster", id_col, vec_col):
        if col not in cur.columns:
            raise ValueError(
                f"split_semdedup_cell: store at {src!r} has no {col!r} "
                "column — not a semdedup store?"
            )
    total_raw = cur.count()
    hot = cur.where(F.col("sem_cluster") == int(cell_id)).drop(
        "sem_cluster"
    )
    hot_n = hot.count()
    if hot_n < k:
        raise ValueError(
            f"split_semdedup_cell: cell {cell_id} holds {hot_n} rows — "
            f"cannot split into k={k} sub-cells"
        )
    sub = train_ivf_centroids(
        hot, n_cells=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    next_id = max(by_id) + 1
    sub_cents = [(next_id + i, vec) for i, (_, vec) in enumerate(sub)]
    new_centroids = sorted(
        [(cid, vec) for cid, vec in centroids if cid != int(cell_id)]
        + sub_cents
    )
    reassigned = build_semdedup_store(
        hot, sub_cents, id_col, vec_col, assign
    )
    version = uuid.uuid4().hex[:12]
    vdir = os.path.join(store, _VERSIONS, version)
    os.makedirs(vdir, exist_ok=True)
    _link_tree_except(
        src,
        vdir,
        skip_top={_MANIFEST},
        skip_rel_dirs={_VERSIONS, f"sem_cluster={int(cell_id)}"},
    )
    hot_bytes = dir_stats(hot_dir)[1]
    n_out = max(1, math.ceil(hot_bytes / target_file_bytes))
    (
        reassigned.repartition(n_out, "sem_cluster")
        .write.mode("append")
        .partitionBy("sem_cluster")
        .parquet(vdir)
    )
    new_rows = _rows_in(spark, vdir)
    if new_rows != total_raw:
        shutil.rmtree(vdir, ignore_errors=True)
        return {
            "skipped": True,
            "verified": False,
            "reason": f"rewrite rows {new_rows} != source rows {total_raw}",
        }
    _copy_sidecars(src, vdir)
    _publish(store, version)
    return {
        "skipped": False,
        "verified": True,
        "version": version,
        "split_cell": int(cell_id),
        "new_cells": [cid for cid, _ in sub_cents],
        "rows_moved": hot_n,
        "rows": new_rows,
        "n_clusters": len(new_centroids),
        "new_centroids": new_centroids,
    }


def _select_hot_cells(
    occ: dict[int, int],
    occupancy_factor: float,
    k: int,
    max_splits: int,
) -> tuple[int, list[tuple[int, int]]]:
    """The shared occupancy-drift rule for both store-maintenance passes
    (``maintain_ann_store`` / ``maintain_semdedup_store``): a cell is
    hot when it holds more than ``occupancy_factor`` × the LOWER-median
    cell's rows — with few cells the upper median is dragged up by the
    hot cell itself (a 2-cell store could never flag), and at many cells
    the two are indistinguishable, so bias toward detection — and big
    enough to split (≥ ``2*k`` rows).  Hottest first, at most
    ``max_splits`` per pass.  Returns (median, [(cell_id, n_rows)])."""
    counts = sorted(occ.values())
    median = counts[(len(counts) - 1) // 2] if counts else 0
    hot = sorted(
        (
            (cid, n)
            for cid, n in occ.items()
            if median > 0 and n > occupancy_factor * median and n >= 2 * k
        ),
        key=lambda cn: (-cn[1], cn[0]),
    )[:max_splits]
    return median, hot


def maintain_ann_store(
    spark: SparkSession,
    store: str,
    occupancy_factor: float = 4.0,
    max_splits: int = 4,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    prune_previous: bool = True,
) -> dict:
    """One maintenance-window pass for a persisted IVF ANN store —
    ``maintain_stores``'s posture specialized to the cell layout:
    prune the generations the previous pass left, compact WITH
    ``partition_cols=["ivf_cell"]`` (the generic entry point's
    unpartitioned rewrite would destroy the probe-pruning layout), then
    apply the occupancy-drift policy: any cell holding more than
    ``occupancy_factor`` × the median cell's distinct rows (and big
    enough to split) is ``split_cell``-ed into ``k`` sub-cells, hottest
    first, at most ``max_splits`` per pass.  Each split is its own
    verified atomic generation publish, so a crash between splits
    leaves a fully consistent store; a pass on a balanced store splits
    nothing (idempotent-cheap, schedulable blindly — the
    ``compact_parquet`` rule).  Geometry-WIDE drift (every cell's
    centroid stale) is still ``recluster_ann_store``'s job; this pass
    handles the localized form — embedding drift concentrating appends
    in one region — at hot-cell cost (measured exponent 0.00 vs the
    full recluster's 0.49, SCALE.md r14).

    Returns {pruned, compaction, occupancy_median, splits: [per-split
    reports]}."""
    from jurimetria_etl_spark.operators.ann_store import (
        ann_store_occupancy,
    )

    pruned = store_prune(store) if prune_previous else []
    compaction = compact_store(
        spark,
        store,
        target_file_bytes=target_file_bytes,
        min_files_to_compact=min_files_to_compact,
        partition_cols=["ivf_cell"],
    )
    occ = {
        int(r["ivf_cell"]): int(r["n_rows"])
        for r in ann_store_occupancy(spark, store, id_col=id_col).collect()
    }
    median, hot = _select_hot_cells(occ, occupancy_factor, k, max_splits)
    splits = [
        split_cell(
            spark,
            store,
            cid,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            target_file_bytes=target_file_bytes,
        )
        for cid, _ in hot
    ]
    return {
        "pruned": len(pruned),
        "compaction": compaction,
        "occupancy_median": median,
        "n_cells": len(occ),
        "splits": splits,
    }


def maintain_semdedup_store(
    spark: SparkSession,
    store: str,
    centroids: list[tuple[int, list[float]]],
    occupancy_factor: float = 4.0,
    max_splits: int = 4,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    prune_previous: bool = True,
    assign: str = "auto",
) -> dict:
    """``maintain_ann_store``'s SemDeDup sibling (r14 verdict task 7):
    one maintenance-window pass — prune the previous pass's
    generations, compact WITH ``partition_cols=["sem_cluster"]`` (a
    legacy FLAT store is upgraded here, single-file or not), then apply
    the same occupancy policy: any cell holding more than
    ``occupancy_factor`` × the lower-median cell's rows (and ≥ ``2*k``
    rows) is ``split_semdedup_cell``-ed, hottest first, at most
    ``max_splits`` per pass, each split its own verified atomic
    generation.  A balanced store splits nothing — idempotent-cheap,
    schedulable blindly.

    The one structural difference from the ANN pass: the SemDeDup store
    has no centroid sidecar — the set is CALLER-OWNED (the
    ``semdedup_incremental`` contract) — so the current set is an
    argument, successive splits chain through each report's
    ``new_centroids``, and the final set comes back under
    ``new_centroids``: hand exactly that list to every subsequent
    ``semdedup_incremental`` / ``curate_document_stream`` call (the
    ``recluster_semdedup_store`` handoff).  Occupancy counts the row
    MULTISET per cell (this store is not replay-folded — the recluster
    posture), one partition-parallel count keyed on the partition
    column.

    Returns {pruned, compaction, occupancy_median, n_cells,
    splits: [per-split reports], new_centroids}."""
    from pyspark.sql import functions as F

    pruned = store_prune(store) if prune_previous else []
    min_files = min_files_to_compact
    if _infer_partition_cols(store_data_dir(store)) is None:
        # flat legacy layout: the compaction's purpose is the upgrade,
        # not the file count — never skip it (maintain_stores posture)
        min_files = 1
    compaction = compact_store(
        spark,
        store,
        target_file_bytes=target_file_bytes,
        min_files_to_compact=min_files,
        partition_cols=["sem_cluster"],
    )
    cents = [(int(c), [float(x) for x in v]) for c, v in centroids]
    src = store_data_dir(store)
    if dir_stats(src)[0] == 0:
        return {
            "pruned": len(pruned),
            "compaction": compaction,
            "occupancy_median": 0,
            "n_cells": 0,
            "splits": [],
            "new_centroids": cents,
        }
    if _infer_partition_cols(src) is None:
        # the upgrade compaction did not land (e.g. its row-count
        # verification failed against a racing append) — the store is
        # still flat and split_semdedup_cell would raise out of this
        # "schedulable blindly" pass; report and let the next window
        # retry instead
        return {
            "pruned": len(pruned),
            "compaction": compaction,
            "occupancy_median": 0,
            "n_cells": 0,
            "splits": [],
            "splits_skipped_reason": (
                "store is not sem_cluster-partitioned (upgrade "
                "compaction skipped or failed verification)"
            ),
            "new_centroids": cents,
        }
    occ = {
        int(r["sem_cluster"]): int(r["n"])
        for r in spark.read.parquet(src)
        .groupBy("sem_cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    median, hot = _select_hot_cells(occ, occupancy_factor, k, max_splits)
    splits: list[dict] = []
    for cid, _n in hot:
        rep = split_semdedup_cell(
            spark,
            store,
            cents,
            cid,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            target_file_bytes=target_file_bytes,
            assign=assign,
        )
        splits.append(rep)
        if rep.get("verified"):
            # chain: the next split runs under the published geometry
            cents = rep["new_centroids"]
    return {
        "pruned": len(pruned),
        "compaction": compaction,
        "occupancy_median": median,
        "n_cells": len(occ),
        "splits": splits,
        "new_centroids": cents,
    }


def store_prune(store: str) -> list[str]:
    """Delete every non-current generation: old version directories and —
    once a manifest exists — the legacy root files a plain-dir upgrade
    left behind, INCLUDING hive-style ``col=value`` root subdirectories
    (once a manifest exists those are by construction a pre-compaction
    generation, and leaving them would both leak disk unboundedly and
    keep legacy-path readers on stale data forever).  ONLY hive-style
    names are reclaimed: a co-located directory that is not a ``k=v``
    partition dir (manual exports, notes, foreign data) is never a
    legacy generation and is left untouched.  Call AFTER the reader
    grace period; the current version, the manifest, and everything
    ``_``-prefixed are never touched.  Returns removed paths."""
    mf = _manifest_file(store)
    if not os.path.exists(mf):
        return []
    current = store_data_dir(store)
    removed: list[str] = []
    vroot = os.path.join(store, _VERSIONS)
    if os.path.isdir(vroot):
        for name in os.listdir(vroot):
            full = os.path.join(vroot, name)
            if os.path.abspath(full) != os.path.abspath(current):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
    for name in os.listdir(store):
        full = os.path.join(store, name)
        if name.startswith("_"):
            continue  # manifest, _versions, _SUCCESS-style markers
        if os.path.isdir(full):
            # Reclaim ONLY hive-style `k=v` dirs — the pre-manifest
            # partition layout.  Anything else co-located in the store
            # root is foreign data, not a legacy generation.
            if re.fullmatch(r"[^=]+=.*", name):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        elif name.endswith(".parquet") or name.endswith(".crc"):
            os.remove(full)
            removed.append(full)
    return removed
