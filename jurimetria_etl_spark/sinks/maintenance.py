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
the swap can see a missing directory.  That is inherent to bare
parquet-on-filesystem; run compaction in the maintenance window the same
way the incremental dedup stores are rebuilt, or adopt a transactional
table format when concurrent readers matter.  Correctness (row multiset
identical, partition layout preserved, pruning still effective) is
value-tested in tests/test_maintenance.py.
"""

from __future__ import annotations

import math
import os
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
    if partition_cols:
        (
            df.repartition(n_out, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
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
    }
