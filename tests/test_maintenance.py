"""compact_parquet: file count drops to the byte-sized target, the row
multiset is untouched, hive layouts keep their directories and pruning,
and the op is a cheap no-op on already-compact dirs."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from jurimetria_etl_spark.sinks.maintenance import compact_parquet, dir_stats


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_compacts_fragmented_dir_same_rows(spark, tmp_path):
    out = str(tmp_path / "frag")
    # simulate 30 micro-batch appends -> 30+ tiny files
    for i in range(30):
        spark.range(i * 100, (i + 1) * 100).withColumn(
            "v", F.col("id") * 2
        ).coalesce(1).write.mode("append").parquet(out)
    before_rows = _multiset(spark.read.parquet(out))
    files_before, total = dir_stats(out)
    assert files_before >= 30

    report = compact_parquet(spark, out, target_file_bytes=total)
    assert report["skipped"] is False
    assert report["files_after"] < files_before
    assert report["files_after"] <= 4  # ~1 target-size file (+ task rounding)
    assert _multiset(spark.read.parquet(out)) == before_rows


def test_partitioned_compaction_preserves_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "hive")
    for i in range(10):
        spark.range(i * 50, (i + 1) * 50).withColumn(
            "part", (F.col("id") % 3).cast("int")
        ).coalesce(1).write.mode("append").partitionBy("part").parquet(out)
    before_rows = _multiset(spark.read.parquet(out))
    files_before, total = dir_stats(out)

    report = compact_parquet(
        spark, out, target_file_bytes=total, partition_cols=["part"]
    )
    assert report["files_after"] < files_before
    # hive dirs preserved
    assert {p.name for p in Path(out).iterdir() if p.is_dir()} == {
        "part=0", "part=1", "part=2"
    }
    after = spark.read.parquet(out)
    assert _multiset(after) == before_rows
    # partition pruning still effective: a part filter reads 1 directory
    plan = (
        after.where(F.col("part") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(part" in plan


def test_noop_below_threshold(spark, tmp_path):
    out = str(tmp_path / "small")
    spark.range(100).coalesce(1).write.parquet(out)
    report = compact_parquet(spark, out)
    assert report["skipped"] is True
    assert report["files_before"] == report["files_after"] == 1