"""SparkSession factory with scale-aware defaults.

Design notes (SURVEY.md §4, §7):
- Session timezone pinned to UTC: timestamps are stored as UTC instants and
  America/Sao_Paulo is applied only at derivation points via
  ``from_utc_timestamp`` (reference carries per-value tz —
  ``/root/reference/src/jurimetria_pipeline.py:51-58``).
- AQE on: runtime skew-join handling + dynamic coalescing of shuffle
  partitions, which is what makes one config serve sf0.001 tests and a
  1000-executor 100 TB run.
- ``spark.sql.shuffle.partitions`` defaults to the local core count (the
  driver harness runs local[N]); on a real cluster this is overridden by AQE's
  coalescing with ``initialPartitionNum`` headroom.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "jurimetria-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Local test/bench mode: ``local[$SPARK_GRAFT_CPUS]``.  On a cluster, pass
    ``master=None`` with an externally-submitted application; only the SQL
    confs below matter there.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # AQE coalescing only shrinks partitions — the pinned shuffle
        # count above would otherwise CAP every cluster shuffle at the
        # local core count (multi-TB partitions at 100 TB).  A high
        # initialPartitionNum gives AQE real headroom: shuffles START
        # wide and coalesce down to the data, locally and on a cluster.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "2048"),
        )
        # Let AQE optimize (and in particular COALESCE) the plans that
        # materialize persisted/cached frames (r16).  Spark defaults this
        # off so a cache's output partitioning stays predictable for
        # downstream exchange reuse, but with the wide
        # initialPartitionNum above that default makes every
        # persist()-backed frame in the span/dedup/similarity operators
        # execute its shuffles at the FULL initial width — measured:
        # x28's candidate-id cache materialized through 2048-task
        # stages on kilobytes of data, uncoalesced, at every scale.
        # None of this repo's caches rely on cached output partitioning
        # (each is consumed through joins/aggregations that plan their
        # own exchanges), so the coalesce is pure win.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # Arrow for the (few) pandas_udf paths — vectorized transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Nested-schema pruning so struct projections reach the parquet scan.
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Split-size floor when files are small: the default 4 MB open-cost
        # floors a 10 MB table at ~3 splits, serializing CPU-dense aggs on
        # 3 of 32 cores.  512 KB biases small tables toward full-width
        # parallelism; big files are still governed by maxPartitionBytes
        # (128 MB), so the 100 TB scan plan is unchanged.
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # Python Data Source filter pushdown (the datajud source prunes
        # tribunal partitions from pushed filters).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Driver fixtures carry TIMESTAMP(NANOS) parquet columns; read them
        # as epoch-nanos longs (normalized in sources/fixtures.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    if master is not None:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
