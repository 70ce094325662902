"""Raw-JSON landing ingest: the at-scale DataJud path.

The REST adapter (sources/datajud.py) is inherently serial per tribunal;
at sustained volume the right architecture (SCALE.md §Ingest) lands each
fetched page as JSON-lines on object storage — partitioned by tribunal —
and the ENGINE reads files.  These readers are that second half: the
same HIT_SCHEMA rows and the same ``flatten_hits`` projection as the
live adapter, so the analytic plan is byte-identical whichever ingest
ran (pinned in tests/test_landing.py).

Cited vs reference: the reference only ever parses in-process API
responses (`/root/reference/src/jurimetria_pipeline.py:163-179`); the
landing layout is the scale re-expression, not a ported feature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.flatten import flatten_hits
from jurimetria_etl_spark.schemas import HIT_SCHEMA


def read_hits_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Raw hit rows from a JSON-lines landing tree.  The explicit
    HIT_SCHEMA skips inference (one full pre-scan of 100 TB otherwise)
    and pins the nested struct shape; malformed lines surface as
    all-NULL rows under the default PERMISSIVE mode — the same
    tolerance the live adapter's guards give."""
    return spark.read.schema(HIT_SCHEMA).json(path)


def read_processos_landing(
    spark: SparkSession,
    path: str,
    tribunal: str | Column | None = None,
) -> DataFrame:
    """Flattened analytic table (PROCESSO_SCHEMA) straight from a landing
    tree.  ``tribunal=None`` expects a hive-partitioned layout
    (``.../tribunal=TJCE/*.json``) and takes the value from the partition
    directory — pure file-listing metadata, which also makes
    per-tribunal queries partition-pruned at the source."""
    if tribunal is None:
        hits = spark.read.schema(HIT_SCHEMA).option("basePath", path).json(
            f"{path}/tribunal=*"
        )
        return flatten_hits(hits, F.col("tribunal"))
    return flatten_hits(read_hits_jsonl(spark, path), tribunal)


def land_hits(hits_with_tribunal: DataFrame, out_dir: str) -> None:
    """The WRITE half of the landing loop: persist a
    ``DataJudSource.parallel_scan`` frame — (tribunal, hit-struct) rows —
    as tribunal-partitioned JSON-lines that ``read_processos_landing``
    reads back byte-compatibly.  Append mode: each scheduled pull lands
    its pages next to earlier ones; executors write their own partitions
    (no driver collect), and the partitionBy dirs are exactly the
    pruning layout the readers exploit.  Compact with
    ``sinks.maintenance`` once a landing zone accumulates small files."""
    (
        hits_with_tribunal.select("tribunal", "hit.*")
        .write.mode("append")
        .partitionBy("tribunal")
        .json(out_dir)
    )
