"""Driver fixture tables (/root/testdata/sf*/, FIXTURES.md §B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jurimetria_etl_spark.schemas import FIXTURE_TABLES

# DataFrame memo per (application, dir, table): building a fresh reader
# costs ~0.3s of driver RPC + footer/schema inference PER CALL, and every
# corpus query loads 1-5 tables — measured as the bulk of the per-query
# "scheduling floor" in the warm bench.  DataFrames are immutable plan
# objects, so handing the same one to every caller is safe; the file
# listing is pinned at first read (same as any reused DataFrame), which
# is exactly right for the read-only fixture dirs this loader serves.
_FIXTURE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_fixture(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one fixture table.

    The driver writes ``events.ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    (set in session.py) it surfaces as a long of epoch-nanos — normalized
    here to a proper TimestampType via exact integer division (micros
    truncation, matching DuckDB's nanos→micros read).
    """
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), table)
    hit = _FIXTURE_MEMO.get(key)
    if hit is not None:
        return hit
    try:  # runtime-settable SQL conf; the driver's session may not have it
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _FIXTURE_MEMO[key] = df
    return df


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql paths."""
    for t in FIXTURE_TABLES:
        load_fixture(spark, sf_dir, t).createOrReplaceTempView(t)
