"""Basic statistics (SURVEY §2.7 A3).

The reference's "Exibe estatísticas básicas" step
(``/root/reference/README.md:11``) is, in code, the collection-total print
(``/root/reference/src/jurimetria_pipeline.py:362``).  The rebuilt surface
generalizes it to Spark's ``summary()`` — count / mean / stddev / min /
quartiles / max per column — plus the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def basic_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A3 — per-column summary statistics.

    ``summary()`` computes count, mean, stddev, min, 25%/50%/75%
    (approximate percentiles — one pass, sketch-based, the right choice at
    100 TB) and max for every numeric/string column.  ``cols`` restricts
    the summarized columns (and prunes the scan accordingly).
    """
    target = df.select(*cols) if cols else df
    return target.summary()


def row_count(df: DataFrame) -> int:
    """A2 — the reference's collection total (``:362``)."""
    return df.count()


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct_rsd: float = 0.05,
) -> DataFrame:
    """One-pass data-quality profile: per column null rate, approximate
    distinct count (HLL, so the pass stays sketch-sized), and min/max —
    one row per column, long format.

    A 100 TB profiling job is ONE scan with partial aggregation; the
    anti-pattern is per-column queries (N scans) or exact distinct counts
    (N wide shuffles).  Values are rendered as strings so heterogeneous
    column types share one output schema.
    """
    from pyspark.sql import functions as F

    from pyspark.sql.types import MapType

    names = cols or df.columns
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for c in names:
        aggs += [
            # coalesce completes the empty-frame guard: sum() over zero
            # rows is NULL, and null_rate must read 0.0, not NULL
            F.coalesce(
                F.sum(F.col(c).isNull().cast("bigint")), F.lit(0)
            ).alias(f"__null_{c}"),
            F.approx_count_distinct(c, rsd=distinct_rsd).alias(f"__dist_{c}"),
        ]
        if isinstance(df.schema[c].dataType, MapType):
            # maps have no ordering — min/max would be an AnalysisException
            aggs += [
                F.lit(None).cast("string").alias(f"__min_{c}"),
                F.lit(None).cast("string").alias(f"__max_{c}"),
            ]
        else:
            # aggregate on the NATIVE type, render as string afterwards —
            # min(cast-to-string) would give lexicographic (wrong) extrema
            # for numeric/timestamp columns
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                (
                    F.col(f"__null_{c}") / F.greatest(F.col("__n"), F.lit(1))
                ).alias("null_rate"),
                F.col(f"__dist_{c}").alias("approx_distinct"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
            for c in names
        ]
    )
    return one.select(F.explode(rows).alias("p")).select(
        "p.column", "p.null_rate", "p.approx_distinct", "p.min_str", "p.max_str"
    )
