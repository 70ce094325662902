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
