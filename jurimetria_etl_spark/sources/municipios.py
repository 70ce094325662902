"""Municipality dimension source — SURVEY §2.1 S5.

The reference reads an IBGE Excel workbook with pandas
(``/root/reference/src/jurimetria_pipeline.py:202-203``).  PySpark has no
Excel reader; at 5 570 rows a driver-side pandas read →
``createDataFrame`` is correct at any scale (the dim is broadcast anyway).
The adapter also accepts Parquet/CSV so fixtures can substitute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jurimetria_etl_spark.schemas import MUNICIPIOS_SCHEMA


def _last_wins_per_code(df: DataFrame) -> DataFrame:
    """One row per CD_MUN, keeping the LAST in file order — the
    reference's dict-build semantics (``municipios_map[cd] = nm`` in row
    order, :202-237).  ``monotonically_increasing_id`` is
    (partition, offset)-ordered and splits follow file offsets, so its
    max per code IS the last file row; at 5 570 rows the window is one
    tiny exchange on an already-driver-bounded dim."""
    w = Window.partitionBy("CD_MUN").orderBy(F.col("__ord").desc())
    return (
        df.withColumn("__ord", F.monotonically_increasing_id())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__ord", "__rn")
    )


def load_municipios(spark: SparkSession, path: str) -> DataFrame:
    """Load the municipios dimension from .xls/.xlsx (driver-side pandas),
    .parquet, or .csv; drop NULL-key rows (W4, reference ``:203``).
    Every path dedups duplicate codes LAST-wins in file order — the
    reference's dict-build rule — so a malformed dim resolves to the
    same name regardless of which adapter loaded it (r8 ADVICE: the
    CSV path previously left dupes for the join's max-name guard,
    which could pick a different name than the reference)."""
    if path.endswith((".xls", ".xlsx")):
        import pandas as pd

        pdf = pd.read_excel(path)
        pdf = pdf.dropna(subset=["CD_MUN"])
        pdf["CD_MUN"] = pdf["CD_MUN"].astype(int)
        pdf["CD_UF"] = pdf["CD_UF"].astype(int)
        # Mirror the reference's dict build (last assignment wins per
        # code, :202-237): a duplicated CD_MUN in the workbook must not
        # fan out fact rows through the later left join.
        pdf = pdf.drop_duplicates(subset=["CD_MUN"], keep="last")
        df = spark.createDataFrame(pdf[[f.name for f in MUNICIPIOS_SCHEMA]], MUNICIPIOS_SCHEMA)
        return df.na.drop(subset=["CD_MUN"]).withColumn(
            "CD_MUN", F.col("CD_MUN").cast("int")
        )
    if path.endswith(".csv"):
        df = spark.read.option("header", True).schema(MUNICIPIOS_SCHEMA).csv(path)
    else:
        df = spark.read.parquet(path)
    df = df.na.drop(subset=["CD_MUN"]).withColumn(
        "CD_MUN", F.col("CD_MUN").cast("int")
    )
    return _last_wins_per_code(df)
