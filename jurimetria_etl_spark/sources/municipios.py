"""Municipality dimension source — SURVEY §2.1 S5.

The reference reads an IBGE Excel workbook with pandas
(``/root/reference/src/jurimetria_pipeline.py:202-203``).  PySpark has no
Excel reader; at 5 570 rows a driver-side pandas read →
``createDataFrame`` is correct at any scale (the dim is broadcast anyway).
The adapter also accepts Parquet/CSV so fixtures can substitute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jurimetria_etl_spark.schemas import MUNICIPIOS_SCHEMA


def load_municipios(spark: SparkSession, path: str) -> DataFrame:
    """Load the municipios dimension from .xls/.xlsx (driver-side pandas),
    .parquet, or .csv; drop NULL-key rows (W4, reference ``:203``)."""
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
    elif path.endswith(".csv"):
        df = spark.read.option("header", True).schema(MUNICIPIOS_SCHEMA).csv(path)
    else:
        df = spark.read.parquet(path)
    return df.na.drop(subset=["CD_MUN"]).withColumn("CD_MUN", F.col("CD_MUN").cast("int"))
