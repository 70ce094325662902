"""Join operators (SURVEY §2.6).

J1 is the reference's only join: a dict-lookup enrichment
(``/root/reference/src/jurimetria_pipeline.py:201-206,236-237``) whose
distributed form is a broadcast hash join — the 5 570-row dimension ships to
every executor once, the 100 TB fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_municipio(
    processos: DataFrame,
    municipios: DataFrame,
    code_col: str = "municipio",
) -> DataFrame:
    """J1 — replace the IBGE municipality code with its name; unmatched or
    NULL codes keep the original value (the reference's
    ``municipios_map.get(int(x), x)`` fallback at ``:237``).

    Plan shape: BroadcastHashJoin (LeftOuter) + coalesce projection — no
    shuffle of the fact side; asserted in tests per SURVEY §4.
    """
    dim = F.broadcast(
        municipios.select(
            F.col("CD_MUN").cast("int").alias("__cd_mun"),
            F.col("NM_MUN").alias("__nm_mun"),
        ).na.drop(subset=["__cd_mun"])  # W4: drop NULL-key dim rows
    )
    joined = processos.join(
        dim,
        processos[code_col].cast("int") == dim["__cd_mun"],
        "left",
    )
    return joined.withColumn(
        code_col, F.coalesce(F.col("__nm_mun"), F.col(code_col))
    ).drop("__cd_mun", "__nm_mun")
