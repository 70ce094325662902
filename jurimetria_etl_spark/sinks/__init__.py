"""Sinks — SURVEY §2.2 K1–K5."""

from jurimetria_etl_spark.sinks.writers import (  # noqa: F401
    persist,
    plot_horario,
    write_csv,
    write_parquet,
)
