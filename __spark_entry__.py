"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's one real analytic
— the hour-of-day histogram, A1/Q08 shape — over the sf0.001 events table).
``queries()``/``oracle_sql()`` expose the correctness corpus from
``jurimetria_etl_spark.plans.corpus`` (FIXTURES.md §C): every implemented
operator from SURVEY.md §2 has an entry; SQL-expressible ones also carry a
DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jurimetria_etl_spark.plans.corpus import oracle_sql_map, query_map

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from jurimetria_etl_spark.plans.corpus import q19_hour_sp

    return q19_hour_sp(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / FIXTURES.md §C."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return oracle_sql_map()
