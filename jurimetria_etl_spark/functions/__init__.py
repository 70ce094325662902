"""Scalar-function layer: thin, named wrappers over Spark built-ins for every
scalar semantic in SURVEY.md §2.4 (F1–F10).  All JVM-side Catalyst
expressions — zero Python UDFs on the reference-parity path (SURVEY §2.11).
"""

from jurimetria_etl_spark.functions.temporal import (  # noqa: F401
    SP_TZ,
    hour_in_sp,
    iso_render_sp,
    lenient_ts,
    local_date_bound_to_utc,
    reformat_br_date,
    utc_to_sp,
)
