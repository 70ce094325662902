"""Source adapters (SURVEY §2.1).

Live adapters (DataJud REST, e-SAJ HTML) are pure-Python page protocols with
injectable transports — the network boundary stays outside the Spark plan;
fetched pages land in DataFrames via explicit schemas.  Offline/test paths
read JSON/Parquet fixtures with the same schemas.
"""

from jurimetria_etl_spark.sources.datajud import (  # noqa: F401
    DataJudSource,
    build_base_url,
    build_query,
)
from jurimetria_etl_spark.sources.municipios import load_municipios  # noqa: F401
from jurimetria_etl_spark.sources.fixtures import load_fixture, register_fixture_views  # noqa: F401
