"""jurimetria_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``willianbox3/jurimetria-etl`` reference
pipeline, re-expressed Spark-first (DataFrame/SQL + Catalyst), generalized into
a reusable operator library and extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Reference semantics are documented in SURVEY.md with file:line citations into
``/root/reference``.  No code is copied from the reference; it is a pandas
single-process pipeline while this package is a distributed Spark engine.
"""

__version__ = "0.1.0"

from jurimetria_etl_spark.session import get_spark  # noqa: F401
