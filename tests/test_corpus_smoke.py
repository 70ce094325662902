"""Smoke: every corpus query runs at sf0.001 and returns a stable schema.
(The full DuckDB-oracle comparison runs via tools/check_correctness.py and
the driver's t2 gate at sf0.01.)"""

from __future__ import annotations

import pytest

from jurimetria_etl_spark.plans.corpus import CORPUS

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_corpus_query_runs(spark, name):
    df = CORPUS[name].spark(spark, SF)
    rows = df.collect()
    assert df.columns  # non-empty schema
    assert rows is not None


def test_entry_contract(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
