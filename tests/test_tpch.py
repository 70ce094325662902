"""TPC-H composite showcase queries: non-degenerate results + intended
physical plans at fixture scale."""

from __future__ import annotations

import duckdb

from jurimetria_etl_spark.plans.tpch import TPCH

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_all_tpch_queries_return_rows(spark):
    for name, q in TPCH.items():
        assert q.spark(spark, SF).count() > 0, f"{name} degenerate (0 rows)"


def test_q3_topk_and_broadcast(spark):
    plan = _physical(TPCH["t02_shipping_priority"].spark(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q5_all_dims_broadcast(spark):
    # six-table join: only the orders⨝lineitem spine may shuffle
    plan = _physical(TPCH["t03_local_supplier_volume"].spark(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_documents_are_ascii():
    # The x16_frame_sample oracle slices text chars then encodes; that is
    # byte-exact ONLY for ASCII corpora — pin the fixture property it
    # depends on so a fixture change fails loudly here, not as a hash diff.
    for sf in ("sf0.001", "sf0.01"):
        n = duckdb.sql(
            f"SELECT count(*) FROM '/root/testdata/{sf}/documents.parquet' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0
