"""The driver-hash bisection aid (tools/check_correctness.py) must isolate a
canonicalization drift to the exact column — r13 burned a round on x43's
DuckDB HUGEINT sums hashing differently in the external driver's
canonicalizer while the local replica (Python-int path) matched.

These tests exercise the helpers directly with a synthetic HUGEINT query:
DuckDB's ``sum(BIGINT)`` promotes to HUGEINT, and the per-column report must
(a) flag that column as a suspect type and (b) when a side canonicalizes it
differently, name it in ``col_mismatches`` while leaving the clean columns
alone."""

import importlib.util
import pathlib

import duckdb
import pytest

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "check_correctness.py",
)
cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cc)


@pytest.fixture(scope="module")
def hugeint_rel():
    con = duckdb.connect()  # kept alive via the yield below (GC closes it)
    # sum over BIGINT promotes to HUGEINT; k stays VARCHAR, n stays BIGINT
    yield con.sql(
        "SELECT k, count(*) AS n, sum(v) AS total FROM ("
        "  SELECT 'a' AS k, CAST(1 AS BIGINT) AS v UNION ALL"
        "  SELECT 'a', 2 UNION ALL SELECT 'b', 5) GROUP BY k ORDER BY k"
    )
    con.close()


def test_suspect_types_flags_the_hugeint_column(hugeint_rel):
    dtypes = {c: str(t) for c, t in zip(hugeint_rel.columns, hugeint_rel.types)}
    assert "HUGEINT" in dtypes["total"].upper()
    rows = hugeint_rel.fetchall()
    # spark side: same values as plain ints (what a BIGINT schema collects to)
    scols, srows = ["k", "n", "total"], [("a", 2, 3), ("b", 1, 5)]
    stypes = {"k": "string", "n": "bigint", "total": "bigint"}
    rec = cc.bisect_entry(
        scols, srows, stypes, hugeint_rel.columns, rows, dtypes
    )
    assert rec["suspect_types"] == ["total"]
    # values are identical under THIS replica's canonicalizer (int path), so
    # no column mismatch locally — exactly the x43 shape
    assert rec["col_mismatches"] == []


def test_col_mismatch_names_only_the_drifting_column():
    scols = ["k", "n", "total"]
    srows = [("a", 2, 3), ("b", 1, 5)]
    stypes = {"k": "string", "n": "bigint", "total": "bigint"}
    # oracle side canonicalizes the promoted column differently (simulating
    # a driver hashing int128 via a distinct repr)
    drows = [("a", 2, "hugeint:3"), ("b", 1, "hugeint:5")]
    dtypes = {"k": "VARCHAR", "n": "BIGINT", "total": "HUGEINT"}
    rec = cc.bisect_entry(scols, srows, stypes, scols, drows, dtypes)
    assert rec["col_mismatches"] == ["total"]
    assert rec["spark"]["k"]["hash"] == rec["oracle"]["k"]["hash"]
    assert rec["spark"]["n"]["hash"] == rec["oracle"]["n"]["hash"]
    assert rec["spark"]["total"]["hash"] != rec["oracle"]["total"]["hash"]
    assert rec["oracle"]["total"]["engine_type"] == "HUGEINT"


def test_column_hash_is_row_order_insensitive():
    a = cc.column_report(["x"], [(1,), (2,), (3,)], {"x": "bigint"})
    b = cc.column_report(["x"], [(3,), (1,), (2,)], {"x": "bigint"})
    assert a["x"]["hash"] == b["x"]["hash"]
