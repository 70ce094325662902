"""tools/gen_testdata determinism + schema compatibility: the scale bench's
apples-to-apples premise is that two runs of the generator at the same
(sf, seed) produce byte-identical tables, and that generated tables load
through the same fixture path as the driver's."""

from __future__ import annotations

import hashlib
from pathlib import Path

import duckdb

from tools.gen_testdata import generate


def _tree_hash(path: str) -> dict[str, str]:
    out = {}
    for f in sorted(Path(path).glob("*.parquet")):
        out[f.name] = hashlib.md5(f.read_bytes()).hexdigest()
    return out


def test_same_seed_same_bytes(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(0.002, a, seed=42)
    generate(0.002, b, seed=42)
    ha, hb = _tree_hash(a), _tree_hash(b)
    assert ha == hb and len(ha) == 10
    c = str(tmp_path / "c")
    generate(0.002, c, seed=43)
    assert _tree_hash(c) != ha  # the seed actually matters


def test_schema_matches_driver_fixture(tmp_path):
    out = str(tmp_path / "gen")
    generate(0.002, out, seed=42)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        gen = con.execute(
            f"DESCRIBE SELECT * FROM '{out}/{t}.parquet'"
        ).fetchall()
        ref = con.execute(
            f"DESCRIBE SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        ).fetchall()
        gen_cols = [(c[0], c[1].replace("TIMESTAMP_NS", "TIMESTAMP")) for c in gen]
        ref_cols = [(c[0], c[1].replace("TIMESTAMP_NS", "TIMESTAMP")) for c in ref]
        assert gen_cols == ref_cols, f"{t}: {gen_cols} != {ref_cols}"