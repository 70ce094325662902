"""Hard-negative mining (operators/similarity.py:mine_hard_negatives):
contract properties on planted geometry — every returned negative has a
different label, the planted cross-label near-duplicate ranks first,
ranks are dense per anchor, similarities are exact cosines, and
NULL-label rows produce nothing."""

from __future__ import annotations

import math

import numpy as np
import pytest

from jurimetria_etl_spark.operators.similarity import mine_hard_negatives

DIM = 8
RNG = np.random.default_rng(7)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lbl) for i, v, lbl in rows],
        "vec_id bigint, embedding array<float>, label string",
    )


@pytest.fixture(scope="module")
def mined(spark):
    a_dir = RNG.normal(size=DIM)
    b_dir = RNG.normal(size=DIM)
    rows = []
    # two label clusters around opposite directions
    for i in range(12):
        rows.append((i, a_dir + RNG.normal(scale=0.05, size=DIM), "A"))
    for i in range(12, 24):
        rows.append((i, -a_dir + RNG.normal(scale=0.05, size=DIM), "B"))
    # the planted hard negative: label B but almost exactly an A vector
    rows.append((99, a_dir + 1e-4, "B"))
    # an unlabeled straggler: must never appear on either side
    rows.append((100, b_dir, None))
    df = _emb(spark, rows)
    out = mine_hard_negatives(
        df, "label", k=20, m=3, dim=DIM, n_planes=2, n_tables=8
    ).collect()
    return rows, out


def test_negatives_always_cross_label(mined):
    rows, out = mined
    lbl = {i: l for i, v, l in rows}
    assert out  # non-vacuous
    for r in out:
        assert r["anchor_label"] == lbl[r["anchor_id"]]
        assert r["negative_label"] == lbl[r["negative_id"]]
        assert r["anchor_label"] != r["negative_label"]
        assert r["anchor_id"] != r["negative_id"]


def test_planted_near_dup_is_rank_one_negative(mined):
    rows, out = mined
    # doc 99 (label B, sitting inside cluster A) must be the #1 hard
    # negative for the A anchors that retrieved it
    hits = [r for r in out if r["negative_id"] == 99]
    assert hits and all(r["anchor_label"] == "A" for r in hits)
    assert any(r["neg_rank"] == 1 for r in hits)
    # and symmetrically, 99's own negatives are A vectors at sim ~1
    own = sorted(
        (r for r in out if r["anchor_id"] == 99),
        key=lambda r: r["neg_rank"],
    )
    assert own and own[0]["negative_label"] == "A"
    assert own[0]["cos_sim"] > 0.99


def test_ranks_dense_and_sims_exact(mined):
    rows, out = mined
    vec = {i: np.array(v, dtype=float) for i, v, l in rows}
    by_anchor: dict[int, list] = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for anchor, rs in by_anchor.items():
        ranks = sorted(r["neg_rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3  # m
        for r in rs:
            a, b = vec[r["anchor_id"]], vec[r["negative_id"]]
            want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert math.isclose(r["cos_sim"], round(want, 6), abs_tol=2e-6)


def test_null_label_rows_never_appear(mined):
    _, out = mined
    ids = {r["anchor_id"] for r in out} | {r["negative_id"] for r in out}
    assert 100 not in ids
