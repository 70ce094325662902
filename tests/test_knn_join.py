"""knn_join: batched approximate k-NN (top-k neighbors for EVERY row).

Contracts pinned: high recall vs exact brute force on clustered data,
planted near-identical twins always found at rank 1, self-pairs excluded,
per-left-id output bounded by k, and a banded plan (no cartesian)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.similarity import knn_join

K = 5
N = 600
DIM = 32
N_TWINS = 10


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(23)
    cents = rng.normal(0, 1.0, (8, DIM))
    labels = rng.integers(0, 8, N)
    vecs = cents[labels] + rng.normal(0, 0.3, (N, DIM))
    # twins: last N_TWINS rows are near-copies of the first N_TWINS
    vecs[N - N_TWINS :] = vecs[:N_TWINS] + rng.normal(0, 0.01, (N_TWINS, DIM))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    ).persist()
    emb.count()
    yield emb, vecs
    emb.unpersist()


@pytest.fixture(scope="module")
def result(spark, data):
    emb, _ = data
    return knn_join(emb, emb, k=K, dim=DIM, n_planes=3, n_tables=8).collect()


def _exact_topk(vecs: np.ndarray) -> dict[int, list[int]]:
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    s = vn @ vn.T
    np.fill_diagonal(s, -2)
    # mirror the operator's determinism: round, then tiebreak by id
    s6 = np.round(s, 6)
    out = {}
    for i in range(len(vecs)):
        order = sorted(range(len(vecs)), key=lambda j: (-s6[i, j], j))
        out[i] = order[:K]
    return out


def test_recall_and_bounds(data, result):
    _, vecs = data
    truth = _exact_topk(vecs)
    by_left: dict[int, list] = {}
    for r in result:
        by_left.setdefault(r.left_id, []).append(r)
    hits = tot = 0
    for i, want in truth.items():
        got = {r.right_id for r in by_left.get(i, [])}
        assert len(got) <= K
        hits += len(got & set(want))
        tot += K
    assert hits / tot >= 0.9, f"knn_join recall fell to {hits/tot:.3f}"


def test_twins_found_at_rank_one(result):
    rank1 = {r.left_id: r.right_id for r in result if r.rank == 1}
    for i in range(N_TWINS):
        assert rank1[i] == N - N_TWINS + i
        assert rank1[N - N_TWINS + i] == i


def test_no_self_pairs_and_ranks_dense(result):
    for r in result:
        assert r.left_id != r.right_id
    by_left: dict[int, list[int]] = {}
    for r in result:
        by_left.setdefault(r.left_id, []).append(r.rank)
    for ranks in by_left.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_plan_is_banded_no_cartesian(spark, data):
    emb, _ = data
    plan = (
        knn_join(emb, emb, k=K, dim=DIM, n_planes=3, n_tables=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "RoundRobinPartitioning" in plan or "Exchange" in plan


def test_two_sided_join_keeps_all_pairs_direction(spark, data):
    emb, _ = data
    probes = emb.where(F.col("vec_id") < 3)
    got = knn_join(probes, emb, k=3, dim=DIM, n_planes=2, n_tables=8).collect()
    lefts = {r.left_id for r in got}
    assert lefts == {0, 1, 2}
    # identity pair appears in the two-sided form (left is a distinct
    # frame, so the probe's own corpus row legitimately ranks first)
    assert all(
        any(r.left_id == i and r.right_id == i and r.rank == 1 for r in got)
        for i in range(3)
    )

def test_candidate_cap_bounds_rescore_and_keeps_recall(spark, data):
    """r8: max_candidates truncates the pair frame by collision count
    BEFORE the vector re-score.  A tight cap must (a) still find the
    planted twins (they collide in ~every table, so they survive any
    cap ≥ 1), (b) keep per-left output ≤ k, and (c) degrade recall
    gracefully, not collapse — the 0.9 floor at the DEFAULT auto cap is
    pinned by test_recall_and_bounds (the default is now "auto"); this
    fixture is deliberately dense (3 planes → occupancy ~75, heavy
    collision-count ties inside clusters), so a 50-pair cap measurably
    trades recall (measured 0.78) and the pin here is the floor under
    that trade."""
    emb, vecs = data
    truth = _exact_topk(vecs)

    capped = knn_join(
        emb, emb, k=K, dim=DIM, n_planes=3, n_tables=8, max_candidates=50
    ).collect()
    by_left: dict[int, list] = {}
    for r in capped:
        by_left.setdefault(r.left_id, []).append(r)
    hits = tot = 0
    for i, want in truth.items():
        got = {r.right_id for r in by_left.get(i, [])}
        assert len(got) <= K
        hits += len(got & set(want))
        tot += K
    # a 50-pair cap on a 600-row corpus is aggressive; the floor is the
    # collision-count proxy doing its job, not luck
    assert hits / tot >= 0.7, f"capped recall fell to {hits/tot:.3f}"
    rank1 = {r.left_id: r.right_id for r in capped if r.rank == 1}
    for i in range(N_TWINS):
        assert rank1[i] == N - N_TWINS + i


def test_candidate_cap_none_matches_non_binding_cap(spark, data):
    """max_candidates=None (the pre-r8 exact-LSH-recall contract) must
    equal a truncation run whose cap can never bind (≥ the corpus size):
    the collision-count aggregate + window is then a pure no-op on the
    pair set and only the uncapped enumeration semantics remain."""
    emb, _ = data
    uncapped = knn_join(
        emb, emb, k=3, dim=DIM, n_planes=5, n_tables=4, max_candidates=None
    )
    loose = knn_join(
        emb, emb, k=3, dim=DIM, n_planes=5, n_tables=4, max_candidates=N
    )
    a = sorted(map(tuple, uncapped.collect()))
    b = sorted(map(tuple, loose.collect()))
    assert a == b
