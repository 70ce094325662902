"""suggest_lsh_planes: the anti-quadratic dial for LSH similarity joins.

The scale bench measured the fixed-plane form at 23× wall-clock for 10×
data (SCALE.md §Scaling exponents) — bucket occupancy grows linearly
with N when 2^planes is constant.  These tests pin the knob's contract:
occupancy stays bounded, the dial is monotone, and a high-similarity
pair still survives the finer banding (the n_tables OR buys the recall
back).
"""

from __future__ import annotations

import numpy as np

from jurimetria_etl_spark.operators.similarity import (
    cosine_similarity_join,
    suggest_lsh_planes,
)


def test_suggested_planes_bound_expected_occupancy():
    for n in (10, 500, 20_000, 200_000, 10_000_000):
        p = suggest_lsh_planes(n, target_bucket_size=200)
        assert 1 <= p <= 24
        if n > 200 and p < 24:
            # 2^planes buckets hold expected occupancy <= target
            assert n / (2**p) <= 200


def test_suggested_planes_monotone_in_n():
    ps = [suggest_lsh_planes(n) for n in (100, 1_000, 10_000, 100_000, 1_000_000)]
    assert ps == sorted(ps)
    assert ps[0] == 1  # tiny corpora stay near-exact


def test_default_n_planes_is_auto_sized(spark):
    """The DEFAULT path must be the scale-safe one: n_planes=None
    auto-sizes from the right-side count (the round-5 scale bench measured
    the old fixed-4 default at 15.2× wall-clock for 10× data).  Pin that
    the default produces exactly the pairs of an explicit
    suggest_lsh_planes(count) call — same hash space, same candidates."""
    import numpy as np

    from jurimetria_etl_spark.operators.similarity import (
        dedup_embeddings_keep_one,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 1, (300, 16))
    vecs[250:] = vecs[:50] + rng.normal(0, 0.01, (50, 16))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    expected_planes = suggest_lsh_planes(300)
    auto = cosine_similarity_join(emb, emb, threshold=0.9, dim=16).collect()
    explicit = cosine_similarity_join(
        emb, emb, threshold=0.9, dim=16, n_planes=expected_planes
    ).collect()
    assert {(r.left_id, r.right_id) for r in auto} == {
        (r.left_id, r.right_id) for r in explicit
    }
    assert len(auto) >= 50  # the planted twins all survive the auto banding
    # the embedding-dedup wrapper rides the same default
    kept = dedup_embeddings_keep_one(emb, 0.9, dim=16).count()
    assert kept <= 250


def test_auto_planes_refuses_precomputed_banded_frame(spark):
    """Auto-sizing cannot infer the hash space a precomputed signature
    frame was built in — mixing spaces silently collapses recall, so the
    combination must raise (same contract as knn_join)."""
    import pytest

    from jurimetria_etl_spark.operators.similarity import (
        lsh_banded_signatures,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    banded = lsh_banded_signatures(emb, dim=2, n_planes=2)
    with pytest.raises(ValueError, match="n_planes"):
        cosine_similarity_join(
            emb, emb, threshold=0.5, dim=2, left_banded=banded
        )


def test_planted_twins_survive_scaled_planes(spark):
    """With planes scaled for N=2000 (~4 planes at target 200, but force a
    finer 8-plane banding), a cos~0.99 planted twin must still collide in
    at least one of the 8 tables and be emitted by the join."""
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (400, 32))
    vecs = np.vstack([base, base[:8] + rng.normal(0, 0.02, (8, 32))])
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    got = cosine_similarity_join(
        emb, emb, threshold=0.9, dim=32, n_planes=8, n_tables=8
    ).collect()
    pairs = {(r.left_id, r.right_id) for r in got}
    for i in range(8):
        assert (i, 400 + i) in pairs, f"twin pair {i} lost by finer banding"
