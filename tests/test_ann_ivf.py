"""IVF ANN: exact at full probe, bounded scan at partial probe."""

from __future__ import annotations

import pytest

from jurimetria_etl_spark.operators.similarity import (
    ann_ivf_topk,
    cosine_topk,
    ivf_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_full_probe_equals_brute_force(spark, emb):
    exact = cosine_topk(emb, probe_id=1, k=5).collect()
    ivf = ann_ivf_topk(emb, probe_id=1, k=5, n_cells=8, n_probe=8).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in exact]


def test_partial_probe_recall(spark, emb):
    exact = {r["vec_id"] for r in cosine_topk(emb, probe_id=1, k=5).collect()}
    approx = {
        r["vec_id"]
        for r in ann_ivf_topk(emb, probe_id=1, k=5, n_cells=8, n_probe=4).collect()
    }
    # partial probe scans half the cells; demand non-trivial recall
    assert len(exact & approx) >= 3


def test_every_vector_gets_a_cell(spark, emb):
    indexed, centroids = ivf_index(emb, n_cells=8)
    assert len(centroids) == 8
    cells = indexed.groupBy("ivf_cell").count()
    rows = cells.collect()
    assert sum(r["count"] for r in rows) == emb.count()
    assert all(0 <= r["ivf_cell"] < 8 for r in rows)


def test_partitioned_layout_prunes_and_matches(spark, emb, tmp_path):
    """The cell-partitioned parquet layout: probing reads ONLY the probed
    cells' directories (PartitionFilters in the scan) and returns the same
    top-k as the in-memory IVF at the same n_probe."""
    from jurimetria_etl_spark.operators.similarity import (
        ann_ivf_topk_pruned,
        ivf_write_partitioned,
    )

    path = str(tmp_path / "ivf_layout")
    centroids = ivf_write_partitioned(emb, path, n_cells=8)
    probe_vec = [
        float(v)
        for v in emb.where("vec_id = 1").first()["embedding"]
    ]

    pruned = ann_ivf_topk_pruned(
        spark, path, centroids, probe_vec, k=5, n_probe=3, exclude_id=1
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]

    in_memory = ann_ivf_topk(emb, probe_id=1, k=5, n_cells=8, n_probe=3)
    assert [tuple(r) for r in pruned.collect()] == [
        tuple(r) for r in in_memory.collect()
    ]


def test_kmeans_trained_centroids_separate_planted_blobs(spark):
    # three tight, well-separated direction blobs with one seed id in each
    # (ids 0/1/2): after training, every blob owns one centroid, so a
    # 1-probe search returns only (and all) same-blob neighbors
    import random

    from jurimetria_etl_spark.operators.similarity import (
        ann_ivf_topk_indexed,
        ivf_index,
        train_ivf_centroids,
    )

    rng = random.Random(7)
    base = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0]}
    rows = []
    for blob in range(3):
        for j in range(20):
            vec = [c + rng.uniform(-0.5, 0.5) for c in base[blob]]
            rows.append((blob + 3 * j, vec))  # ids 0,1,2 seed distinct blobs
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    centroids = train_ivf_centroids(emb, n_cells=3, n_iters=4)
    indexed, centroids = ivf_index(emb, 3, centroids=centroids)
    got = ann_ivf_topk_indexed(indexed, centroids, probe_id=0, k=5, n_probe=1)
    ids = [r["vec_id"] for r in got.collect()]
    assert len(ids) == 5
    assert all(i % 3 == 0 for i in ids)  # same blob as probe id 0

    # full probe is still exactly brute force regardless of training
    from jurimetria_etl_spark.operators.similarity import cosine_topk

    brute = [r["vec_id"] for r in cosine_topk(emb, 0, 5).collect()]
    full = [
        r["vec_id"]
        for r in ann_ivf_topk_indexed(
            indexed, centroids, probe_id=0, k=5, n_probe=3
        ).collect()
    ]
    assert full == brute


def test_zero_norm_vectors_score_zero_not_crash(spark):
    """r8 review (verified live pre-fix): one all-zero embedding threw
    DIVIDE_BY_ZERO under ANSI Spark in every unclamped cosine path.  The
    clamp lives in _norm now: zero vectors score 0.0 everywhere, and the
    pandas path agrees with the JVM path on degenerate rows."""
    from jurimetria_etl_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_batch,
        cosine_topk_pandas,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 0.0]),  # degenerate
        ],
        "vec_id long, embedding array<double>",
    )
    jvm = cosine_topk(emb, probe_id=1, k=2).collect()
    pnd = cosine_topk_pandas(emb, probe_id=1, k=2).collect()
    assert [tuple(r) for r in jvm] == [tuple(r) for r in pnd]
    scores = {r["vec_id"]: r["cos_sim"] for r in jvm}
    assert scores[3] == 0.0  # zero vector: worst match, never NULL/error

    # a zero-norm PROBE scores 0.0 against everything, ties by id
    probes = spark.createDataFrame(
        [(9, [0.0, 0.0])], "query_id long, probe array<double>"
    )
    got = cosine_topk_batch(emb, probes, k=3).collect()
    assert {r["cos_sim"] for r in got} == {0.0}
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2, 3]
