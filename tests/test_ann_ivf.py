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
