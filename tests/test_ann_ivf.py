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
