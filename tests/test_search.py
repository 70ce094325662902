"""BM25 keyword search (operators/search.py): exact parity with a pure-
Python Okapi model, top-k/ranking contracts, statistical stop-listing,
and the native-plan guarantee (zero python nodes, broadcast query join).
Engine-vs-engine value check lives in test_deregistered_queries.py (x35).
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.search import (
    build_text_index,
    bm25_search,
    bm25_search_docs,
)

DOCS = [
    (0, "Spark shuffles data between stages; a shuffle is a boundary"),
    (1, "The join strategy broadcasts the small side to every executor"),
    (2, "Sort-merge join shuffles both sides by the join keys"),
    (3, "A columnar scan prunes columns and pushes filters down"),
    (4, "Caching data avoids recomputing the shuffle twice"),
    (5, "spark SPARK Spark — casing must not matter, nor punctuation!!"),
]
QUERIES = [(100, "spark shuffle"), (200, "join keys"), (300, "absentterm")]
K1, B = 1.2, 0.75


def _tok(s: str) -> list[str]:
    """Model of the operator's Unicode tokenizer ([^\\p{L}\\p{N}]+ after
    lower): group runs of Unicode letter/number characters.  Python's
    \\w also matches '_' and misses \\p{No} (e.g. 'º'), so we classify
    per-char with unicodedata instead of re."""
    import unicodedata

    out: list[str] = []
    cur: list[str] = []
    for ch in s.lower():
        if unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _model_bm25(docs, queries, k):
    """Pure-Python Okapi BM25, the operator's spec: per-(term, doc) tf,
    Robertson idf, distinct query terms, round 1e-6, doc_id tie-break."""
    toks = {i: _tok(t) for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    tf: dict[tuple[str, int], int] = {}
    for i, ts in toks.items():
        for t in ts:
            tf[(t, i)] = tf.get((t, i), 0) + 1
    df: dict[str, int] = {}
    for (t, _i) in tf:
        df[t] = df.get(t, 0) + 1
    out = []
    for qid, qtext in queries:
        scores: dict[int, float] = {}
        for t in set(_tok(qtext)):
            if t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for i in range(n):
                f = tf.get((t, i))
                if not f:
                    continue
                part = f * (K1 + 1) / (
                    f + K1 * (1 - B + B * dl[i] / avgdl)
                )
                scores[i] = scores.get(i, 0.0) + idf * part
        ranked = sorted(
            ((round(s, 6), i) for i, s in scores.items()),
            key=lambda p: (-p[0], p[1]),
        )
        for r, (s, i) in enumerate(ranked[:k], 1):
            out.append((qid, i, s, r))
    return sorted(out)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id int, query_text string")
    return docs, queries


def test_matches_python_model_exactly(spark, frames):
    docs, queries = frames
    got = sorted(
        map(tuple, bm25_search_docs(docs, queries, k=3).collect())
    )
    assert got == _model_bm25(DOCS, QUERIES, 3)


def test_no_hit_query_returns_no_rows_and_ranks_dense(spark, frames):
    docs, queries = frames
    rows = bm25_search_docs(docs, queries, k=10).collect()
    assert not [r for r in rows if r.query_id == 300]
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_casing_and_punctuation_normalized(spark, frames):
    docs, _ = frames
    q = spark.createDataFrame(
        [(1, "SPARK!!"), (2, "spark")], "query_id int, query_text string"
    )
    rows = bm25_search_docs(docs, q, k=10).collect()
    a = sorted((r.doc_id, r.score) for r in rows if r.query_id == 1)
    b = sorted((r.doc_id, r.score) for r in rows if r.query_id == 2)
    assert a == b and len(a) > 0


def test_repeated_query_terms_count_once(spark, frames):
    docs, _ = frames
    q = spark.createDataFrame(
        [(1, "shuffle shuffle shuffle"), (2, "shuffle")],
        "query_id int, query_text string",
    )
    rows = bm25_search_docs(docs, q, k=10).collect()
    a = sorted((r.doc_id, r.score) for r in rows if r.query_id == 1)
    b = sorted((r.doc_id, r.score) for r in rows if r.query_id == 2)
    assert a == b


def test_max_df_ratio_drops_stop_terms(spark, frames):
    docs, _ = frames
    # "the" appears in 3/6 docs; at max_df_ratio=0.4 it must leave the
    # index, so a "the"-only query finds nothing while a content term
    # ("broadcasts", df=1) still resolves.
    idx = build_text_index(docs, max_df_ratio=0.4)
    q = spark.createDataFrame(
        [(1, "the"), (2, "broadcasts")], "query_id int, query_text string"
    )
    rows = bm25_search(idx, q, k=10).collect()
    assert not [r for r in rows if r.query_id == 1]
    assert [r for r in rows if r.query_id == 2]


def test_index_stats_shape(spark, frames):
    docs, _ = frames
    idx = build_text_index(docs)
    st = idx.stats.first()
    assert st["n_docs"] == len(DOCS)
    total = sum(len(_tok(t)) for _, t in DOCS)
    assert abs(st["avgdl"] - total / len(DOCS)) < 1e-9
    # postings tf sums back to the token count
    assert idx.postings.agg(F.sum("tf")).first()[0] == total


def test_portuguese_tokens_survive_whole(spark):
    """r8 verdict weak #1: the domain corpus is Brazilian judicial
    Portuguese; 'indenização'/'ação' must tokenize as single terms, not
    ASCII fragments, and a Portuguese query must retrieve the accented
    document."""
    docs_pt = [
        (0, "Ação de Indenização por Danos Morais — São Paulo"),
        (1, "Execução Fiscal movida pela Fazenda Pública"),
        (2, "shuffle join broadcast columnar scan"),
    ]
    docs = spark.createDataFrame(docs_pt, "doc_id long, text string")
    idx = build_text_index(docs)
    terms = {r["term"] for r in idx.postings.select("term").collect()}
    assert {"ação", "indenização", "são", "paulo", "execução",
            "fazenda", "pública"} <= terms
    # no one-letter shrapnel from splitting inside accented words
    assert not {"a", "o", "indeniza", "s", "p blica"} & terms
    q = spark.createDataFrame(
        [(1, "indenização danos morais"), (2, "execução fiscal")],
        "query_id int, query_text string",
    )
    rows = bm25_search(idx, q, k=1).collect()
    top = {r["query_id"]: r["doc_id"] for r in rows}
    assert top == {1: 0, 2: 1}
    # parity with the python model on the accented corpus
    got = sorted(map(tuple, bm25_search_docs(docs, q, k=3).collect()))
    assert got == _model_bm25(
        docs_pt,
        [(1, "indenização danos morais"), (2, "execução fiscal")],
        3,
    )


def test_fold_accents_mode_matches_unaccented_query(spark):
    """Opt-in accent-insensitive mode: an index built with
    fold_accents=True resolves the unaccented query 'indenizacao';
    the default (exact) index does not."""
    docs = spark.createDataFrame(
        [(0, "Ação de Indenização por Danos Morais")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "indenizacao")], "query_id int, query_text string"
    )
    exact = bm25_search(build_text_index(docs), q, k=5).count()
    folded = bm25_search(
        build_text_index(docs, fold_accents=True), q, k=5,
        fold_accents=True,
    ).count()
    assert exact == 0 and folded == 1
    # the one-shot form must fold BOTH sides from the single kwarg —
    # an index/query fold mismatch would silently return nothing
    assert bm25_search_docs(docs, q, k=5, fold_accents=True).count() == 1


def test_plan_native_and_broadcast(spark, frames):
    docs, queries = frames
    plan = (
        bm25_search_docs(docs, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # query terms / dfs ride broadcasts


# ── hybrid retrieval: RRF fusion + batched dense top-k ─────────────────────


def test_rrf_fuse_hand_model(spark):
    from jurimetria_etl_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id int, doc_id long, rank int",
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id int, doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["fused_rank"])
        for r in rrf_fuse([lex, dense], k=60).collect()
    }
    exp = {
        10: round(1 / 61, 9),
        11: round(1 / 62 + 1 / 61, 9),
        12: round(1 / 63, 9),
        13: round(1 / 62, 9),
    }
    assert {d: s for d, (s, _) in got.items()} == exp
    # doc 11 appears in both lists -> fused first
    order = sorted(got, key=lambda d: got[d][1])
    assert order == [11, 10, 13, 12]


def test_rrf_topk_and_tiebreak(spark):
    from jurimetria_etl_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 5, 1), (1, 7, 2)], "query_id int, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 8, 1), (1, 9, 2)], "query_id int, doc_id long, rank int"
    )
    rows = rrf_fuse([a, b], k=60, topk=3).collect()
    assert len(rows) == 3
    by_rank = {r["fused_rank"]: r["doc_id"] for r in rows}
    # 5 and 8 tie at 1/61 -> doc_id breaks: 5 first; 7/9 tie cut at topk
    assert by_rank == {1: 5, 2: 8, 3: 7}


def test_cosine_topk_batch_matches_numpy(spark):
    import numpy as np

    from jurimetria_etl_spark.operators.similarity import cosine_topk_batch

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 6)).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(100, [float(v) for v in X[0]]), (200, [float(v) for v in X[1]])],
        "query_id int, probe array<float>",
    )
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cosine_topk_batch(corpus, probes, k=5).collect()
    }
    Xd = X.astype(np.float64)
    Xn = Xd / np.linalg.norm(Xd, axis=1)[:, None]
    for qid, pi in ((100, 0), (200, 1)):
        sims = np.round(Xn @ Xn[pi], 6)
        order = sorted(range(40), key=lambda i: (-sims[i], i))[:5]
        assert [got[(qid, r)] for r in range(1, 6)] == order
        assert got[(qid, 1)] == pi  # the probe itself ranks first


def test_hybrid_search_contract(spark, frames):
    import numpy as np

    from jurimetria_etl_spark.operators.search import hybrid_search

    docs, queries = frames
    rng = np.random.default_rng(5)
    X = rng.normal(size=(6, 4))
    embeds = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(100, [float(v) for v in X[2]]), (200, [float(v) for v in X[4]])],
        "query_id int, probe array<float>",
    )
    out = hybrid_search(
        docs, embeds, queries.where("query_id != 300"), probes,
        k_each=3, topk=4,
    ).collect()
    assert out
    for r in out:
        assert 1 <= r["fused_rank"] <= 4
        assert r["rrf_score"] > 0
    # per-query ranks are dense from 1
    from collections import defaultdict

    per = defaultdict(list)
    for r in out:
        per[r["query_id"]].append(r["fused_rank"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hybrid_plan_native(spark, frames):
    import numpy as np

    from jurimetria_etl_spark.operators.search import hybrid_search

    docs, queries = frames
    rng = np.random.default_rng(5)
    X = rng.normal(size=(6, 4))
    embeds = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(100, [float(v) for v in X[2]])], "query_id int, probe array<float>"
    )
    plan = (
        hybrid_search(docs, embeds, queries, probes, k_each=3, topk=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" not in plan


def test_rrf_fuse_empty_list_raises(spark):
    import pytest

    from jurimetria_etl_spark.operators.search import rrf_fuse

    with pytest.raises(ValueError, match="at least one ranked list"):
        rrf_fuse([])
