"""End-to-end Portuguese corpus curation + retrieval (r9): the round's
domain theme verified as one flow — lang-ID says 'pt', the quality gate
scores on pt stopwords, dedup collapses accent-identical duplicates,
and BM25 retrieves the accented survivors with accented queries.  The
reference's corpus is Brazilian judicial Portuguese; before r9 every
one of these stages mis-handled it (ASCII tokenizer, en-only lang list,
en-only stopword floor)."""

from __future__ import annotations

from jurimetria_etl_spark.operators.search import bm25_search_docs
from jurimetria_etl_spark.plans.curation import curate_corpus

PT_DOCS = [
    # enough words to clear min_quality content/diversity terms
    (1, "A ação de indenização por danos morais foi movida para o réu "
        "com os autos do processo que correm na vara cível da comarca "
        "de São Paulo segundo os prazos do recurso da apelação"),
    (2, "A execução fiscal movida pela fazenda pública contra o "
        "contribuinte para a cobrança dos tributos que não foram pagos "
        "com os juros e a multa do débito inscrito na dívida ativa"),
    # exact duplicate of doc 1 -> must be collapsed (lowest id wins)
    (3, "A ação de indenização por danos morais foi movida para o réu "
        "com os autos do processo que correm na vara cível da comarca "
        "de São Paulo segundo os prazos do recurso da apelação"),
    # an English doc -> rejected by the pt language gate
    (4, "the quick brown fox is one of the animals in the story and "
        "it jumps over the lazy dog to the end of the tale"),
]


def test_portuguese_corpus_curates_and_retrieves(spark):
    docs = spark.createDataFrame(PT_DOCS, "doc_id long, text string")
    curated = curate_corpus(
        docs,
        languages=("pt",),
        min_quality=0.3,
        quality_lang="pt",
    )
    rows = {r["doc_id"]: r for r in curated.collect()}
    # doc 4 fails the pt lang gate; doc 3 dies as an exact dup of 1
    assert set(rows) == {1, 2}
    assert all(r["lang_pred"] == "pt" for r in rows.values())
    # the pt stopword floor credits these as natural language
    assert all(r["quality"] >= 0.3 for r in rows.values())

    # accented keyword retrieval over the curated survivors
    queries = spark.createDataFrame(
        [(1, "indenização danos morais"), (2, "execução fiscal tributos")],
        "query_id int, query_text string",
    )
    top = {
        r["query_id"]: r["doc_id"]
        for r in bm25_search_docs(
            curated.select("doc_id", "text"), queries, k=1
        ).collect()
    }
    assert top == {1: 1, 2: 2}
