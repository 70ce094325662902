"""The registry was trimmed to 50 entries; everything de-registered keeps
value-level coverage HERE (same DuckDB-oracle comparison the driver gate
runs, at sf0.001): q05 inner join, the q02/q03/q07/q17/q12-family
standalone forms, q24 text stats, x09/x10/x11 text queries, and the
approximate ops' quality bounds."""

from __future__ import annotations

import duckdb
import pytest

from jurimetria_etl_spark.plans import corpus as C
from jurimetria_etl_spark.plans import extensions as E
from jurimetria_etl_spark.plans import tpch as T

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "∅"  # sortable sentinel (rollup/cube NULL group keys)
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


PAIRS = [
    (C.q02_filter_eq, C.Q02_SQL),
    (C.q03_filter_range_nullpass, C.Q03_SQL),
    (C.q05_join_inner, C.Q05_SQL),
    (C.q07_join_anti, C.Q07_ANTI_SQL),
    (C.q07_join_semi, C.Q07_SEMI_SQL),
    (C.q12_rollup, C.Q12_SQL),
    (C.q17_intersect, C.Q17_INTERSECT_SQL),
    (C.q17_except, C.Q17_EXCEPT_SQL),
    (C.q24_text_stats, C.Q24_SQL),
    (C.q30_cube, C.Q30_SQL),
    (C.q31_grouping_sets, C.Q31_SQL),
    (E.x09_lang_id, E.X09_SQL),
    (E.x10_quality, E.X10_SQL),
    (E.x11_token_stats, E.X11_SQL),
    (E.x19_stratified_sample, E.X19_SQL),
    (E.x21_chunk_documents, E.X21_SQL),
    (E.x42_shuffled_shards, E.X42_SQL),
    # rotated OUT in round 13 (to admit x43_curation_funnel): the
    # media-metadata Arrow boundary rides x18's registered pipeline
    (E.x15_media_metadata, E.X15_SQL),
    (E.x43_curation_funnel, E.X43_SQL),
    (E.x22_training_shards, E.X22_SQL),
    (E.x23_pii_scrub, E.X23_SQL),
    (E.x24_quality_rules, E.X24_SQL),
    (E.x25_decontaminate, E.X25_SQL),
    (E.x26_mix_corpora, E.X26_SQL),
    # rotated OUT of the driver registry in round 3 (to admit x18/x20/t05);
    # standalone oracle coverage continues here:
    (C.q09_count, C.Q09_SQL),
    (C.q19_date_fns, C.Q19_SQL),
    (E.x02_fingerprint, E.X02_SQL),
    # rotated OUT in round 4 (to admit x23/x25); q16 also rides
    # q17_setops' tagged union in the driver registry:
    (C.q11_count_distinct, C.Q11_SQL),
    (C.q16_union_all, C.Q16_SQL),
    # never registered (window full): Q12/Q14-shape composites
    (T.t06_late_shipments, T.T06_SQL),
    (T.t07_promo_revenue, T.T07_SQL),
    # never registered (window full, r6): Q11 global-scalar HAVING, Q15
    # argmax join-back, Q16 distinct-count + NOT-IN, Q7 bilateral volume
    (T.t16_important_parts, T.T16_SQL),
    (T.t17_top_supplier, T.T17_SQL),
    (T.t18_supplier_cnt_by_part, T.T18_SQL),
    (T.t19_nation_volume, T.T19_SQL),
    # rotated OUT in round 5 (to admit the correlated-subquery composites
    # t08-t10); x05/x08 compose these stages and stay in the registry:
    (E.x03_minhash, E.EXT_DEREGISTERED["x03_minhash"].oracle),
    (E.x04_minhash_candidates, E.EXT_DEREGISTERED["x04_minhash_candidates"].oracle),
    (E.x07_simhash, E.EXT_DEREGISTERED["x07_simhash"].oracle),
    # rotated OUT mid-round-5 (to admit the t11-t13 nested-subquery
    # composites): q18's string fns are composed by x09/x23, q25 tumbling
    # is q33 sliding's step=size case, q29 salted ≡ plain inner join:
    (C.q18_string_fns, C.Q18_SQL),
    (C.q25_window_tumbling, C.Q25_SQL),
    (C.q29_salted_join, C.Q29_SQL),
    # rotated OUT to admit q36_gapfill; running-sum frame also rides x20:
    (C.q14_window_running, C.Q14_SQL),
    # never registered (window full): RANGE-frame trailing-time window
    # and argmax/argmin aggregates
    (C.q37_range_window, C.Q37_SQL),
    (C.q38_argmax, C.Q38_SQL),
    (C.q39_lag_gaps, C.Q39_SQL),
    (C.q40_ntile_deciles, C.Q40_SQL),
    # never registered (window full, r6): FULL OUTER reconciliation,
    # bag-semantics set ops, UNPIVOT (q34's inverse)
    (C.q41_full_outer_reconcile, C.Q41_SQL),
    (C.q42_bag_setops, C.Q42_SQL),
    (C.q43_unpivot, C.Q43_SQL),
    (C.q44_posexplode, C.Q44_SQL),
    # rotated OUT in round 6 (to admit x13b_cosine_join_scaled,
    # x28_duplicate_spans, t14, t15): q23's SQL remains x14's driver-gate
    # oracle; q21/q34/x12 are floor-dominated single-op forms:
    (C.q21_json, C.Q21_SQL),
    (C.q23_similarity_topk, C.Q23_SQL),
    (C.q34_pivot, C.Q34_SQL),
    (E.x12_cosine_pairs, E.X12_SQL),
    # never registered (window full): the boilerplate strip-list
    # aggregate companion of the registered x28_duplicate_spans, and its
    # application (replace-fold boilerplate removal):
    (E.x29_boilerplate_spans, E.X29_SQL),
    (E.x30_strip_boilerplate, E.X30_SQL),
    (E.x31_cross_corpus_spans, E.X31_SQL),
    # rotated OUT in round 7 (to admit t16/t17/t20): q22's exact dedup
    # keeps its x01 driver row; x16/x17 are floor-dominated single-op
    # forms whose families keep x15/x09 registered:
    (C.q22_dedup_exact, C.Q22_SQL),
    (E.x16_frame_sample, E.X16_SQL),
    (E.x17_rolling_fingerprint, E.X17_SQL),
    # never registered (window full, r7): Q9 product-profit shape (moved
    # into the driver gate in r8; standalone comparison retained) and the
    # Q6 selective single-table aggregate completing all 22 TPC-H plans:
    (T.t21_product_profit, T.T21_SQL),
    (T.t22_revenue_change, T.T22_SQL),
    # rotated OUT in round 8 (to admit x32_duplicate_lines + t21): q15's
    # TakeOrderedAndProject shape stays registered via t02/t13; q24's
    # explode+count rides x09/x25.  x33 is the strip half of the
    # registered x32 (never registered, window full):
    (C.q15_topk, C.Q15_SQL),
    (C.q24_top_terms, C.Q24_TOP_TERMS_SQL),
    (E.x33_strip_duplicate_lines, E.X33_SQL),
    # never registered (window full, r8): Bloom-prefiltered incremental
    # dedup — the filter must be output-invisible vs a plain anti-join:
    (E.x34_bloom_incremental_dedup, E.X34_SQL),
    # never registered (window full, r8): BM25 keyword top-k — same
    # Okapi formula recomputed in DuckDB from the same tokenization:
    (E.x35_bm25_search, E.X35_SQL),
    # never registered (window full, r8): SemDeDup — embedding-cluster
    # semantic dedup; the label-cluster variant is fully SQL-expressible
    # (centroid means + within-cluster upper-triangular max):
    (E.x36_semdedup, E.X36_SQL),
    # never registered (window full, r8): hybrid BM25+dense retrieval —
    # both ranked lists and the 1/(60+rank) RRF sum recomputed in SQL:
    (E.x37_hybrid_search, E.X37_SQL),
    # rotated OUT mid-round-8 (to admit x36/x37 into the driver window):
    # x06's join shape stays registered via x05; q19's tz semantics via
    # q08 — both keep the identical DuckDB comparison here:
    (E.x06_ngram_jaccard, E.X06_SQL),
    (C.q19_hour_sp, C.Q19_HOUR_SP_SQL),
    # never registered (window full, r8): dataset assembly — the
    # leakage-guarded train/eval split (hash-stable buckets + n-gram
    # quarantine) and domain-balanced top-k / top-fraction selection:
    (E.x38_split_guarded, E.X38_SQL),
    (E.x39_top_per_domain, E.X39_SQL),
    (E.x39b_top_frac_per_domain, E.X39B_SQL),
    # never registered (window full, r8): the hashed-linear classifier
    # apply — fixed weights, engine-identical md5 feature buckets:
    (E.x40_classifier_scores, E.X40_SQL),
    # rotated OUT in round 9 (to admit x34/x35 into the driver window):
    # t03's Q5 join-agg family stays driver-covered by t20/t21, t09's
    # conditional-pct aggregate by q10 — identical DuckDB comparison:
    (T.t03_local_supplier_volume, T.T03_SQL),
    (T.t09_promotion_suppliers, T.T09_SQL),
    # rotated OUT in round 10 (to admit x38/x40 into the driver window):
    # t14's COUNT-over-outer-join family stays driver-covered by t13,
    # t16's distinct-count + NOT-IN by t18 (t16's pair has been above
    # since r6, pre-registration); identical DuckDB comparison:
    (T.t14_customer_distribution, T.T14_SQL),
    # rotated OUT in round 11 (to admit x41_ann_store_topk — the
    # persisted-ANN-store form of the same full-probe ≡ brute-force
    # identity): x14's session-built IVF probe keeps the identical Q23
    # comparison:
    (E.x14_ann_ivf, C.Q23_SQL),
    # never registered (bench-only, r11): the distributed-histogram
    # exact percentile — q32's scale-path twin, same DuckDB oracle
    # (bit-identical values to the registered native aggregate):
    (E.q32b_percentile_hist, C.Q32_SQL),
    # rotated OUT in round 12 (to admit x37b_hybrid_search_ann — the
    # composed persisted-store retrieval path): q26's session-window
    # semantics also stay pinned batch-vs-stream in test_streaming.py.
    (C.q26_session_window, C.Q26_SQL),
]


@pytest.mark.parametrize(
    "spark_fn,sql", PAIRS, ids=[fn.__name__ for fn, _ in PAIRS]
)
def test_deregistered_matches_oracle(spark, duck, spark_fn, sql):
    sdf = spark_fn(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    assert sorted(scols) == sorted(rel.columns)
    assert _canon(scols, srows) == _canon(rel.columns, rel.fetchall())


def test_q11_approx_distinct_within_rsd(spark):
    approx = C.q11_approx_distinct(spark, SF).first()["approx_cnt"]
    exact = C.q11_count_distinct(spark, SF).first()["cnt"]
    assert abs(approx - exact) / exact < 0.10  # rsd=0.02, generous bound
