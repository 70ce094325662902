"""Plan-shape contract for the ENTIRE bench corpus (VERDICT r4 item 7).

Every query in bench.HEADLINE gets its executed plan audited against pinned
expectations, so a plan regression (a join falling off broadcast, a Python
boundary appearing in a reference-shape query, an accidental cartesian, a
new shuffle) fails CI instead of waiting for a judge's manual audit.

Expectations were pinned from the audited round-4/5 plans (PLAN_AUDIT.md):
  - CartesianProduct: never, anywhere.
  - BroadcastNestedLoopJoin: only the three intended 1-row broadcast
    attaches (q23 probe vector, t10 global scalar avg, x14 probe row) —
    a constant single-row side, which is a plan *feature*, not a blowup.
  - Python nodes: only x15's Arrow mapInPandas (multimodal metadata);
    every reference-shape and TPC-H-shape query stays 100% JVM-side.
  - Exchange count: pinned exactly per query.  Exchanges are the unit of
    shuffle cost at 100 TB; a new one appearing is exactly the silent
    regression this file exists to catch.  (An intentional plan change
    updates the pin — that's the point: the diff becomes reviewable.)
  - BroadcastHashJoin floor where the plan relies on broadcasting dims.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

SF = "/root/testdata/sf0.001"

# name -> (max_bnlj, allowed_python, exact_exchanges, min_broadcast_joins)
EXPECT: dict[str, tuple[int, int, int, int]] = {
    "q01_scan_project": (0, 0, 0, 0),
    "q06_join_star": (0, 0, 5, 3),
    "q08_agg_hour": (0, 0, 2, 0),
    "q10_agg_conditional": (0, 0, 1, 0),
    "q12_grouping": (0, 0, 3, 0),
    "q13_window_rank": (0, 0, 1, 0),
    "q36_gapfill": (0, 0, 3, 1),
    "q15_topk": (0, 0, 0, 0),
    "q20_array_agg": (0, 0, 2, 0),
    "q22_dedup_exact": (0, 0, 2, 0),
    "q24_top_terms": (0, 0, 1, 0),
    "q27_asof_join": (0, 0, 1, 0),
    "q28_range_join": (0, 0, 2, 1),
    # q32 (r16 size-adaptive strategy): at this pin's sf0.001 the input
    # is far below the 32 MB selection crossover, so the NATIVE
    # percentile plan runs (2 exchanges — the single-pass value→count
    # aggregate).  The ≥32 MB two-pass selection plan
    # (plans/r16/q32_percentile_selection_sf1.txt) is pinned separately
    # in tests/test_percentile_hist.py via the forced-threshold parity
    # test.
    "q32_percentile": (0, 0, 2, 0),
    "t01_pricing_summary": (0, 0, 3, 0),
    "t02_shipping_priority": (0, 0, 5, 2),
    "t03_local_supplier_volume": (0, 0, 9, 5),
    "t04_returned_items": (0, 0, 6, 3),
    "t06_late_shipments": (0, 0, 5, 1),
    "t07_promo_revenue": (0, 0, 3, 1),
    "t08_small_qty_revenue": (0, 0, 4, 1),  # r15: correlated avg as a window on the single pruned pass (was 7 exch, 2 fact scans)
    "t09_promotion_suppliers": (0, 0, 6, 3),
    "t10_idle_rich_customers": (1, 0, 5, 1),  # 1-row global-avg attach
    "t11_big_orders": (0, 0, 4, 2),
    # t12 (r15): per-order supplier stats as a window over the single
    # (order, supplier) rollup — the former stats aggregate + self-join
    # planned the identical orders⨝lineitem spine subtree under BOTH
    # SortMergeJoin inputs (2 scans, 2 spine joins, 10 exchanges);
    # now 1 scan / 6 exchanges / 0 SMJ, warm 3.33 s → 1.87 s.
    "t12_waiting_suppliers": (0, 0, 6, 2),
    "t13_min_cost_supplier": (0, 0, 6, 4),  # r15: correlated MIN as a window on the single offers pass (was 13 exch, 2 fact scans, 1 SMJ)
    # t14: orders per-custkey agg (partial+final), broadcast of the count
    # frame into customer's left join, distribution agg, final sort.
    "t14_customer_distribution": (0, 0, 5, 1),
    # t15: broadcast part into lineitem, single global agg.
    "t15_disjunctive_pricing": (0, 0, 3, 1),
    # t16: per-part decimal agg + 1-row global-total broadcast attach
    # (the intended BNLJ) + exact-decimal threshold filter + sort.
    "t16_important_parts": (1, 0, 3, 0),  # r15: per-part agg checkpointed once; global total derived from it (was 6 exch, 2 fact scans)
    # t17: quarter-pruned per-supplier agg, 1-row max attach, equality
    # tail, broadcast supplier join.
    "t17_top_supplier": (0, 0, 4, 1),  # r15: rev localCheckpoint - one fact scan feeds both the max subtree and the equality tail
    # t18: broadcast ANTI exclusion + broadcast part + one distinct agg.
    "t18_supplier_cnt_by_part": (0, 0, 6, 2),
    # t19: two nation-pruned broadcast dims into the orders⨝lineitem
    # spine + 3-key agg + sort.
    "t19_nation_volume": (0, 0, 9, 5),
    # t20: Q8's 8-table spine — region→nation→customer, part, and
    # supplier→nation chains ALL collapse to broadcasts (7 BHJs); the
    # only data-sized exchanges are the orders⨝lineitem spine and the
    # 2-group year agg + sort.
    "t20_market_share": (0, 0, 11, 7),
    # t21: Q9 shape — name-pruned part and supplier⨝nation broadcast
    # into lineitem, orders on the spine, 2-key agg + sort.
    "t21_product_profit": (0, 0, 8, 4),
    # t22: Q6 shape — all predicates pushed to the one lineitem scan
    # (widen repartition + single-partition agg exchange).
    "t22_revenue_change": (0, 0, 2, 0),
    # x05 (r15 one-shingle-pass): the shingle table is built behind ONE
    # repartition exchange that the signature/band sides AND both verify
    # attach sides consume (runtime ReusedExchange); the cold plan
    # PRINTS that subtree once per consumer (10 → 12 Exchange strings)
    # but executes the shingle pass once instead of three times —
    # measured 15 stages → 18 AQE stage materializations and warm wall
    # 4.3 s → 3.3 s under identical load, and x18/x22 (which embed this
    # operator) dropped 8.4 → 2.9 s / 15.2 → 6.7 s.
    "x05_minhash_near_dups": (0, 0, 12, 3),
    "x08_simhash_near_dups": (0, 0, 4, 1),
    "x09_text_profile": (0, 0, 1, 0),
    "x13_cosine_join": (0, 0, 6, 3),
    # x13b: auto-planes default path — same candidate-join shape as x13
    # minus the precomputed-banded-frame reuse (signatures derived inline
    # on both sides of the self-join, deduped by ReuseExchange).
    "x13b_cosine_join_scaled": (0, 0, 6, 3),
    "x14_ann_ivf": (1, 0, 3, 0),  # 1-row probe attach (intended)
    # x41 (r11): batch probe over the PERSISTED ANN store — cell-pruned
    # scan (static isin over the hive layout) → (ivf_cell, id) replay
    # fold (1 agg exchange) → broadcast probe-cell equi-join (the BHJ)
    # → two-level top-k (2 window exchanges) + the fold's pair.  Zero
    # python nodes; the store build itself is cached per session
    # (ingest cost, not probe cost).
    "x41_ann_store_topk": (0, 0, 4, 1),
    "x15_media_metadata": (0, 1, 0, 0),  # Arrow mapInPandas boundary
    "x17_rolling_fingerprint": (0, 0, 0, 0),
    "x18_near_dup_clusters": (0, 0, 2, 0),
    "x20_pack_shards": (0, 0, 4, 1),
    "x22_training_shards": (0, 0, 4, 1),
    # x28 (r7 hash pre-pass; r9 AQE-gated survivor semi-join): widen →
    # winnow fps (narrow) → windowed fp count → candidate-doc semi-join
    # (persisted cand ids) → long-keyed xxhash64(span) count (the
    # survivor set — r9: no persist/count job; AQE converts the
    # semi-join from runtime bytes) → span-keyed group + in-group pair
    # expansion.  r8's pin was 28: the persisted survivor subtree
    # printed its AQE final AND initial plan and the dedicated count
    # job replanted the pipeline; dropping the manual gate halves the
    # printed exchanges (28 → 13) and removes a Spark job per call.
    "x28_duplicate_spans": (0, 0, 13, 3),
    # x29 (r7 hash-keyed; r9 AQE-gated): widen → long-keyed
    # xxhash64(span) df count (survivor set, unpersisted) → survivor
    # semi-filter (AQE decides broadcast) → survivor-sized span recount.
    # The corpus-wide exchange carries 8-byte longs, never raw spans.
    "x29_boilerplate_spans": (0, 0, 5, 1),
    "x27_hll_daily_uniques": (0, 0, 2, 0),
    # x32 (r8; r9 AQE-gated): line-level dedup, same hash-keyed two-pass
    # shape as x29 — corpus-wide exchange carries longs, AQE survivor
    # semi-filter, line-keyed recount.
    "x32_duplicate_lines": (0, 0, 5, 1),
    # x34 (r8; r13 one-pass re-check): Bloom-prefiltered incremental
    # dedup — fingerprint store build (agg exchange), Bloom word build
    # (bit_or agg), dense bitset compaction (range join + single-row
    # agg), then ONE conditional left join (__maybe AND fp==store_fp —
    # the equi key drives the strategy, the residual spares every
    # Bloom-negative row a store lookup).  The former fresh/suspect
    # split re-executed the scan+probe lineage per branch (2 BNLJ / 13
    # exchanges); the single lineage pins 1 BNLJ (one bitset attach) /
    # 8 exchanges, and the trailing dropDuplicates reuses the join's
    # fp partitioning.  Zero python nodes.
    "x34_bloom_incremental_dedup": (1, 0, 8, 2),
    # x35 (r8): BM25 keyword top-k — postings/doc-length/df aggs, the
    # tiny query-term and df frames broadcast (3+ BHJs), the one-row
    # (n_docs, avgdl) stats frame is the pinned BNLJ attach, per-query
    # row_number window.  Zero python nodes.  +2 exchanges vs the first
    # r8 pin: the df aggregate now semi-joins postings to the query term
    # set BEFORE aggregating (a full-vocabulary df table is corpus-sized
    # and must never be built or broadcast per search) — the pruning
    # join's exchange pair is the price of a match-sized broadcast.
    "x35_bm25_search": (1, 0, 14, 3),
    # x36 (r8): SemDeDup on the given label clustering — widen
    # repartition, the two centroid-mean aggs ((label,pos) then label),
    # the broadcast centroid attach, the rank-window exchange, the
    # per-cluster scan's group exchange, the final sort.  Exactly one
    # python node: the blocked-numpy upper-triangular scan
    # (applyInPandas), the op's sanctioned Arrow boundary.
    "x36_semdedup": (0, 1, 7, 1),
    # x37 (r8): hybrid BM25+dense retrieval — the 2 pinned BNLJs are the
    # BM25 one-row (n_docs, avgdl) stats attach and the dense side's
    # broadcast probe cross-join (exact batch scoring IS |probes| x
    # |corpus| by definition; the ANN paths are the sublinear variants).
    # Query-term / df / probe frames broadcast (4 BHJs); the RRF fusion
    # works on match-sized frames only.  Zero python nodes.  +3
    # exchanges vs the first r8 pin: the BM25 df prune (+2, see x35) and
    # the dense side's two-level top-k (+1) — the per-query window alone
    # would sort the whole scored corpus in |probes| single tasks, so a
    # (query, scan-partition) pre-rank spreads the sort and the final
    # window ranks only |partitions|·k survivors.
    "x37_hybrid_search": (2, 0, 19, 4),
    # x37b (r12; r13 fully store-backed; r16 statistics sidecars): the
    # composed persisted-store retrieval path — the dense side is the
    # ANN store probe (replay fold agg + broadcast probe-cell equi-join
    # over the STATICALLY cell-pruned scan: the probes' cell union
    # reaches the store scan as PartitionFilters INSET, pinned both in
    # test_ann_store.py and on this fused plan below) + the BM25 side
    # reading the persisted postings/doc_lens stores (no corpus
    # tokenization at query time) + RRF fusion.  r16: (n_docs, avgdl)
    # resolve to LITERALS from the per-batch stats sidecar (the former
    # one-row stats attach — a BNLJ + broadcast + doc_lens stats
    # scan/fold/global-agg — is gone: BNLJ 1→0) and per-term df folds
    # from the tiny term_df sidecar instead of aggregating the query
    # terms' posting lists (18→14 exchanges, parquet scans 5→4 with
    # corpus-sized scans 4→2 — plans/r16/x37b_*_{before,after}.txt).
    "x37b_hybrid_search_ann": (0, 0, 14, 5),
    # q32b (r11; r12 single-scan rewrite): the registered q32's
    # scale-path twin — both value columns melted to (metric, v) long
    # format so ONE lineitem scan feeds the whole query.  Widen
    # repartition → distinct-value hist agg (partial+final pair) → one
    # Window node carrying BOTH the cumulative count and the group
    # total (shared sort) → the percentile-literal broadcast cross
    # (the 1 BNLJ: a constant |ps|-row side — intended) → the
    # interpolation agg + final pivot agg.  Zero python nodes; the
    # former 17-exchange / 2-BNLJ shape paid four corpus scans (two
    # operator calls × a totals branch re-executing lineage each).
    "q32b_percentile_hist": (1, 0, 5, 0),
    # x43 (r12): the one-scan curation funnel — benchmark shingle-set
    # distinct (1 exchange) + its broadcast (1) + per-doc flag/overlap
    # groupBy (1) + the one-row global agg (1); the only join is the
    # broadcast shingle probe, zero Python.
    "x43_curation_funnel": (0, 0, 4, 1),
}

# Unpartitioned Window nodes (the WindowExec "No Partition Defined"
# warnings in the bench tail) pinned EXACTLY per query, so an accidental
# all-data single-partition window can never hide among the intended ones.
# The two that exist are the shard-packing prefix-sum over the bounded
# #partitions-row per-partition-offsets frame (operators/sampling.py pack
# path) — ≤ spark.sql.shuffle.partitions rows by construction, documented
# there.  Every other corpus query must have zero.
UNPART_WINDOWS: dict[str, int] = {
    "x20_pack_shards": 1,
    "x22_training_shards": 1,
}


def _toplevel_groups(s: str) -> list[str]:
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            continue
        if depth > 0:
            buf.append(ch)
    return groups


def _unpartitioned_windows(plan: str) -> int:
    """Window nodes with no partition-spec group.  The printed forms:
    ``[exprs], [part], [order]`` (3 groups — partitioned);
    ``[exprs], [part]`` (partitioned, no ordering);
    ``[exprs], [order]`` (UNPARTITIONED — the order group carries
    ASC/DESC tokens, which a partition-column list never does);
    ``[exprs]`` (unpartitioned global)."""
    import re

    n = 0
    for line in plan.splitlines():
        if "WindowGroupLimit" in line:
            continue
        m = re.search(r"(?:^|[\s:+-])Window (.*)", line)
        if not m:
            continue
        groups = _toplevel_groups(m.group(1))
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(r" (ASC|DESC)\b", groups[1]):
            continue  # partitioned, no ordering spec
        n += 1
    return n


@pytest.fixture(scope="module")
def registry():
    import jurimetria_etl_spark.plans.extensions as E
    from jurimetria_etl_spark.plans.corpus import (
        CORPUS_DEREGISTERED,
        full_registry,
    )
    from jurimetria_etl_spark.plans.extensions import (
        BENCH_ONLY,
        EXT_DEREGISTERED,
    )
    from jurimetria_etl_spark.plans.tpch import TPCH_EXTRA

    # The exchange pins below are for the COLD plan.  Other test modules
    # sharing this session may have populated the plan-level signature
    # caches (persisted frames), which legitimately replace an exchange
    # with an InMemoryRelation and would make the pins order-dependent —
    # start from a known cache state instead.
    for cache in (E._SIMHASH_SIG_CACHE, E._LSH_BANDED_CACHE, E._IVF_CACHE):
        for v in cache.values():
            try:
                (v[0] if isinstance(v, tuple) else v).unpersist()
            except Exception:
                pass
        cache.clear()
    # Same merge bench.py uses: deregistered forms stay on the bench, so
    # their plan contracts stay pinned too.
    return {
        **CORPUS_DEREGISTERED,
        **EXT_DEREGISTERED,
        **full_registry(),
        **BENCH_ONLY,
        **TPCH_EXTRA,
    }


def test_every_bench_query_has_a_pinned_expectation():
    # a new bench query must come with a plan contract
    assert set(HEADLINE) == set(EXPECT)


@pytest.mark.parametrize("name", sorted(EXPECT))
def test_bench_plan_shape(spark, registry, name):
    max_bnlj, allowed_py, exact_ex, min_bhj = EXPECT[name]
    plan = (
        registry[name]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("CartesianProduct") == 0, f"{name}: cartesian product"
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj <= max_bnlj, f"{name}: {bnlj} nested-loop joins (max {max_bnlj})"
    py = (
        plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
    )
    assert py <= allowed_py, f"{name}: {py} python nodes (allowed {allowed_py})"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    ex = plan.count("Exchange")
    assert ex == exact_ex, f"{name}: {ex} exchanges, pinned {exact_ex}"
    bhj = plan.count("BroadcastHashJoin")
    assert bhj >= min_bhj, f"{name}: {bhj} broadcast joins (need >= {min_bhj})"
    uw = _unpartitioned_windows(plan)
    want_uw = UNPART_WINDOWS.get(name, 0)
    assert uw == want_uw, (
        f"{name}: {uw} unpartitioned Window nodes, pinned {want_uw} — an "
        "unbounded single-partition window is a scale-killer"
    )


@pytest.mark.parametrize(
    "name", ["x41_ann_store_topk", "x37b_hybrid_search_ann"]
)
def test_ann_store_scan_cell_pruned_in_fused_plan(spark, registry, name):
    """The probes' static cell union must reach the ANN-store scan as a
    PARTITION filter inside the FUSED executed plan — not just on the
    isolated probe path (tests/test_ann_store.py pins that).  The r12
    audit artifact could not evidence this for x37b because the store
    scan sat below the head-trim; this pin makes the composed-plan
    claim mechanical (r12 verdict task 2)."""
    import re

    plan = (
        registry[name]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    store_filters = [
        m
        for ln in plan.splitlines()
        if "FileScan" in ln and "ivf_cell" in ln
        for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", ln)
    ]
    assert store_filters, f"{name}: no ANN-store FileScan in the fused plan"
    assert any(
        "ivf_cell" in f and ("INSET" in f or " IN " in f)
        for f in store_filters
    ), (
        f"{name}: store scan not cell-pruned — PartitionFilters were "
        f"{store_filters}"
    )
