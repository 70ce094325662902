"""Property-based tests (hypothesis) for the semantics that are easiest to
silently get wrong (SURVEY §7 hard parts): the NULL-passing date filter,
as-of join vs a pure-Python reference model, and shingle arithmetic.

Examples are kept small and few — each example round-trips through Spark.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.dedup import word_shingles
from jurimetria_etl_spark.operators.filters import date_range_null_pass
from jurimetria_etl_spark.operators.joins import asof_join

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TS = st.one_of(
    st.none(),
    st.datetimes(
        min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2030, 1, 1)
    ),
)


@SETTINGS
@given(st.lists(_TS, min_size=0, max_size=12))
def test_null_rows_always_pass_date_filter(spark, values):
    # W1 (reference jurimetria_pipeline.py:208-215): NULL dates survive ANY
    # bounds — the opposite of SQL comparison semantics.
    df = spark.createDataFrame([(v,) for v in values], "d timestamp")
    pred = date_range_null_pass(
        "d",
        F.lit("2010-01-01").cast("timestamp"),
        F.lit("2020-01-01").cast("timestamp"),
    )
    kept = [r["d"] for r in df.where(pred).collect()]
    assert kept.count(None) == values.count(None)
    lo, hi = dt.datetime(2010, 1, 1), dt.datetime(2020, 1, 1)
    assert sorted(k for k in kept if k is not None) == sorted(
        v for v in values if v is not None and lo <= v <= hi
    )


_KEY = st.integers(min_value=0, max_value=2)
_T = st.integers(min_value=0, max_value=50)


@SETTINGS
@given(
    st.lists(st.tuples(_KEY, _T), min_size=1, max_size=10),
    st.lists(st.tuples(_KEY, _T, st.integers(0, 99)), min_size=0, max_size=10),
)
def test_asof_join_matches_reference_model(spark, left_rows, right_rows):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=t), i) for i, (k, t) in enumerate(left_rows)],
        "k int, ts timestamp, row_id int",
    )
    right = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=t), v) for k, t, v in right_rows],
        "k int, ts timestamp, v int",
    ) if right_rows else spark.createDataFrame([], "k int, ts timestamp, v int")

    got = {
        r["row_id"]: r["v"]
        for r in asof_join(left, right, on="k", right_cols=["v"]).collect()
    }

    # reference model: latest right (k, t') with t' <= t; ties on t' → max v
    # (the operator's documented max-payload tiebreak)
    for i, (k, t) in enumerate(left_rows):
        matches = [(rt, v) for rk, rt, v in right_rows if rk == k and rt <= t]
        expected = max(matches)[1] if matches else None
        assert got[i] == expected, (i, k, t, matches)


@SETTINGS
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=12
    )
)
def test_shingle_count_bound(spark, words):
    # |distinct n-shingles| ∈ [min(1, max_windows), max_windows] where
    # max_windows = max(0, n_words - 2) for trigrams; and short docs yield []
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    sh = df.select(word_shingles("text", 3).alias("s")).first()["s"]
    n_words = len(text.split(" ")) if text else 1  # split("") → [""]
    max_windows = max(0, n_words - 2)
    assert len(sh) <= max_windows
    if max_windows > 0:
        assert len(sh) >= 1
    assert len(sh) == len(set(sh))


_KV = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=12
)


@SETTINGS
@given(_KV, _KV, st.sampled_from(["inner", "left", "left_semi", "left_anti"]))
def test_salted_join_equals_plain_join(spark, left_rows, right_rows, how):
    """Salting is a physical-layout change only: for every supported `how`
    and any (skewed, duplicated, empty) inputs, the salted join is
    row-for-row identical to the plain join."""
    from jurimetria_etl_spark.operators.joins import salted_join

    left = spark.createDataFrame(left_rows or [(0, 0)], "k int, lv int")
    right = spark.createDataFrame(right_rows or [(0, 0)], "k int, rv int")
    if not left_rows:
        left = left.limit(0)
    if not right_rows:
        right = right.limit(0)
    got = salted_join(left, right, on="k", n_salts=3, how=how)
    want = left.join(right, "k", how)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@SETTINGS
@given(st.lists(st.sampled_from(["aa bb cc", "dd ee ff", "aa  bb  cc"]), min_size=1, max_size=8))
def test_dedup_by_fingerprint_idempotent(spark, texts):
    """dedup ∘ dedup == dedup, and survivors' normalized texts are unique."""
    from jurimetria_etl_spark.operators.dedup import dedup_by_fingerprint, fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = dedup_by_fingerprint(df, "text", "doc_id")
    twice = dedup_by_fingerprint(once, "text", "doc_id")
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))
    fps = [r["fp"] for r in once.select(fingerprint("text").alias("fp")).collect()]
    assert len(fps) == len(set(fps))


@SETTINGS
@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=25),
    st.integers(min_value=100, max_value=3000),
)
def test_pack_into_shards_matches_python_reference(spark, token_counts, max_tokens):
    # sequential-fill model: doc at exclusive running total T lands in
    # shard floor(T / max); the two-phase prefix sum must reproduce it for
    # ANY token distribution and budget
    from jurimetria_etl_spark.operators.sampling import pack_into_shards

    rows = [(i, t) for i, t in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_into_shards(df, "n_tok", "doc_id", max_tokens).collect()
    }
    run = 0
    expect = {}
    for i, t in rows:
        expect[i] = run // max_tokens
        run += t
    assert got == expect


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    st.integers(min_value=2, max_value=8),
)
def test_frequent_items_mg_guarantee_random(spark, values, k):
    """Misra-Gries superset guarantee on arbitrary distributions: every
    value with frequency > N/(k+1) appears in the output, and recounted
    counts are exact — independent of partitioning."""
    from collections import Counter

    from jurimetria_etl_spark.operators.sketches import frequent_items

    df = spark.createDataFrame(
        [(v,) for v in values], "item_src int"
    ).repartition(4)
    got = {
        r["item"]: r["cnt"]
        for r in frequent_items(df, "item_src", k=k).collect()
    }
    exact = Counter(values)
    n = len(values)
    for v, c in exact.items():
        if c > n / (k + 1):
            assert v in got
    for v, c in got.items():
        assert c == exact[v]


@SETTINGS
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=4, max_value=12),
)
def test_duplicate_spans_equals_python_bruteforce(spark, texts, span_len):
    """duplicate_spans == the pure-Python all-L-grams model on arbitrary
    small corpora (3-letter alphabet maximizes collisions): the winnowing
    candidate stage must be lossless and the verify stage exact, for
    every (corpus, span_len, k) — not just the planted fixtures."""
    from jurimetria_etl_spark.operators.spans import duplicate_spans

    k = min(3, span_len - 1)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        (r.left_id, r.right_id, r.span)
        for r in duplicate_spans(
            df, span_len=span_len, k=k, max_fp_df=None
        ).collect()
    }
    grams = [
        {t[i : i + span_len] for i in range(len(t) - span_len + 1)}
        for t in texts
    ]
    want = {
        (i, j, s)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        for s in grams[i] & grams[j]
    }
    assert got == want


@SETTINGS
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=50), min_size=1, max_size=4),
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=50), min_size=1, max_size=4),
    st.integers(min_value=4, max_value=10),
)
def test_duplicate_spans_against_equals_python_model(
    spark, left_texts, right_texts, span_len
):
    """Cross-corpus duplicate spans == the pure-Python cross L-gram model
    on arbitrary small corpora — exercises the shared-fp candidacy, the
    hash intersection pre-filter, and the exact verify join for every
    (corpora, span_len, k)."""
    from jurimetria_etl_spark.operators.spans import duplicate_spans_against

    k = min(3, span_len - 1)
    left = spark.createDataFrame(
        list(enumerate(left_texts)), "doc_id bigint, text string"
    )
    right = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(right_texts)],
        "doc_id bigint, text string",
    )
    got = {
        (r.left_id, r.right_id, r.span)
        for r in duplicate_spans_against(
            left, right, span_len=span_len, k=k, max_fp_df=None
        ).collect()
    }
    lg = [
        {t[i : i + span_len] for i in range(len(t) - span_len + 1)}
        for t in left_texts
    ]
    rg = [
        {t[i : i + span_len] for i in range(len(t) - span_len + 1)}
        for t in right_texts
    ]
    want = {
        (i, 100 + j, s)
        for i in range(len(left_texts))
        for j in range(len(right_texts))
        for s in lg[i] & rg[j]
    }
    assert got == want


@SETTINGS
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=60), min_size=1, max_size=5),
    st.integers(min_value=3, max_value=8),
    st.integers(min_value=2, max_value=3),
)
def test_boilerplate_spans_equals_python_model(spark, texts, span_len, min_df):
    """boilerplate_spans == exact per-span distinct-document counts —
    the hash pre-aggregation (collision superset + exact recount) must
    be invisible for every (corpus, span_len, min_df)."""
    from collections import Counter

    from jurimetria_etl_spark.operators.spans import boilerplate_spans

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        (r.span, r.n_docs)
        for r in boilerplate_spans(df, span_len=span_len, min_df=min_df).collect()
    }
    counts = Counter()
    for t in texts:
        for s in {t[i : i + span_len] for i in range(len(t) - span_len + 1)}:
            counts[s] += 1
    want = {(s, c) for s, c in counts.items() if c >= min_df}
    assert got == want


@SETTINGS
@given(
    st.lists(st.text(alphabet="abc", min_size=0, max_size=40), min_size=1, max_size=4),
    st.lists(st.text(alphabet="abc", min_size=4, max_size=4), min_size=0, max_size=5),
)
def test_strip_bulk_equals_python_scan(spark, texts, spans):
    """strip_boilerplate_bulk == the leftmost-non-overlapping single-pass
    reference scan, for every (corpus, span set) — the broadcast-set
    mapInPandas implementation must match its own documented contract."""
    from jurimetria_etl_spark.operators.spans import strip_boilerplate_bulk

    L = 4
    span_set = set(spans)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    sdf = spark.createDataFrame([(s,) for s in span_set], "span string")

    def ref(t, extend):
        out, i, last = [], 0, 0
        n = len(t)
        while i <= n - L:
            if t[i : i + L] in span_set:
                end = i + L
                if extend:
                    j = i + 1
                    while j <= n - L and t[j : j + L] in span_set:
                        j += 1
                    end = j - 1 + L
                out.append(t[last:i])
                i = end
                last = end
            else:
                i += 1
        out.append(t[last:])
        return "".join(out)

    for extend in (True, False):
        got = {
            r.doc_id: r.clean_text
            for r in strip_boilerplate_bulk(
                docs, sdf, span_len=L, extend_runs=extend
            ).collect()
        }
        assert got == {i: ref(t, extend) for i, t in enumerate(texts)}


@SETTINGS
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcdefghijkl ", min_size=0, max_size=20),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=2, max_value=3),
    st.integers(min_value=0, max_value=8),
)
def test_duplicate_lines_equals_python_model(
    spark, docs_lines, min_df, min_chars
):
    """duplicate_lines == exact distinct-document counts per qualifying
    line, and strip_duplicate_lines == the python line filter — for
    arbitrary small corpora (the hash pre-aggregation and the broadcast
    strip set must both be invisible)."""
    from collections import Counter

    from jurimetria_etl_spark.operators.spans import (
        duplicate_lines,
        strip_duplicate_lines,
    )

    texts = ["\n".join(ls) for ls in docs_lines]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        (r.line, r.n_docs)
        for r in duplicate_lines(
            df, min_df=min_df, min_line_chars=min_chars
        ).collect()
    }
    counts = Counter()
    for t in texts:
        for l in {x for x in t.split("\n") if len(x.strip()) >= min_chars}:
            counts[l] += 1
    want = {(l, c) for l, c in counts.items() if c >= min_df}
    assert got == want

    listed = {l for l, _ in want}
    stripped = {
        r.doc_id: r.clean_text
        for r in strip_duplicate_lines(
            df, duplicate_lines(df, min_df=min_df, min_line_chars=min_chars)
        ).collect()
    }
    ref = {
        i: "\n".join(x for x in t.split("\n") if x not in listed)
        for i, t in enumerate(texts)
    }
    assert stripped == ref


@SETTINGS
@given(
    st.lists(st.text(alphabet="abcd", min_size=0, max_size=120), min_size=1, max_size=6),
    st.lists(st.text(alphabet="abcd", min_size=5, max_size=5), min_size=0, max_size=8),
    st.booleans(),
)
def test_span_stripper_prefilter_parity(texts, spans, extend):
    """The r8 rolling-hash prefilter (vectorized uint64 window hashes,
    exact-superset candidate mask) must be OUTPUT-invisible: the
    prefiltered scanner equals the naive per-window scan for every
    (text, span set, extend_runs) — including hash-miss-only texts,
    runs, and abutting matches."""
    from jurimetria_etl_spark.operators.spans import _span_stripper

    span_set = frozenset(spans)
    fast = _span_stripper(span_set, 5, extend, prefilter=True)
    slow = _span_stripper(span_set, 5, extend, prefilter=False)
    for t in texts:
        assert fast(t) == slow(t)
