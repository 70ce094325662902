"""Property tests for the session fold (streaming/sessions.py) — the pure
function both streaming implementations share.  No Spark needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from jurimetria_etl_spark.streaming.sessions import _fold_sessions

GAP = 1_000_000  # 1s in us

events = st.lists(
    st.tuples(st.integers(0, 50_000_000), st.floats(0, 100, allow_nan=False)),
    min_size=1,
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(events)
def test_fold_partitions_events_with_gap_invariants(pairs):
    sessions = _fold_sessions(pairs, None, GAP)
    # counts and totals are conserved
    assert sum(int(s[2]) for s in sessions) == len(pairs)
    assert abs(sum(s[3] for s in sessions) - sum(v for _, v in pairs)) < 1e-6
    ts = sorted(t for t, _ in pairs)
    # session spans cover the data, ordered, non-overlapping, gap-separated
    assert sessions[0][0] == ts[0] and sessions[-1][1] == ts[-1]
    for s in sessions:
        assert s[0] <= s[1]
    for a, b in zip(sessions, sessions[1:]):
        assert b[0] - a[1] > GAP  # split only where a real gap exists
    # no internal gap: every event belongs to the session containing it
    bounds = [(s[0], s[1]) for s in sessions]
    for t in ts:
        assert any(lo <= t <= hi for lo, hi in bounds)


def test_late_event_before_seed_splits_not_merges():
    """An event more than gap BEFORE the open session's start must form
    its own (closed) session — batch session_window splits there; the
    pre-fix fold merged it into the seed and emitted a wrong span."""
    seed = (100 * GAP, 100 * GAP, 1, 5.0)
    out = _fold_sessions([(50 * GAP, 1.0)], seed, GAP)
    assert [(int(s[0]), int(s[1]), int(s[2]), s[3]) for s in out] == [
        (50 * GAP, 50 * GAP, 1, 1.0),
        (100 * GAP, 100 * GAP, 1, 5.0),
    ]
    # adjacent-to-seed events still extend it
    out2 = _fold_sessions([(100 * GAP + GAP // 2, 1.0)], seed, GAP)
    assert len(out2) == 1 and out2[0][2] == 2


@settings(max_examples=100, deadline=None)
@given(events, events)
def test_fold_incremental_equals_batch(first, second):
    """Folding batch1 then batch2 seeded with batch1's open tail must give
    the same sessions as folding the union — PROVIDED batch2 starts at or
    after batch1's max (the chronological-arrival contract)."""
    hi1 = max(t for t, _ in first)
    shifted = [(t + hi1, v) for t, v in second]  # force chronology
    all_at_once = _fold_sessions(first + shifted, None, GAP)

    s1 = _fold_sessions(first, None, GAP)
    open_tail = tuple(s1.pop())
    s2 = _fold_sessions(shifted, open_tail, GAP)
    recombined = s1 + s2
    assert [
        (int(a), int(b), int(n), round(t, 6)) for a, b, n, t in all_at_once
    ] == [(int(a), int(b), int(n), round(t, 6)) for a, b, n, t in recombined]