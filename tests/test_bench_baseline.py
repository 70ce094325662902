"""bench.py warm-delta baseline bookkeeping (`_advance_warm_baseline`) —
the two r10 ADVICE failure modes, pinned:

1. An off-SF smoke run must not evict the on-SF warm series as a
   baseline candidate (per-SF slots).
2. A same-round re-run must not advance the baseline to its own round's
   earlier series (round-pinned slot advance)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _advance_warm_baseline  # noqa: E402

W_R1 = {"q1": 1.0, "q2": 2.0}
W_R2 = {"q1": 1.1, "q2": 3.5}  # q2 drifted 1.75x -> must flag


def _detail(by_sf, **kw):
    d = {"warm_queries_by_sf": by_sf}
    d.update(kw)
    return d


def test_cross_round_advance_and_flagging():
    prev = _detail({"0.1": {"round": 1, "warm_queries": W_R1}})
    by_sf, base, base_round, base_sf, delta, flagged = _advance_warm_baseline(
        prev, 2, 0.1, W_R2
    )
    assert base == W_R1 and base_round == 1 and base_sf == 0.1
    assert delta == {"q1": 1.1, "q2": 1.75}
    assert flagged == {"q2": 1.75}
    assert by_sf["0.1"] == {"round": 2, "warm_queries": W_R2}


def test_same_round_rerun_keeps_baseline():
    """Second run in the same round: the slot's round == cur_round, so
    the baseline must NOT advance to this round's own earlier series."""
    prev = _detail(
        {"0.1": {"round": 2, "warm_queries": W_R2}},
        baseline_warm_queries=W_R1,
        baseline_round=1,
        baseline_sf=0.1,
    )
    w3 = {"q1": 1.0, "q2": 2.1}
    _, base, base_round, base_sf, delta, _ = _advance_warm_baseline(
        prev, 2, 0.1, w3
    )
    assert base == W_R1 and base_round == 1  # still round 1, not W_R2
    assert delta["q2"] == 1.05


def test_off_sf_smoke_run_does_not_evict_on_sf_slot():
    """r10 ADVICE #4: a smoke run at sf0.01 must leave the sf0.1 slot
    intact so the next round's on-SF run still sees it as baseline."""
    prev = _detail({"0.1": {"round": 1, "warm_queries": W_R1}})
    # the smoke run at another SF, same round
    by_sf, _, _, base_sf, delta, _ = _advance_warm_baseline(
        prev, 1, 0.01, {"q1": 0.2}
    )
    assert by_sf["0.1"] == {"round": 1, "warm_queries": W_R1}  # survives
    assert delta == {}  # no cross-SF comparison
    # next round at the on-SF tier: baseline comes from the preserved slot
    prev2 = _detail(by_sf)
    _, base, base_round, base_sf, delta2, _ = _advance_warm_baseline(
        prev2, 2, 0.1, W_R2
    )
    assert base == W_R1 and base_round == 1 and base_sf == 0.1
    assert delta2["q2"] == 1.75


def test_legacy_single_slot_artifact_folds_in():
    prev = {"warm_queries": W_R1, "round": 1, "sf": 0.1}
    _, base, base_round, base_sf, delta, _ = _advance_warm_baseline(
        prev, 2, 0.1, W_R2
    )
    assert base == W_R1 and base_round == 1 and base_sf == 0.1
    assert delta["q2"] == 1.75


def test_first_run_has_no_baseline():
    by_sf, base, base_round, base_sf, delta, flagged = _advance_warm_baseline(
        {}, 1, 0.1, W_R1
    )
    assert base == {} and base_round is None and delta == {} and not flagged
    assert by_sf["0.1"]["warm_queries"] == W_R1
