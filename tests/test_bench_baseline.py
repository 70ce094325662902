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


def test_shed_to_fit_prefers_queries_over_flag_detail():
    """The stdout guard's shedding ladder: a full-corpus summary that
    overflows the driver tail limit keeps the per-query map (at reduced
    precision) and sheds the worst-mover flag string first; only when
    even that overflows does the map collapse to the detail pointer."""
    import json

    from bench import shed_to_fit

    # 18-char names ≈ the real corpus's average; sized so the 3-decimal
    # line overflows 1900, 2-decimal alone still overflows, and shedding
    # the worst-mover string brings it under — the exact r12 ladder
    timings = {f"x{i:02d}_query_name_abc": 1.234 for i in range(58)}

    def summary():
        return {
            "metric": "headline_queries_wall_clock",
            "value": 93.841,
            "unit": "sec",
            "queries": dict(timings),
            "sf": 0.1,
            "n_queries": 58,
            "warm_total_sec": 60.638,
            "duckdb_total_sec": 41.929,
            "warm_vs_duckdb_ratio": 1.446,
            "sf1_source": "artifact:BENCH_SF1.json",
            "sf1_warm_total_sec": 114.409,
            "sf1_duckdb_total_sec": 224.897,
            "sf1_warm_vs_duckdb_ratio": 0.509,
            "loadavg1m": [0.26, 9.4],
            "warm_delta_flagged": 19,
            "warm_delta_worst": "x08_simhash_near_dups:0.43",
        }

    # the exact r12 shape that used to lose the map: 3-decimal overflow,
    # 2-decimal + flag-shed fits
    out = json.loads(shed_to_fit(summary(), timings, limit=1900))
    assert len(out["queries"]) == 58, "per-query map must survive"
    assert out["queries"]["x00_query_name_abc"] == 1.23
    assert "warm_delta_worst" not in out  # the flag string was shed
    assert "warm_delta_flagged" in out  # the count stays
    # a small line passes through untouched (full precision, flags kept)
    small_t = {"q1": 1.234}
    s = summary()
    s["queries"] = dict(small_t)
    out2 = json.loads(shed_to_fit(s, small_t, limit=1900))
    assert out2["queries"]["q1"] == 1.234 and "warm_delta_worst" in out2
    # an impossible limit still degrades to the detail pointer
    out3 = json.loads(shed_to_fit(summary(), timings, limit=300))
    assert out3["queries"] == {} and out3["detail_file"] == "BENCH_DETAIL.json"


def test_remeasure_flagged_waits_for_quiet_then_separates_noise():
    """r13 task 3 + r14 task 2: the quiet-window pass must (a) gate each
    re-measure on observed loadavg < quiet_thresh (bounded), (b) re-run
    only the flagged queries, and (c) mark deltas that evaporate under
    quiet load as cleared while confirming genuinely regressed ones —
    with the quiet loadavg recorded per attempt."""
    from bench import remeasure_flagged

    # load decays 12 -> 8 -> quiet (1.5); sleep calls are recorded
    seq = iter([12.0, 8.0])
    slept = []
    # baseline warm 1.0s each; under quiet load q_noise is back to 1.05
    # (phantom) while q_real still takes 2.0 (code-attributable)
    quiet_warm = {"q_noise": 1.05, "q_real": 2.0}
    calls = []

    def run(name):
        calls.append(name)
        return quiet_warm[name]

    out = remeasure_flagged(
        flagged={"q_noise": 5.78, "q_real": 2.1},
        base_warm={"q_noise": 1.0, "q_real": 1.0},
        run_query=run,
        get_load1m=lambda: next(seq, 1.5),
        sleep=slept.append,
        quiet_thresh=2.0,
    )
    assert slept == [10.0, 10.0]  # waited exactly until load < thresh
    assert sorted(set(calls)) == ["q_noise", "q_real"]
    assert len(calls) == 6  # 3 passes each, flagged queries only
    assert out["q_noise"]["outcome"] == "cleared"
    assert out["q_noise"]["still_flagged"] is False
    assert out["q_noise"]["still_regressed"] is False
    assert out["q_noise"]["measured_quiet"] is True
    assert out["q_noise"]["delta_vs_prev"] == 1.05
    assert out["q_noise"]["first_pass_delta"] == 5.78
    assert out["q_noise"]["attempts"][0]["waited_sec"] == 20.0
    assert out["q_noise"]["attempts"][0]["loadavg_before"] == 1.5
    assert out["q_real"]["outcome"] == "confirmed_regressed_quiet"
    assert out["q_real"]["still_flagged"] is True
    assert out["q_real"]["still_regressed"] is True
    assert out["q_real"]["still_improved"] is False
    assert out["q_real"]["delta_vs_prev"] == 2.0


def test_remeasure_flagged_quiet_wait_is_bounded():
    """A host that never quiets must not stall the bench: the wait gives
    up at quiet_budget_sec and measures anyway — and a CLEAR observed
    under load still clears (contention only inflates, never deflates,
    so fast-despite-load is decisive)."""
    from bench import remeasure_flagged

    slept = []
    out = remeasure_flagged(
        flagged={"q": 3.0},
        base_warm={"q": 1.0},
        run_query=lambda name: 1.0,
        get_load1m=lambda: 99.0,
        sleep=slept.append,
        quiet_budget_sec=30.0,
    )
    assert sum(slept) == 30.0
    assert out["q"]["warm"] == 1.0 and out["q"]["still_flagged"] is False
    assert out["q"]["still_regressed"] is False
    assert out["q"]["outcome"] == "cleared"
    assert out["q"]["measured_quiet"] is False


def test_remeasure_regression_under_load_is_unconfirmed():
    """The r14 x22 failure mode: a regression whose only measurement ran
    under load must read unconfirmed_no_quiet_window, never
    still_regressed — a flag confirmed at loadavg 9.16 is not
    confirmed."""
    from bench import remeasure_flagged

    out = remeasure_flagged(
        flagged={"q": 3.0},
        base_warm={"q": 10.0},
        run_query=lambda name: 30.0,
        get_load1m=lambda: 9.16,
        sleep=lambda s: None,
        quiet_budget_sec=30.0,
    )
    assert out["q"]["outcome"] == "unconfirmed_no_quiet_window"
    assert out["q"]["still_regressed"] is False
    assert out["q"]["measured_quiet"] is False
    assert out["q"]["delta_vs_prev"] == 3.0  # the data is still recorded


def test_remeasure_retries_when_wave_arrives_mid_series():
    """Quiet at the gate but a wave inflating the pass series is not a
    quiet measurement: the spread of the series itself is the wave
    detector (the POST-series loadavg cannot be — the measured query's
    own 32-thread work raises it on any multi-second query), and the
    protocol retries (bounded) keeping the attempt that ran stable."""
    from bench import remeasure_flagged

    # attempt 1: series inflates 2.0 -> 3.4 (spread 1.7 > 1.6) — a wave
    # arrived mid-series; attempt 2: flat series -> quiet
    vals = iter([2.0, 2.9, 3.4, 2.0, 2.0, 2.0])
    out = remeasure_flagged(
        flagged={"q": 2.1},
        base_warm={"q": 1.0},
        run_query=lambda name: next(vals),
        get_load1m=lambda: 1.0,
        sleep=lambda s: None,
    )
    assert len(out["q"]["attempts"]) == 2
    assert out["q"]["attempts"][0]["quiet"] is False
    assert out["q"]["attempts"][0]["series_stable"] is False
    assert out["q"]["attempts"][1]["quiet"] is True
    assert out["q"]["outcome"] == "confirmed_regressed_quiet"
    assert out["q"]["still_regressed"] is True


def test_remeasure_heavy_query_own_load_does_not_unconfirm():
    """The r15 review finding: a multi-second query's own work raises
    1-min loadavg past any threshold by the end of its series (x18
    observed 1.73 -> 12.78 purely from itself).  With a quiet gate and
    a stable series, the measurement must count as QUIET — heavy
    queries would otherwise be permanently unconfirmable."""
    from bench import remeasure_flagged

    # gate reads quiet (wait-check + gate read); post-series load is
    # self-inflated
    seq = iter([1.5, 1.5, 12.78])
    out = remeasure_flagged(
        flagged={"q": 3.0},
        base_warm={"q": 1.0},
        run_query=lambda name: 9.0,  # stable heavy series
        get_load1m=lambda: next(seq, 12.78),
        sleep=lambda s: None,
    )
    assert out["q"]["measured_quiet"] is True
    assert out["q"]["outcome"] == "confirmed_regressed_quiet"
    assert out["q"]["still_regressed"] is True


def test_remeasure_steal_wave_is_not_quiet():
    """The r15 t04 failure mode: sustained KVM steal inflates every pass
    of the series EQUALLY, so loadavg reads quiet and the series reads
    stable — yet the window is contended.  An attempt whose steal
    fraction is at/above threshold must not count as quiet: the protocol
    retries, and a regression observed only under steal reads
    unconfirmed_no_quiet_window."""
    from bench import remeasure_flagged

    # attempt 1: 1.5 s of steal across a 6 s single-cpu series (frac
    # 0.25); attempts 2-3: no steal but the "regression" persists
    steals = iter([0.0, 1.5, 1.5, 1.5, 1.5, 1.5])
    out = remeasure_flagged(
        flagged={"q": 2.0},
        base_warm={"q": 1.0},
        run_query=lambda name: 2.0,  # stable series either way
        get_load1m=lambda: 1.0,
        sleep=lambda s: None,
        get_steal_sec=lambda: next(steals, 1.5),
        ncpus=1,
    )
    a = out["q"]["attempts"]
    assert a[0]["quiet"] is False and a[0]["series_stable"] is True
    assert a[0]["steal_sec"] == 1.5 and a[0]["steal_frac"] == 0.25
    assert a[1]["quiet"] is True and a[1]["steal_frac"] == 0.0
    # quiet attempt 2 confirmed the delta for real
    assert out["q"]["outcome"] == "confirmed_regressed_quiet"


def test_remeasure_steal_only_window_is_unconfirmed():
    """A regression whose every attempt ran under steal must read
    unconfirmed_no_quiet_window — same posture as the loadavg gate."""
    from bench import remeasure_flagged

    base = [0.0]

    def steal():
        base[0] += 3.0  # 3 s of steal around every reading
        return base[0]

    out = remeasure_flagged(
        flagged={"q": 2.0},
        base_warm={"q": 1.0},
        run_query=lambda name: 2.0,
        get_load1m=lambda: 1.0,
        sleep=lambda s: None,
        quiet_budget_sec=0.0,
        get_steal_sec=steal,
        ncpus=1,
    )
    assert out["q"]["measured_quiet"] is False
    assert out["q"]["outcome"] == "unconfirmed_no_quiet_window"
    assert out["q"]["still_regressed"] is False


def test_remeasure_improvement_flag_cannot_clear_under_load():
    """An IMPROVEMENT flag whose loaded re-measure reads in-band is
    unconfirmed, not cleared: contention inflates the measurement, so
    the quiet value could still be an improvement.  (Only a REGRESSION
    flag can be cleared by an inflated in-band measurement.)"""
    from bench import remeasure_flagged

    out = remeasure_flagged(
        flagged={"q": 0.2},
        base_warm={"q": 1.0},
        run_query=lambda name: 1.0,  # in-band under load
        get_load1m=lambda: 9.0,
        sleep=lambda s: None,
        quiet_budget_sec=0.0,
    )
    assert out["q"]["outcome"] == "unconfirmed_no_quiet_window"
    assert out["q"]["still_regressed"] is False
    assert out["q"]["still_improved"] is False


def test_remeasure_flagged_survives_a_broken_query():
    from bench import remeasure_flagged

    def run(name):
        if name == "q_bad":
            raise RuntimeError("boom")
        return 1.0

    out = remeasure_flagged(
        flagged={"q_bad": 2.0, "q_ok": 2.0},
        base_warm={"q_bad": 1.0, "q_ok": 1.0},
        run_query=run,
        get_load1m=lambda: 1.0,
        sleep=lambda s: None,
    )
    assert "error" in out["q_bad"]
    assert out["q_ok"]["warm"] == 1.0


def test_remeasure_distinguishes_persistent_improvement():
    """An improvement that persists under quiet load (the prior round's
    baseline was load-inflated) must read as still_improved, never as a
    surviving regression."""
    from bench import remeasure_flagged

    out = remeasure_flagged(
        flagged={"q": 0.23},
        base_warm={"q": 10.0},
        run_query=lambda name: 2.0,
        get_load1m=lambda: 1.0,
        sleep=lambda s: None,
    )
    assert out["q"]["still_improved"] is True
    assert out["q"]["still_regressed"] is False
    assert out["q"]["outcome"] == "confirmed_improved_quiet"


def test_shed_keeps_map_over_quiet_counts():
    """The quiet-pass counts must never cost the per-query map: on an
    overflowing line the improved count sheds first, then the
    regression count, and the map survives."""
    import json

    from bench import shed_to_fit

    timings = {f"x{i:02d}_query_name_abc": 1.234 for i in range(58)}

    s = {
        "metric": "headline_queries_wall_clock",
        "value": 123.456,
        "unit": "sec",
        "queries": dict(timings),
        "sf": 0.1,
        "n_queries": 58,
        "warm_total_sec": 82.619,
        "duckdb_total_sec": 54.603,
        "warm_vs_duckdb_ratio": 1.513,
        "sf1_source": "live",
        "sf1_warm_total_sec": 162.731,
        "sf1_duckdb_total_sec": 407.808,
        "sf1_warm_vs_duckdb_ratio": 0.399,
        "loadavg1m": [7.72, 3.76],
        "warm_delta_flagged": 6,
        "warm_delta_worst": "x20_pack_shards:0.23",
        "quiet_still_regressed": 0,
        "quiet_still_improved": 5,
    }
    out = json.loads(shed_to_fit(s, timings, limit=1900))
    assert len(out["queries"]) == 58, "map must survive the quiet counts"
    # worst-mover string sheds before the quiet counts are touched
    assert "warm_delta_worst" not in out


def test_shed_keeps_regression_count_longest():
    """Among the shed-able summary extras, quiet_still_regressed — the
    round's one real problem indicator — must outlive the labels and
    the benign counts; and the shed fallback must re-round the map it
    was handed (main passes the WARM map), never reinstate another."""
    import json

    from bench import shed_to_fit

    warm = {f"x{i:02d}_query_name_abc": 1.234 for i in range(58)}
    s = {
        "metric": "headline_queries_wall_clock",
        "value": 123.456,
        "unit": "sec",
        "queries": dict(warm),
        "queries_are": "warm_median_sec",
        "build_overhead_sec": 45.133,
        "sf": 0.1,
        "n_queries": 58,
        "warm_total_sec": 82.619,
        "duckdb_total_sec": 54.603,
        "warm_vs_duckdb_ratio": 1.513,
        "sf1_source": "live",
        "sf1_warm_total_sec": 162.731,
        "sf1_duckdb_total_sec": 407.808,
        "sf1_warm_vs_duckdb_ratio": 0.399,
        "loadavg1m": [7.72, 3.76],
        "warm_delta_flagged": 14,
        "warm_delta_worst": "x20_pack_shards:0.23",
        "quiet_still_regressed": 0,
        "quiet_still_improved": 4,
        "quiet_unconfirmed": 1,
    }
    out = json.loads(shed_to_fit(s, warm, limit=1900))
    assert len(out["queries"]) == 58
    assert set(out["queries"].values()) == {1.23}  # rounded from warm
    if "quiet_still_improved" in out or "build_overhead_sec" in out:
        assert "quiet_still_regressed" in out, (
            "regression count shed before the benign extras"
        )
