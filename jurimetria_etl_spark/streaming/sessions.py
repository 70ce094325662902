"""Timer-driven session summarization: emit a per-user session summary
row exactly when the session CLOSES — when the event-time watermark
passes ``last_event + gap``.

Close-on-timeout is the custom-state shape the built-in
``session_window`` aggregation hides (programmable accumulators,
enrich-on-close, early-exit rules) and the canonical use of per-key
event-time timers.  Two implementations, one semantics contract:

- ``applyInPandasWithState`` + ``GroupStateTimeout.EventTimeTimeout``
  (the path exercised in this environment): the open session lives in
  ``GroupState``; ``setTimeoutTimestamp(end + gap)`` fires the handler
  with ``hasTimedOut`` once the watermark passes the deadline.
- ``transformWithStateInPandas`` (Spark 4 StatefulProcessor, ValueState +
  ``registerTimer``): the modern equivalent, selected automatically when
  its runtime is available.  Its state-server protocol needs
  ``google.protobuf``, which this container lacks, so the processor class
  is defined but the auto path falls back (import-gated, never stubbed
  silently).

Semantics contract (pinned in tests/test_sessions_stateful.py): on a
chronologically-arriving stream, emitted summaries for every session
whose ``end + gap`` the final watermark passed are IDENTICAL to the
batch ``session_window`` aggregation; sessions still open when a finite
stream drains are withheld (the watermark tail), never wrong.

Scale: state is one small row per ACTIVE user — closing a session
removes it; the input shuffles once on user_id; timers/timeouts live in
the state store and scale with active keys, not events.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, end long, n long, total double"


def _fold_sessions(
    pairs: list[tuple[int, float]],
    seed: tuple[int, int, int, float] | None,
    gap_us: int,
) -> list[list]:
    """Walk time-sorted (ts_us, value) pairs, splitting on > gap: returns
    [start, end, n, total] groups ordered by start; the LAST one is the
    still-open tail.  A single micro-batch can span several gaps for one
    key, so the within-batch walk must split sessions too, not just
    extend one.

    The ``seed`` (the open session carried in state) is merged by
    INTERVAL, not blindly prepended: a late-but-valid event arriving more
    than ``gap`` BEFORE the seed's start must form its own session (batch
    ``session_window`` splits there), and an event inside/adjacent to the
    seed extends it."""
    sessions: list[list] = []
    for ts, v in sorted(pairs):
        if sessions and ts <= sessions[-1][1] + gap_us:
            cur = sessions[-1]
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            cur[3] += v
        else:
            sessions.append([ts, ts, 1, v])
    if seed is None:
        return sessions
    # interval-merge the seed with the batch's sessions (both sorted):
    # any session within gap of the seed's span coalesces into it
    merged: list[list] = []
    out = sorted(sessions + [list(seed)], key=lambda s: (s[0], s[1]))
    for s in out:
        if merged and s[0] <= merged[-1][1] + gap_us:
            cur = merged[-1]
            cur[1] = max(cur[1], s[1])
            cur[2] += s[2]
            cur[3] += s[3]
        else:
            merged.append(s)
    return merged


def _round_half_up6(v: float) -> float:
    """Exactly Spark's ``F.round(double, 6)``: BigDecimal.valueOf uses the
    SHORTEST decimal repr of the double (= Python ``repr``), then
    setScale(6, HALF_UP).  Python's builtin ``round`` is banker's
    rounding and would diverge from the batch oracle on a .xxxxxx5 tie —
    the exact trap operators/timeseries.py documents."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(v))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _key_user(key: "tuple") -> "int | None":
    """Grouping-key user id; a NULL user (nullable schema) groups under
    None — ``int(None)`` would kill the whole streaming query in the
    Python worker, while the batch session_window path emits a null-user
    row, and the stream must match it."""
    return None if key[0] is None else int(key[0])


def _summary_frame(user: "int | None", sessions: list) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user] * len(sessions),
            "session_start": [pd.Timestamp(int(s), unit="us") for s, *_ in sessions],
            "session_end": [pd.Timestamp(int(e), unit="us") for _, e, *_ in sessions],
            "n_events": [int(n) for _, _, n, _ in sessions],
            "total_value": [_round_half_up6(t) for *_, t in sessions],
        }
    )


def _make_session_fn(gap_us: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            s, e, n, t = state.get
            state.remove()
            yield _summary_frame(_key_user(key), [[s, e, n, t]])
            return
        pairs: list[tuple[int, float]] = []
        for pdf in pdfs:
            pairs.extend(
                (int(ts.value // 1_000), float(v))
                for ts, v in zip(pd.to_datetime(pdf["ts"]), pdf["value"])
            )
        if not pairs:
            return
        seed = tuple(state.get) if state.exists else None
        sessions = _fold_sessions(pairs, seed, gap_us)
        open_s = sessions.pop()
        deadline_ms = (int(open_s[1]) + gap_us) // 1_000
        if deadline_ms <= state.getCurrentWatermarkMs():
            # the open tail is ALREADY past its deadline relative to the
            # watermark (a long-idle key getting late-but-valid rows):
            # close it now — a past-timestamp timeout would be rejected
            sessions.append(open_s)
            state.remove()
        else:
            state.update(
                (int(open_s[0]), int(open_s[1]), int(open_s[2]), float(open_s[3]))
            )
            state.setTimeoutTimestamp(deadline_ms)
        if sessions:  # gap exceeded within the data: closed by evidence
            yield _summary_frame(_key_user(key), sessions)

    return update


try:  # transformWithState runtime needs google.protobuf (absent here)
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAVE_TWS = True

    class SessionProcessor(StatefulProcessor):
        """StatefulProcessor form of the same fold: ValueState for the open
        session, ``registerTimer(end + gap)`` to close it when the
        watermark passes.  Millisecond timer timestamps per the API."""

        def __init__(self, gap_us: int):
            self._gap_us = gap_us

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            pairs = []
            for pdf in rows:
                pairs.extend(
                    (int(ts.value // 1_000), float(v))
                    for ts, v in zip(pd.to_datetime(pdf["ts"]), pdf["value"])
                )
            if not pairs:
                return
            seed = None
            if self._state.exists():
                seed = tuple(self._state.get())
                self._handle.deleteTimer((seed[1] + self._gap_us) // 1_000)
            sessions = _fold_sessions(pairs, seed, self._gap_us)
            open_s = sessions.pop()
            self._state.update(
                (int(open_s[0]), int(open_s[1]), int(open_s[2]), float(open_s[3]))
            )
            self._handle.registerTimer((int(open_s[1]) + self._gap_us) // 1_000)
            if sessions:
                yield _summary_frame(_key_user(key), sessions)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._state.exists():
                s, e, n, t = self._state.get()
                if expiredTimerInfo.getExpiryTimeInMs() >= (e + self._gap_us) // 1_000:
                    self._state.clear()
                    yield _summary_frame(_key_user(key), [[s, e, n, t]])

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - environment-dependent
    _HAVE_TWS = False


def session_summaries(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    use_transform_with_state: bool | None = None,
) -> DataFrame:
    """Close-on-timeout session summaries per user.

    Batch input: the equivalent ``session_window`` aggregation — the
    oracle the streaming path is pinned against.  Streaming input: the
    StatefulProcessor path when available (see module docstring),
    otherwise ``applyInPandasWithState`` + EventTimeTimeout.
    """
    gap_us = _parse_seconds(gap) * 1_000_000
    if not events.isStreaming:
        return (
            events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
            .select(
                "user_id", "session_start", "session_end",
                "n_events", "total_value",
            )
        )
    wm = events.withWatermark("ts", watermark)
    use_tws = _HAVE_TWS if use_transform_with_state is None else use_transform_with_state
    if use_tws:
        if not _HAVE_TWS:
            raise ImportError(
                "transformWithStateInPandas needs google.protobuf; install "
                "it or call with use_transform_with_state=False"
            )
        return wm.groupBy("user_id").transformWithStateInPandas(
            SessionProcessor(gap_us),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    return wm.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _parse_seconds(interval: str) -> int:
    """Seconds of a Spark interval string — multi-part ('1 hour 30
    minutes') and day/week units included, since ``session_window``
    itself accepts them and this helper must not reject gaps the batch
    path allows."""
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
        "week": 604800, "weeks": 604800,
    }
    parts = interval.split()
    if not parts or len(parts) % 2:
        raise ValueError(f"cannot parse interval {interval!r}")
    total = 0
    for qty, unit in zip(parts[::2], parts[1::2]):
        if unit not in mult:
            raise ValueError(f"unsupported unit {unit!r} in {interval!r}")
        total += int(qty) * mult[unit]
    return total
