"""Stream-stream joins (SURVEY §2.10 extension): correlate two live event
streams on a key within an event-time window — the view→purchase /
request→response attribution pattern.

Spark-first: this is the built-in watermarked stream-stream join.  Both
sides carry a watermark and the join condition pairs a key equality with
an event-time RANGE (`right.ts ∈ [left.ts, left.ts + max_delay]`), which
is what lets the state store evict: a buffered left row can stop waiting
once the right watermark passes `left.ts + max_delay`, and vice versa.
Without the range bound the state is unbounded and the query is rejected
for outer joins / grows forever for inner — the bound is the operator's
scale contract, not an optimization.

At 100 TB/day: state per executor is (rows within the watermark+delay
horizon) only; both inputs shuffle on the join key once (co-partitioned
stateful join), so key skew is the thing to watch — salt upstream if one
user/session dominates.

The same function works on BATCH inputs (both sides static): it degrades
to a plain interval join with identical semantics, which is exactly the
batch-equivalence property the tests pin for the inner form.

Outer-join caveat (documented, tested as a bound rather than equality):
on a FINITE stream the engine emits null-extended left rows only when
the watermark passes their eviction horizon; rows near the end of input
stay buffered when the query drains (availableNow) and never null-emit.
So streaming leftOuter ⊆ batch leftOuter, ⊇ batch inner — the gap is
precisely the watermark tail, and it closes on a continuously running
stream.  (jurimetria reference has no streaming surface at all; this
extends the rebuilt engine's §2.10 streaming family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_delay: str = "4 hours",
    watermark: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join ``left`` events to ``right`` events with the same ``key`` whose
    timestamp falls in ``[left_ts, left_ts + max_delay]``.

    Columns are prefixed per side (the two streams usually share a schema,
    e.g. two slices of one events table); the key column keeps its name.
    ``how``: "inner" (batch-equivalent) or "leftOuter" (see module
    docstring for the finite-stream tail caveat).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(
            f"stream_stream_join: how={how!r} unsupported — rightOuter/full "
            "require symmetric eviction reasoning; swap the sides for "
            "rightOuter, run two passes for full."
        )
    lts, rts = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    lf = left.select(
        F.col(key),
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in left.columns
            if c != key
        ],
    )
    rf = right.select(
        F.col(key).alias("__rkey"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != key
        ],
    )
    if left.isStreaming or right.isStreaming:
        lf = lf.withWatermark(lts, watermark)
        rf = rf.withWatermark(rts, watermark)
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lf.join(rf, cond, how).drop("__rkey")
