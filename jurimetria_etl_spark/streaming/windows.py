"""Structured Streaming operators over the ``events`` stream (SURVEY §2.10).

The reference is strictly batch; its ``search_after`` cursor generator is a
natural resumable micro-batch source, which maps to Structured Streaming:
``readStream`` → ``withWatermark`` → windowed aggregation → sink.  Every
aggregation here is defined once and works in BOTH batch and streaming mode
(the batch-equivalence property the tests assert): pass any DataFrame —
static or streaming — and get the same logical plan.

Scale notes: watermarks bound state (late data beyond the delay is
dropped); windowed aggs shuffle on (window, keys); ``foreachBatch`` gives
exactly-once parquet appends with the checkpoint directory as the ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based micro-batch source over events parquet/json drops."""
    reader = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    # extension match only: a DIRECTORY named e.g. 'events_raw_json'
    # holding parquet drops must not be fed to the json reader
    if path.rstrip("/").endswith((".json", ".jsonl")):
        return reader.json(path)
    return reader.parquet(path)


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window event counts + value sum per event_type.

    Works identically on batch and streaming inputs; on streaming, the
    watermark bounds state and admits late data up to the delay.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            # decimal(18,6), NOT (18,2): the exact-decimal accumulation
            # trick (engine-reproducible sums) must not ROUND inputs
            # first — the generator emits 4-decimal values, and a (18,2)
            # cast silently corrupted every total by up to 0.005/row.
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "cnt",
            "total",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window counts per user (overlapping windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "user_id",
            "cnt",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: activity sessions per user separated by ≥gap idle."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "user_id",
            "cnt",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup — the E1 operator for continuous ingest.

    On a stream, plain ``dropDuplicates`` would keep EVERY key in the state
    store forever (unbounded state — dead at 100 TB/day).
    ``dropDuplicatesWithinWatermark`` bounds state to the watermark delay:
    a duplicate arriving within ``watermark`` of the first occurrence is
    dropped, older state is evicted.  That is exactly the dedup contract a
    training-data ingest needs — duplicates cluster in time (retries,
    re-crawls); cross-epoch dedup belongs to the batch fingerprint pass
    (operators/dedup.py).

    On a batch input it degrades to plain ``dropDuplicates`` over the same
    keys (one epoch = one batch, same semantics).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stream_to_parquet(
    agg: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    output_mode: str = "complete",
):
    """foreachBatch parquet sink.

    ``output_mode="complete"`` (default) overwrites a full snapshot per
    micro-batch — convenient for BOUNDED jobs (availableNow backfills),
    but on a continuous stream it disables watermark state eviction (the
    state store retains every window ever seen) and rejects append-only
    operators (``dedup_stream``, ``session_summaries``).  For unbounded
    runs pass ``output_mode="append"``: only watermark-finalized rows
    arrive per batch, each written to its own ``batch_id=<n>`` partition
    directory with OVERWRITE — a batch replayed after a crash between
    the write and the checkpoint commit rewrites its own partition
    instead of double-appending (a plain parquet append inside
    foreachBatch is only at-least-once), so restarts are exactly-once
    PER EMITTED ROW in every mode.  Caveat for ``update`` mode: a key
    re-emitted in a later batch leaves its stale version in the earlier
    ``batch_id`` partition (update mode re-emits, it never retracts), so
    readers of ``out_dir`` must take the latest ``batch_id`` per key —
    or prefer ``append`` (finalized-only) / ``complete`` (snapshot) for
    file sinks.  Readers of the append layout see a ``batch_id``
    partition column — provenance for free; drop it if unwanted."""
    if output_mode not in ("complete", "append", "update"):
        raise ValueError(
            f"output_mode={output_mode!r}: complete | append | update"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if output_mode == "complete":
            batch_df.write.mode("overwrite").parquet(out_dir)
        else:
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )

    writer = (
        agg.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
