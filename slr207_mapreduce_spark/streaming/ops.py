"""Streaming transformations over an events stream.

Each operator takes a (streaming or batch) DataFrame with the events schema
(event_id, ts timestamp, user_id, event_type, value, props) and returns the
transformed DataFrame — source-agnostic, so tests can drive them with a
file source in availableNow mode and diff the result against the batch
oracle (plans/events.py).

Watermark policy: callers pass the lateness bound; every stateful op here
requires one so state is bounded at scale (a stream without a watermark
accumulates state forever — the 100 TB failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source stream over a directory of parquet micro-batches.
    maxFilesPerTrigger=1 → one file per micro-batch, which makes watermark
    advancement (and late-data dropping) observable and deterministic."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def tumbling_window_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-window, per-type counts+sums with late-data policy: rows later
    than ``watermark`` behind the max seen event time are dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_sums(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows with an inactivity gap — the streaming counterpart of
    plans/events.py::events_sessionization (same gap semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once event delivery: drop duplicate event_ids within the
    watermark horizon (state is pruned past it — bounded memory)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_static_enrich(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich a stream with a (broadcastable) static
    dimension — no state, no watermark needed; the dim is re-resolved per
    micro-batch so slowly-changing dimensions pick up updates."""
    return events.join(F.broadcast(dim), on, "left")


def stream_stream_view_purchase_join(
    events: DataFrame, max_gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same user's
    view events in the preceding ``max_gap`` (attribution join).

    Both sides carry watermarks and the join has a time-range condition, so
    Spark can bound the buffered state on each side — the only shape a
    stream-stream join is allowed to take at scale (unbounded-state joins
    are rejected by the engine / would OOM anyway).
    """
    views = (
        events.where(F.col("event_type") == "view")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    return purchases.join(
        views,
        (purchases.user_id == views.v_user)
        & (views.view_ts <= purchases.purchase_ts)
        & (views.view_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {max_gap}")),
    ).select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")


def stream_stream_left_outer_attribution(
    events: DataFrame, max_gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase emits — matched view
    rows as they arrive (the inner part), and a NULL-view row once the
    watermark closes a purchase's attribution window with no match.

    The outer side is what makes conversion-rate math possible on the
    stream (unmatched purchases ARE the signal); it is also the shape with
    the strictest engine requirements — watermarks on BOTH sides plus a
    time-range join condition, otherwise Spark cannot decide when an
    unmatched row is safe to emit and rejects the query. Null emission
    happens only when the watermark passes the window end, so rows near
    the end of a bounded replay stay buffered — the semantics tests pin
    exactly the inner-equality + genuinely-unmatched-nulls contract.
    """
    views = (
        events.where(F.col("event_type") == "view")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    return purchases.join(
        views,
        (purchases.user_id == views.v_user)
        & (views.view_ts <= purchases.purchase_ts)
        & (views.view_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {max_gap}")),
        "leftOuter",
    ).select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory table; returns the batch DataFrame of results. Test harness
    plumbing — production sinks go through write_stream()."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def write_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
):
    """Production sink: checkpointed, exactly-once file sink."""
    return (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )
