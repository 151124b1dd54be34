"""Watermarked tumbling-window aggregation over an event stream.

The standard late-data pattern: `withWatermark(ts, D)` bounds how late an
event may arrive; tumbling windows finalize (and, in append mode, emit)
once the watermark passes their end, and later-than-D events are dropped
instead of corrupting already-emitted results — the property a 100 TB/day
ingest needs so downstream consumers can treat emitted windows as
immutable.  State per open window lives in the checkpointed state store;
cents-integer sums keep the aggregates engine-portable."""

from __future__ import annotations

from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def stream_windowed_counts(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_dur: str = "1 minute",
    max_lateness: str = "2 minutes",
    max_files_per_trigger: int = 1,
):
    """events parquet dir -> append-only finalized (window, user_id,
    n_events, sum_cents) parquet.  Windows are emitted exactly once, only
    after the watermark (max event time - max_lateness) passes their end."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", max_lateness)
        .groupBy(F.window("ts", window_dur).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("sum_cents"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "user_id",
            "n_events",
            "sum_cents",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", f"{out_dir}/windowed")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
