"""Watermarked windowed aggregation over an event stream: tumbling and
session windows.

The standard late-data pattern: `withWatermark(ts, D)` bounds how late an
event may arrive; windows finalize (and, in append mode, emit) once the
watermark passes their end, and later-than-D events are dropped instead of
corrupting already-emitted results — the property a 100 TB/day ingest
needs so downstream consumers can treat emitted windows as immutable.
State per open window lives in the checkpointed state store;
cents-integer sums keep the aggregates engine-portable.

Session windows (`F.session_window`) are dynamically sized: a session
stays open while events keep arriving within ``gap`` of the previous one,
and two sessions of the same key MERGE when a bridging event lands
between them — the state-store merge is what distinguishes them from the
fixed tumbling lattice.  A session finalizes once the watermark passes
(last event ts + gap)."""

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
    slide: str | None = None,
):
    """events parquet dir -> append-only finalized (window, user_id,
    n_events, sum_cents) parquet.  Windows are emitted exactly once, only
    after the watermark (max event time - max_lateness) passes their end.
    ``slide`` makes the windows SLIDING (each event lands in
    window_dur/slide overlapping windows); None = tumbling."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    win = (
        F.window("ts", window_dur, slide) if slide else F.window("ts", window_dur)
    )
    agg = (
        stream.withWatermark("ts", max_lateness)
        .groupBy(win.alias("win"), "user_id")
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


def stream_session_counts(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "2 minutes",
    max_lateness: str = "2 minutes",
    max_files_per_trigger: int = 1,
):
    """events parquet dir -> append-only finalized per-user sessions
    (session_start, session_end, user_id, n_events, sum_cents).  A session
    spans events separated by < ``gap``; events bridging two open sessions
    merge them (state-store session merge); a session emits once the
    watermark passes its end (last event + gap)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", max_lateness)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("sum_cents"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_cents",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", f"{out_dir}/sessions")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
