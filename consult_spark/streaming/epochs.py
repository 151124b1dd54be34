"""Epoch-keyed idempotent parquet writes for foreachBatch sinks.

foreachBatch is at-least-once: the batch function runs BEFORE the streaming
checkpoint commit, so a crash in between replays the epoch.  Writing each
epoch straight into its own ``batch_id=<epoch_id>`` partition directory
with mode OVERWRITE makes the replay converge — the epoch replaces exactly
its own partition and never touches any other (the standard foreachBatch
idempotence recipe, Spark structured-streaming docs "Using Foreach and
ForeachBatch").  epoch_id is deterministic across replays of the same
checkpoint, which is what makes the key sound.

An empty DataFrame still writes a schema-bearing empty part file (so a
written epoch is always readable); a sink that may legitimately never
receive rows can be pre-initialized with an empty ``batch_id=-1`` sentinel
partition (never a real epoch) so the root is readable from the start.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def epoch_write(df: DataFrame, table_dir: str, epoch_id: int) -> None:
    """Overwrite exactly this epoch's partition directory."""
    df.write.mode("overwrite").parquet(
        os.path.join(table_dir, f"batch_id={epoch_id}")
    )


def init_epoch_sink(spark: SparkSession, table_dir: str, schema: str) -> None:
    """Idempotently seed ``table_dir`` with an empty sentinel partition so
    reads succeed before (or without) any real epoch."""
    if not os.path.isdir(os.path.join(table_dir, "batch_id=-1")):
        epoch_write(spark.createDataFrame([], schema), table_dir, -1)
