"""Continuous query-vs-library probe: a Structured-Streaming front end on
the SAME probe core as jobs/search.py.

CONSULT answers "is this read in the library?" one batch invocation at a
time (main_search.cpp:684-1061); here newly-arriving clips are classified
continuously — a file-source stream feeds each micro-batch through
probing.probe_clips() against a prebuilt index (jobs/build_index.py), and
foreachBatch appends the verified hits and the per-batch unmatched ids:

  <out>/matched_clips    confirmed pairs (clip_a = query id, clip_b = lib)
  <out>/unmatched_clips  (clip_id, batch_id) — the streaming ucseq_ analog

The library tables are read and cached ONCE at stream start (the
distributed stand-in for CONSULT's load-index-then-loop design,
main_search.cpp:523-658); each micro-batch pays only the query-side
featurize + the bucket probe join.  checkpointLocation gives exactly-once
per-batch resume — a replayed batch overwrites nothing and appends only
after the checkpoint commit, matching stream_featurize's contract.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..config import Config
from ..datagen import CLIPS_SCHEMA
from ..io import Warehouse
from ..probing import probe_clips


def stream_probe(
    spark: SparkSession,
    clips_dir: str,
    warehouse_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: Config | None = None,
    max_files_per_trigger: int = 4,
):
    """Start the continuous probe; returns the StreamingQuery (callers
    stop() it or awaitTermination()).  Adopts the index's persisted config
    exactly like jobs/search.py — an explicitly passed conflicting cfg is
    refused rather than silently mixing shingle/signature parameters."""
    wh = Warehouse(spark, warehouse_dir, cfg or Config())
    stored = Config.from_json(wh.read("config").head()["config_json"])
    if cfg is not None and cfg.params_hash != stored.params_hash:
        raise ValueError(
            f"index built with params_hash={stored.params_hash}, caller "
            f"explicitly passed {cfg.params_hash}; refusing to mix"
        )
    cfg = stored

    lib_buckets = wh.read("lsh_buckets").persist()
    lib_features = wh.read("features").persist()
    lib_tr = wh.read("transcripts").persist() if wh.exists("transcripts") else None

    def per_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        confirmed = probe_clips(
            spark, batch_df, lib_buckets, lib_features, lib_tr, cfg
        ).persist()
        try:
            confirmed.write.mode("append").parquet(
                os.path.join(out_dir, "matched_clips")
            )
            # a query clip only probes in its own batch, so this batch's
            # unmatched = batch ids minus this batch's hits — O(batch),
            # never a scan of the accumulated output
            matched = confirmed.select(F.col("clip_a").alias("clip_id")).distinct()
            (
                batch_df.select("clip_id")
                .join(matched, "clip_id", "left_anti")
                .withColumn("batch_id", F.lit(epoch_id).cast("bigint"))
                .write.mode("append")
                .parquet(os.path.join(out_dir, "unmatched_clips"))
            )
        finally:
            confirmed.unpersist()
            batch_df.unpersist()

    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(clips_dir)
    )
    return (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
