"""Structured-Streaming ingest: incrementally featurize newly-arriving clips.

CONSULT is batch-only (SURVEY §2.3); the graft adds an incremental path so a
10^12-row corpus doesn't have to be re-shingled to absorb new data: a
file-source stream over the clips directory feeds the SAME featurize stage
(operators/shingle.py), and foreachBatch appends features + exploded bucket
rows to the warehouse.  Candidate generation against the existing index is
then an ordinary batch join of the new bucket rows against `lsh_buckets` —
exactly CONSULT's query-vs-library probe (main_search.cpp:810-846), with the
new rows as the query side.

foreachBatch (not a direct streaming sink) because the pipeline needs
multi-table writes per micro-batch; checkpointLocation gives exactly-once
per-batch resume.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import Config
from ..datagen import CLIPS_SCHEMA
from ..operators import bands as bands_op
from ..operators import shingle as shingle_op


def stream_featurize(
    spark: SparkSession,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: Config | None = None,
    max_files_per_trigger: int = 4,
):
    """Start a stream: clips parquet dir -> features + buckets appends.

    Returns the StreamingQuery; callers stop() it or processAllAvailable().
    """
    cfg = cfg or Config()
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(clips_dir)
    )

    def per_batch(batch_df, epoch_id: int) -> None:
        features = shingle_op.featurize(batch_df, cfg)
        features.persist()
        features.write.mode("append").parquet(f"{out_dir}/features_stream")
        # per-batch bucket rows: cap applies within the batch; the periodic
        # compaction job re-applies the global cap when merging into the
        # main lsh_buckets table
        buckets = bands_op.salted_capped_buckets(bands_op.explode_bands(features), cfg)
        buckets.write.mode("append").parquet(f"{out_dir}/buckets_stream")
        features.unpersist()

    return (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
