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
multi-table writes per micro-batch.  foreachBatch alone is at-least-once
(the batch function runs before the checkpoint commit); each epoch is
written as an idempotent ``batch_id=<epoch>`` partition overwrite
(streaming/epochs.py) so a crash-replayed micro-batch converges to the
same bytes instead of double-appending.  compact_buckets' (clip_id, kind)
dedup remains as defense in depth.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import Config
from ..datagen import CLIPS_SCHEMA
from ..operators import bands as bands_op
from ..operators import shingle as shingle_op
from .epochs import epoch_write


def stream_featurize(
    spark: SparkSession,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: Config | None = None,
    max_files_per_trigger: int = 4,
    compact_every: int = 0,
):
    """Start a stream: clips parquet dir -> features + buckets appends.

    ``compact_every=N`` (N > 0) re-runs :func:`compact_buckets` automatically
    after every N micro-batches, so the globally-capped ``lsh_buckets`` table
    the probe contract requires exists without a manual maintenance call —
    the cadence CONSULT's batch build gets for free by rebuilding the whole
    index.  Leave 0 to manage compaction externally.

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
        epoch_write(features, f"{out_dir}/features_stream", epoch_id)
        # per-batch bucket rows: the cap holds only WITHIN the batch; the
        # compaction cadence (or a manual compact_buckets) re-applies the
        # global cap — probe against the compacted `lsh_buckets`, not
        # buckets_stream, or the cap^2 pair-expansion bound does not hold
        buckets = bands_op.capped_buckets(bands_op.explode_bands(features), cfg)
        epoch_write(buckets, f"{out_dir}/buckets_stream", epoch_id)
        features.unpersist()
        if compact_every > 0 and (epoch_id + 1) % compact_every == 0:
            compact_buckets(batch_df.sparkSession, out_dir, cfg)

    return (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_buckets(spark: SparkSession, out_dir: str, cfg: Config | None = None):
    """Periodic merge-compaction: rebuild the globally-capped `lsh_buckets`
    table from everything ingested so far.

    buckets_stream rows are capped per micro-batch only — a hot bucket fed
    by many batches grows unbounded there, voiding the cap^2 pair bound if
    probed directly.  Recomputing from features_stream (band hashes ride the
    features rows; no re-decode, no Python stage) restores the exact batch
    semantics: compact(stream of N batches) == build over the union —
    deterministic because the cap keeps the cap-smallest clip_ids, not
    first-arrival (test_streaming pins the equality).

    The epoch-keyed writes make a replayed micro-batch overwrite its own
    partition, so duplicates should not exist — but a duplicated clip would
    occupy multiple cap slots in its buckets (evicting genuine members) and
    emit duplicate bucket rows, so dropDuplicates on the (clip_id, kind)
    key stays as defense in depth (replayed rows are byte-identical, so
    which one survives is immaterial; also collapses a clip re-ingested
    under two epochs by an upstream producer).

    Returns the compacted buckets DataFrame.
    """
    cfg = cfg or Config()
    features = spark.read.parquet(f"{out_dir}/features_stream").dropDuplicates(
        ["clip_id", "kind"]
    )
    buckets = bands_op.capped_buckets(bands_op.explode_bands(features), cfg)
    buckets.write.mode("overwrite").parquet(f"{out_dir}/lsh_buckets")
    return spark.read.parquet(f"{out_dir}/lsh_buckets")
