"""Custom stateful streaming operator: cross-batch EXACT dedup.

CONSULT is batch-only; the graft's streaming ingest (ingest.py) featurizes
incrementally but defers candidate generation to batch probes.  This module
adds the genuinely stateful piece: exact dedup (B5) over an unbounded
stream, where "have I seen this payload before, and who is canonical?" is
per-key state that must survive across micro-batches — the
applyInPandasWithState shape (the engine-level analog of CONSULT's
in-memory hash table, kept in Spark's state store instead of RAM).

Semantics: rows are keyed by content hash (md5 of the payload column); the
state per key is the canonical clip_id = the smallest clip_id seen so far.
Each input row is emitted exactly once, tagged with its key's canonical id
AT THAT POINT of the stream and whether it was the first sighting.  Within
a micro-batch the smallest id wins first (sorted before emission), so a
replayed stream with the same batch boundaries reproduces byte-identical
output; across different boundaries the canonical ids can only move DOWN
(toward the global minimum), mirroring the batch operator's min-id rule
(textdedup.exact_dup_groups)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_hash string, clip_id string, canonical_id string, is_first boolean"
STATE_SCHEMA = "canonical_id string"


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (content_hash,) = key
    canonical = state.get[0] if state.exists else None
    out_ids, out_canon, out_first = [], [], []
    for pdf in pdfs:
        for cid in sorted(pdf["clip_id"]):
            if canonical is None:
                canonical = cid
                out_first.append(True)
            else:
                if cid < canonical:
                    canonical = cid
                out_first.append(False)
            out_ids.append(cid)
            out_canon.append(canonical)
    state.update((canonical,))
    yield pd.DataFrame(
        {
            "content_hash": content_hash,
            "clip_id": out_ids,
            "canonical_id": out_canon,
            "is_first": out_first,
        }
    )


def stream_exact_dedup(
    spark,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    hash_col: str = "bytes",
    max_files_per_trigger: int = 1,
):
    """Start the stateful dedup stream: clips parquet dir -> append-only
    (content_hash, clip_id, canonical_id, is_first) parquet.  State lives in
    the checkpointed state store (exactly-once per micro-batch on resume)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(clips_dir)
    )
    keyed = stream.select(
        F.md5(F.col(hash_col).cast("binary")).alias("content_hash"), "clip_id"
    ).groupBy("content_hash")
    deduped = keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", f"{out_dir}/dedup_stream")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
