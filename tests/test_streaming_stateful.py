"""Stateful streaming exact dedup: cross-batch state must recognize a
payload first seen N micro-batches earlier (the property foreachBatch alone
cannot give you)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from consult_spark.streaming.stateful import stream_exact_dedup

SCHEMA = "clip_id string, bytes binary"


def test_cross_batch_exact_dedup(spark, tmp_path):
    clips_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: a,b unique; batch 2: c dups a's payload, d unique;
    # batch 3: e dups a again, f dups d
    batches = [
        [("a", b"payload-A"), ("b", b"payload-B")],
        [("c", b"payload-A"), ("d", b"payload-D")],
        [("e", b"payload-A"), ("f", b"payload-D")],
    ]
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["clip_id", "bytes"])
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(clips_dir)

    q = stream_exact_dedup(spark, clips_dir, out_dir, ckpt, SCHEMA)
    q.awaitTermination(120)

    rows = {
        r["clip_id"]: (r["canonical_id"], r["is_first"])
        for r in spark.read.parquet(os.path.join(out_dir, "dedup_stream")).collect()
    }
    assert len(rows) == 6  # every input row emitted exactly once
    assert rows["a"] == ("a", True)
    assert rows["b"] == ("b", True)
    assert rows["c"] == ("a", False)  # cross-batch dup resolved via state
    assert rows["d"] == ("d", True)
    assert rows["e"] == ("a", False)
    assert rows["f"] == ("d", False)

    # resume over the same checkpoint: no duplicate emissions
    q2 = stream_exact_dedup(spark, clips_dir, out_dir, ckpt, SCHEMA)
    q2.awaitTermination(60)
    assert spark.read.parquet(os.path.join(out_dir, "dedup_stream")).count() == 6

    # new data after resume still sees the old state
    pdf = pd.DataFrame([("g", b"payload-B")], columns=["clip_id", "bytes"])
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(clips_dir)
    q3 = stream_exact_dedup(spark, clips_dir, out_dir, ckpt, SCHEMA)
    q3.awaitTermination(60)
    rows2 = {
        r["clip_id"]: (r["canonical_id"], r["is_first"])
        for r in spark.read.parquet(os.path.join(out_dir, "dedup_stream")).collect()
    }
    assert rows2["g"] == ("b", False)
