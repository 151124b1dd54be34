"""Streaming ingest: incremental featurization equals the batch result."""

from __future__ import annotations

import os

from consult_spark.streaming.ingest import compact_buckets, stream_featurize
from consult_spark.operators import bands as B
from consult_spark.operators import shingle as SH


def test_stream_featurize_matches_batch(spark, corpus_xs, cfg, tmp_path):
    clips_dir = str(tmp_path / "clips_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf = corpus_xs["clips"].head(60)
    # write as 3 separate files to exercise multi-batch behavior
    for i in range(3):
        spark.createDataFrame(pdf.iloc[i * 20 : (i + 1) * 20]).coalesce(1).write.mode(
            "append"
        ).parquet(clips_dir)

    q = stream_featurize(spark, clips_dir, out_dir, ckpt, cfg, max_files_per_trigger=1)
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "features_stream"))
    batch = SH.featurize(spark.createDataFrame(pdf), cfg)
    got = {(r["clip_id"], r["kind"]): tuple(r["minhash"]) for r in streamed.collect()}
    exp = {(r["clip_id"], r["kind"]): tuple(r["minhash"]) for r in batch.collect()}
    assert got == exp
    # resume: restarting over the same checkpoint must not duplicate rows
    q2 = stream_featurize(spark, clips_dir, out_dir, ckpt, cfg)
    q2.awaitTermination(60)
    assert spark.read.parquet(os.path.join(out_dir, "features_stream")).count() == len(exp)

    # compaction: the globally-capped lsh_buckets must equal a from-scratch
    # batch build over the same clips (per-batch caps are NOT global — the
    # hot-clique rows overflow buckets_stream across batches)
    compacted = compact_buckets(spark, out_dir, cfg)
    expected = B.capped_buckets(B.explode_bands(batch), cfg)
    got_rows = sorted(tuple(r) for r in compacted.collect())
    exp_rows = sorted(tuple(r) for r in expected.collect())
    assert got_rows == exp_rows
    # and no bucket exceeds the cap
    over = (
        compacted.groupBy("kind", "table_l", "band_hash")
        .count()
        .filter(f"count > {cfg.bucket_cap}")
        .count()
    )
    assert over == 0


def test_compaction_cadence_runs_inside_stream(spark, corpus_xs, cfg, tmp_path):
    """compact_every=1: the stream itself must produce the globally-capped
    lsh_buckets table — probe-ready without any manual compact_buckets call
    — and it must equal the batch build over the same clips."""
    clips_dir = str(tmp_path / "clips_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf = corpus_xs["clips"].head(60)
    for i in range(3):
        spark.createDataFrame(pdf.iloc[i * 20 : (i + 1) * 20]).coalesce(1).write.mode(
            "append"
        ).parquet(clips_dir)

    q = stream_featurize(
        spark, clips_dir, out_dir, ckpt, cfg, max_files_per_trigger=1, compact_every=1
    )
    q.awaitTermination(120)

    compacted = spark.read.parquet(os.path.join(out_dir, "lsh_buckets"))
    batch = SH.featurize(spark.createDataFrame(pdf), cfg)
    expected = B.capped_buckets(B.explode_bands(batch), cfg)
    assert sorted(tuple(r) for r in compacted.collect()) == sorted(
        tuple(r) for r in expected.collect()
    )


def test_compaction_dedupes_replayed_batch(spark, corpus_xs, cfg, tmp_path):
    """at-least-once replay: append the same feature rows twice (what a
    retried micro-batch does) — compaction must collapse the duplicates, so
    no clip occupies two cap slots and no bucket row is emitted twice."""
    out_dir = str(tmp_path / "out")
    pdf = corpus_xs["clips"].head(40)
    features = SH.featurize(spark.createDataFrame(pdf), cfg)
    features.write.mode("append").parquet(os.path.join(out_dir, "features_stream"))
    features.write.mode("append").parquet(os.path.join(out_dir, "features_stream"))

    compacted = compact_buckets(spark, out_dir, cfg)
    expected = B.capped_buckets(B.explode_bands(features), cfg)
    assert sorted(tuple(r) for r in compacted.collect()) == sorted(
        tuple(r) for r in expected.collect()
    )


def test_stream_featurize_replayed_epoch_is_idempotent(spark, corpus_xs, cfg, tmp_path):
    """Epoch-keyed writes: delivering the same (batch_df, epoch_id) twice —
    what a crash between the write and the checkpoint commit causes — must
    leave features_stream/buckets_stream byte-identical, not doubled."""
    import os

    from consult_spark.streaming.ingest import stream_featurize

    clips_dir = str(tmp_path / "clips_in")
    out_dir = str(tmp_path / "out")
    pdf = corpus_xs["clips"].head(40)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(clips_dir)

    # run the stream once to materialize epoch 0...
    q = stream_featurize(spark, clips_dir, out_dir, str(tmp_path / "ckpt"), cfg)
    q.awaitTermination(120)

    def snap(table):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(os.path.join(out_dir, table)).collect()
        )

    feats_once = snap("features_stream")
    buckets_once = snap("buckets_stream")
    assert len(feats_once) > 0

    # ...then replay epoch 0 directly through a fresh stream over a FRESH
    # checkpoint (same source files => same batch content, same epoch id)
    q2 = stream_featurize(spark, clips_dir, out_dir, str(tmp_path / "ckpt2"), cfg)
    q2.awaitTermination(120)
    assert snap("features_stream") == feats_once
    assert snap("buckets_stream") == buckets_once
