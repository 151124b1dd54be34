"""Raw WAV-directory ingest source + multimodal stub plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from consult_spark.operators import multimodal as MM
from consult_spark.sources.clips import read_wav_directory


def test_wav_directory_ingest(spark, corpus_xs, cfg, tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    sample = corpus_xs["clips"].head(10)
    for _, row in sample.iterrows():
        (wav_dir / f"{row['clip_id']}.wav").write_bytes(row["bytes"])
    tr = spark.createDataFrame(sample[["clip_id", "transcript"]])
    clips = read_wav_directory(spark, str(wav_dir), transcripts=tr)
    got = {r["clip_id"]: r for r in clips.collect()}
    assert set(got) == set(sample["clip_id"])
    for _, row in sample.iterrows():
        g = got[row["clip_id"]]
        assert bytes(g["bytes"]) == row["bytes"]          # payload intact
        assert g["sr_hz"] == row["sr_hz"]                 # sniffed metadata
        assert g["codec"] == "pcm_s16le"
        assert g["transcript"] == row["transcript"]
        assert abs(g["dur_ms"] - row["dur_ms"]) <= 1


def test_image_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG....", "png")
    with pytest.raises(NotImplementedError):
        MM.sample_video_frames(b"\x00" * 32, "h264")


def test_image_featurize_plumbing(spark, cfg):
    """Deterministic-fake decode: the Spark-side plumbing (schema, batching,
    dedup wiring) is real — identical payload bytes produce identical
    shingle sets, different payloads diverge."""
    rows = [
        ("img_a", b"payload-one-xxxx", 32, 32, "png"),
        ("img_b", b"payload-one-xxxx", 32, 32, "png"),   # exact dup of a
        ("img_c", b"payload-two-yyyy", 32, 32, "png"),
    ]
    images = spark.createDataFrame(rows, MM.IMAGES_SCHEMA)
    feats = MM.featurize_images(images, cfg, deterministic_fake=True)
    got = {r["clip_id"]: tuple(r["shingles"]) for r in feats.collect()}
    assert got["img_a"] == got["img_b"]
    assert got["img_a"] != got["img_c"]
    # full FEATURES_SCHEMA — directly consumable by the shared operators
    from consult_spark.operators.shingle import FEATURES_SCHEMA
    from pyspark.sql.types import _parse_datatype_string

    assert feats.schema == _parse_datatype_string(FEATURES_SCHEMA)
    # and it actually feeds the shared banding/pair path: the exact-dup
    # image pair must surface as a candidate
    from consult_spark.operators import bands as B
    from consult_spark.operators import pairs as P

    cands = P.candidate_pairs(B.salted_capped_buckets(B.explode_bands(feats), cfg), cfg)
    pairs = {(r["clip_a"], r["clip_b"]) for r in cands.collect()}
    assert ("img_a", "img_b") in pairs
