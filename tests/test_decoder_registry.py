"""Pluggable codec decoders: a registered decoder flows through featurize /
decode_ok / dedup with zero other changes — the one-line integration point
for compressed codecs once a decoder wheel is available (README recipe).
"""

from __future__ import annotations

import numpy as np

from consult_spark.functions import audio
from consult_spark.operators import shingle as SH


def test_unregistered_compressed_codec_is_soft_error(spark, cfg):
    clips = spark.createDataFrame(
        [("c1", b"\x01\x02\x03\x04" * 8, 16000, 1000, "mp3", "hello world")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    got = {r["kind"]: r for r in SH.featurize(clips, cfg).collect()}
    assert not got["pcm"]["decode_ok"] and got["pcm"]["n_shingles"] == 0
    assert got["txt"]["decode_ok"]  # the other channel is unaffected


def test_registered_decoder_flows_through_featurize(spark, cfg, monkeypatch):
    # defined INSIDE the test: cloudpickle serializes closures by value, so
    # the worker processes get the decoder without importing the test module
    # (a real plug-in registers from a --py-files-shipped module instead)
    def fake_mp3(data: bytes):
        seed = int.from_bytes(data[:4].ljust(4, b"\0"), "little")
        rng = np.random.default_rng(seed)
        t = np.arange(16000, dtype=np.float32) / 16000.0
        f = 200.0 + (seed % 800)
        x = 0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(16000).astype(np.float32)
        return x.astype(np.float32), 16000

    monkeypatch.setitem(audio._DECODERS, "mp3", fake_mp3)
    rows = [
        ("c1", b"\x01\x02\x03\x04" * 2048, 16000, 1000, "mp3", "a"),
        ("c2", b"\x01\x02\x03\x04" * 2048, 16000, 1000, "mp3", "b"),  # same payload
        ("c3", b"\x09\x08\x07\x06" * 2048, 16000, 1000, "mp3", "c"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    feats = {r["clip_id"]: r for r in SH.featurize(clips, cfg).filter("kind = 'pcm'").collect()}
    assert all(f["decode_ok"] for f in feats.values())
    assert feats["c1"]["n_shingles"] > 0
    assert tuple(feats["c1"]["shingles"]) == tuple(feats["c2"]["shingles"])
    assert tuple(feats["c1"]["shingles"]) != tuple(feats["c3"]["shingles"])


def test_registered_decoder_failure_stays_per_clip(spark, cfg, monkeypatch):
    def soft_fail(data: bytes):
        raise audio.AudioDecodeError("corrupt frame")

    monkeypatch.setitem(audio._DECODERS, "mp3", soft_fail)
    clips = spark.createDataFrame(
        [("c1", b"xx", 16000, 10, "mp3", "t")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    got = {r["kind"]: r for r in SH.featurize(clips, cfg).collect()}
    assert not got["pcm"]["decode_ok"]
