"""Audio decode + feature tests, incl. the per-row invariant
(decoded-PCM allclose / SNR>=30dB vs the independent stdlib-wave decode,
transcript equality) from the input contract."""

from __future__ import annotations

import numpy as np
import pytest

from consult_spark.functions import audio
from tests import oracle as O


def test_decode_matches_stdlib_wave(corpus_xs):
    """Per-row invariant: engine decode vs oracle (stdlib wave) decode —
    bit-exact, which trivially clears allclose at SNR>=30dB."""
    for _, row in corpus_xs["clips"].head(25).iterrows():
        x_engine, sr_e = audio.decode_wav_pcm16(row["bytes"])
        x_oracle, sr_o = O.decode(row["bytes"])
        assert sr_e == sr_o == row["sr_hz"]
        assert x_engine.shape == x_oracle.shape
        assert np.allclose(x_engine, x_oracle, atol=0)
        assert audio.snr_db(x_oracle, x_engine.astype(np.float64)) == float("inf")


def test_transcript_equality_invariant(corpus_xs, spark, clips_xs):
    """Transcripts survive the Spark round trip byte-identically."""
    back = {r["clip_id"]: r["transcript"] for r in clips_xs.select("clip_id", "transcript").collect()}
    for _, row in corpus_xs["clips"].iterrows():
        assert back[row["clip_id"]] == row["transcript"]


def test_decode_rejects_garbage():
    with pytest.raises(audio.AudioDecodeError):
        audio.decode_wav_pcm16(b"not a wav file at all")


def test_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        audio.decode_clip(b"\x00" * 64, "mp3")
    with pytest.raises(audio.AudioDecodeError):
        audio.decode_clip(b"\x00" * 64, "weird_codec")


def test_quantize_gain_invariance(cfg):
    """A uniform gain change must not move a single symbol (median-centered)."""
    rng = np.random.default_rng(3)
    db = rng.uniform(-20, 0, size=300)
    base = audio.quantize_energy(db, cfg.energy_bins, cfg.energy_bin_db)
    shifted = audio.quantize_energy(db + 3.7, cfg.energy_bins, cfg.energy_bin_db)
    assert (base == shifted).all()


def test_dual_lattice_disjoint_boundaries(cfg):
    """A value near an offset-0 bin edge is mid-bin at offset 0.5."""
    eps = 1e-6
    edge = cfg.energy_bin_db  # an offset-0 boundary (after median centering)
    # median of this array is exactly 0, so centering is a no-op
    vals = np.array([0.0, edge - eps, edge + eps, -(edge - eps), -(edge + eps)])
    # lattice A flips across the edge...
    a = audio.quantize_energy(vals, cfg.energy_bins, cfg.energy_bin_db, offset=0.0)
    assert a[1] != a[2]
    # ...lattice B does not
    b = audio.quantize_energy(vals, cfg.energy_bins, cfg.energy_bin_db, offset=0.5)
    assert b[1] == b[2]


def test_frame_features_shapes(corpus_xs, cfg):
    row = corpus_xs["clips"].iloc[0]
    x, sr = audio.decode_wav_pcm16(row["bytes"])
    log_e, ratios, centroid = audio.frame_features(x, sr, cfg.frame_ms, cfg.hop_ms)
    frame = sr * cfg.frame_ms // 1000
    hop = sr * cfg.hop_ms // 1000
    expected = (x.shape[0] - frame) // hop + 1
    assert log_e.shape[0] == expected
    assert ratios.shape == (expected, 4)
    assert centroid.shape[0] == expected
    assert (ratios <= 0).all() and (ratios >= audio.RATIO_FLOOR_DB).all()
    assert (centroid >= 0).all()


def test_band_ratio_gain_invariance(corpus_xs, cfg):
    row = corpus_xs["clips"].iloc[1]
    x, sr = audio.decode_wav_pcm16(row["bytes"])
    _, r1, c1 = audio.frame_features(x, sr, cfg.frame_ms, cfg.hop_ms)
    _, r2, c2 = audio.frame_features(x * 0.5, sr, cfg.frame_ms, cfg.hop_ms)
    assert np.allclose(r1, r2, atol=1e-9)
    assert np.allclose(c1, c2, atol=1e-9)


def test_planted_variant_snr_invariant(corpus_xs):
    """FIXTURES contract: dup variants stay within SNR>=30dB of their base."""
    lay = corpus_xs["layout"]
    clips = corpus_xs["clips"].set_index("clip_id")
    checked = 0
    for t in lay[(lay.group_kind == "dup") & (lay.variant_idx > 0)].head(20).itertuples(index=False):
        base_id = f"clip_{t.base_idx:08d}_v0"
        if base_id not in clips.index:
            continue
        xb, _ = audio.decode_wav_pcm16(clips.loc[base_id, "bytes"])
        xv, _ = audio.decode_wav_pcm16(clips.loc[t.clip_id, "bytes"])
        assert audio.snr_db(xb, xv) >= 30.0, t.clip_id
        checked += 1
    assert checked > 5
