"""WAV sample-format codecs (pure numpy, no decoder libraries): PCM16,
PCM8, IEEE float32, G.711 mu-law / A-law.  Each variant is synthesized by
an independent REFERENCE ENCODER here (textbook companding formulas,
per-sample python loop) and must decode back to the original signal within
the format's quantization SNR."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from consult_spark.functions import audio


def _wav(fmt_tag: int, bits: int, sr: int, payload: bytes, n_channels: int = 1) -> bytes:
    block = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_channels, sr, sr * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _signal(n: int = 4000, sr: int = 8000) -> np.ndarray:
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1100 * t)).astype(np.float64)


def _mulaw_encode_ref(x: np.ndarray) -> bytes:
    """Textbook G.711 mu-law encoder (per-sample loop — independent of the
    vectorized decoder under test)."""
    out = bytearray()
    for v in np.clip(x * 32768.0, -32635, 32635).astype(np.int64):
        sign = 0x80 if v < 0 else 0
        if v < 0:
            v = -v
        v += 0x84
        exponent = 7
        mask = 0x4000
        while exponent > 0 and not (v & mask):
            exponent -= 1
            mask >>= 1
        mantissa = (v >> (exponent + 3)) & 0x0F
        out.append(~(sign | (exponent << 4) | mantissa) & 0xFF)
    return bytes(out)


_SEG_AEND = (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)


def _alaw_encode_ref(x: np.ndarray) -> bytes:
    """Textbook (sox linear2alaw) G.711 A-law encoder, per-sample loop."""
    out = bytearray()
    for vf in np.clip(x * 32768.0, -32768, 32767).astype(np.int64):
        v = int(vf)
        mask = 0xD5 if v >= 0 else 0x55  # sign (7th) bit toggled by 0x55
        if v < 0:
            v = -v - 8
        if v < 0:
            v = 0
        seg = next((i for i, e in enumerate(_SEG_AEND) if v <= e), 8)
        if seg >= 8:
            out.append(0x7F ^ mask)
        else:
            aval = seg << 4
            aval |= (v >> 4) & 0x0F if seg < 2 else (v >> (seg + 3)) & 0x0F
            out.append(aval ^ mask)
    return bytes(out)


def _snr(ref: np.ndarray, got: np.ndarray) -> float:
    n = min(len(ref), len(got))
    err = ref[:n] - got[:n]
    return 10 * np.log10(np.square(ref[:n]).sum() / max(np.square(err).sum(), 1e-30))


def test_pcm16_roundtrip():
    x = _signal()
    payload = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    got, sr = audio.decode_wav_pcm16(_wav(1, 16, 8000, payload))
    assert sr == 8000 and _snr(x, got) > 80


def test_pcm8_roundtrip():
    x = _signal()
    payload = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    got, _ = audio.decode_wav_pcm16(_wav(1, 8, 8000, payload))
    assert _snr(x, got) > 35  # 8-bit linear quantization noise


def test_float32_roundtrip():
    x = _signal()
    got, _ = audio.decode_wav_pcm16(_wav(3, 32, 8000, x.astype("<f4").tobytes()))
    assert _snr(x, got) > 120


def test_mulaw_decode_matches_reference_encoder():
    x = _signal()
    got, _ = audio.decode_wav_pcm16(_wav(7, 8, 8000, _mulaw_encode_ref(x)))
    assert _snr(x, got) > 30  # G.711 companding ~35-38 dB SNR


def test_alaw_decode_matches_reference_encoder():
    x = _signal()
    got, _ = audio.decode_wav_pcm16(_wav(6, 8, 8000, _alaw_encode_ref(x)))
    assert _snr(x, got) > 30


def test_decode_clip_dispatch_and_stub():
    x = _signal(800)
    wav = _wav(7, 8, 8000, _mulaw_encode_ref(x))
    got, sr = audio.decode_clip(wav, "pcm_mulaw")
    assert sr == 8000 and len(got) == 800
    with pytest.raises(NotImplementedError):
        audio.decode_clip(b"\xff\xfb" + b"\x00" * 100, "mp3")
    with pytest.raises(audio.AudioDecodeError):
        audio.decode_clip(b"junk", "wav")


def test_full_pipeline_accepts_mulaw_clip(spark, cfg):
    """A mu-law clip rides the whole featurize path (no decode_ok=False)."""
    import pandas as pd
    from consult_spark.operators import shingle as SH

    x = _signal(16000, 16000)
    rows = pd.DataFrame(
        [("mulaw_0", _wav(7, 8, 16000, _mulaw_encode_ref(x)), 16000, 1000, "pcm_mulaw", "hello world " * 5)],
        columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
    )
    feats = SH.featurize(spark.createDataFrame(rows), cfg).collect()
    pcm = [r for r in feats if r["kind"] == "pcm"][0]
    assert pcm["decode_ok"] is True and pcm["n_shingles"] > 0
