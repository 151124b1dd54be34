"""Header-only audio probes (functions/probe.py): every supported container
gets a hand-built minimal fixture and an exactness check on
codec/sr/duration — no decode, no external libs.  Plus the mixed-container
Spark ingest source built on them (sources/clips.py read_audio_directory).
"""

from __future__ import annotations

import numpy as np
import pytest

from consult_spark.datagen import _wav_bytes
from consult_spark.functions import probe as P
from consult_spark.functions.audio import AudioDecodeError, decode_flac
from consult_spark.sources.clips import read_audio_directory


# ---------------------------------------------------------------------- WAV


def test_probe_wav_pcm16():
    sr = 16000
    x = np.zeros(sr * 2, dtype=np.float64)  # 2 s of silence
    meta = P.probe_wav(_wav_bytes(x, sr))
    assert meta == {"codec": "pcm_s16le", "sr_hz": sr, "dur_ms": 2000, "n_channels": 1}


def test_probe_wav_mulaw_naming():
    from tests.test_codecs import _wav

    data = _wav(7, 8, 8000, bytes(8000))  # 1 s of mu-law
    meta = P.probe_wav(data)
    assert meta["codec"] == "pcm_mulaw" and meta["sr_hz"] == 8000
    assert meta["dur_ms"] == 1000


def test_probe_wav_ima_adpcm_block_math():
    from tests.test_codecs import _wav_ima

    block_align = 256
    samples_per_block = (block_align - 4) * 2 + 1  # mono: 505
    payload = bytes(block_align * 4)
    data = _wav_ima(payload, 8000, block_align, samples_per_block * 4)
    meta = P.probe_wav(data)
    assert meta["codec"] == "adpcm_ima_wav"
    # fact chunk (if present) or block math must agree with the decoder
    assert meta["dur_ms"] == samples_per_block * 4 * 1000 // 8000


def test_probe_wav_rejects_non_riff():
    with pytest.raises(AudioDecodeError):
        P.probe_wav(b"NOPE" + bytes(64))


# --------------------------------------------------------------------- FLAC


def _flac_streaminfo(sr: int, nch: int, bps: int, total: int) -> bytes:
    """Minimal fLaC stream: one last-flagged STREAMINFO block, no frames."""
    bits = (
        f"{4096:016b}{4096:016b}{0:024b}{0:024b}"
        f"{sr:020b}{nch - 1:03b}{bps - 1:05b}{total:036b}"
    )
    body = int(bits, 2).to_bytes(18, "big") + bytes(16)  # + md5 placeholder
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def test_probe_flac_streaminfo():
    data = _flac_streaminfo(44100, 2, 16, 44100 * 3)
    meta = P.probe_flac(data)
    assert meta == {"codec": "flac", "sr_hz": 44100, "dur_ms": 3000, "n_channels": 2}


def test_probe_flac_matches_decoder_on_real_stream():
    """The probe's STREAMINFO bit-slicing must agree with the full decoder's
    on a stream the decoder accepts."""
    from tests.test_flac import encode_flac

    sr = 8000
    x = [int(v) for v in (np.sin(np.arange(sr) * 0.05) * 12000).astype(np.int64)]
    data = encode_flac([x], sr=sr, bps=16)
    meta = P.probe_flac(data)
    pcm, dec_sr = decode_flac(data)
    assert meta["sr_hz"] == dec_sr == sr
    assert meta["dur_ms"] == pcm.shape[0] * 1000 // sr
    assert meta["n_channels"] == 1


# ---------------------------------------------------------------------- MP3


def _mp3_frames(n: int, bitrate_kbps: int = 128, sr: int = 44100) -> bytes:
    """n CBR MPEG1 Layer III frames (header + zero payload)."""
    br_idx = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
              128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}[bitrate_kbps]
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sr]
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (br_idx << 12) | (sr_idx << 10)
    hdr = h.to_bytes(4, "big")
    size = 144 * bitrate_kbps * 1000 // sr
    return (hdr + bytes(size - 4)) * n


def test_probe_mp3_cbr_duration():
    data = _mp3_frames(100)  # 100 * 1152 / 44100 s
    meta = P.probe_mp3(data)
    assert meta["codec"] == "mp3" and meta["sr_hz"] == 44100
    assert meta["n_frames"] == 100 and meta["bitrate_kbps"] == 128
    assert meta["dur_ms"] == 100 * 1152 * 1000 // 44100


def test_probe_mp3_id3v2_skip_and_vbr():
    # syncsafe size 300: ID3v2 header + 300 bytes of tag, then mixed-bitrate
    # frames — the walk must skip the tag and read every frame's own header
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 300 >> 7, 300 & 0x7F]) + bytes(300)
    data = tag + _mp3_frames(10, 128) + _mp3_frames(10, 192)
    meta = P.probe_mp3(data)
    assert meta["n_frames"] == 20
    assert meta["bitrate_kbps"] == (128 * 10 + 192 * 10) // 20
    assert meta["dur_ms"] == 20 * 1152 * 1000 // 44100


def test_probe_mp3_resync_over_junk_leader():
    data = b"\x00junkjunk" + _mp3_frames(5)
    assert P.probe_mp3(data)["n_frames"] == 5


def test_probe_mp3_no_sync_raises():
    with pytest.raises(AudioDecodeError):
        P.probe_mp3(bytes(1024))


# ---------------------------------------------------------------------- OGG


def _ogg_page(payload: bytes, granule: int = 0, first: bool = True) -> bytes:
    nseg = (len(payload) + 254) // 255 or 1
    segs = []
    rest = len(payload)
    for _ in range(nseg - 1):
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (
        b"OggS" + bytes([0, 2 if first else 0])
        + granule.to_bytes(8, "little")
        + bytes(4) + bytes(4) + bytes(4)
        + bytes([len(segs)]) + bytes(segs) + payload
    )


def test_probe_ogg_vorbis():
    ident = b"\x01vorbis" + bytes(4) + bytes([2]) + (22050).to_bytes(4, "little") + bytes(16)
    data = _ogg_page(ident) + _ogg_page(b"\x05", granule=22050 * 4, first=False)
    meta = P.probe_ogg(data)
    assert meta["codec"] == "vorbis" and meta["sr_hz"] == 22050
    assert meta["n_channels"] == 2 and meta["dur_ms"] == 4000


def test_probe_ogg_opus():
    ident = b"OpusHead" + bytes([1, 1]) + bytes(2) + (16000).to_bytes(4, "little") + bytes(3)
    data = _ogg_page(ident) + _ogg_page(b"x", granule=48000 * 2, first=False)
    meta = P.probe_ogg(data)
    # opus output rate is always 48 kHz regardless of the input rate field
    assert meta["codec"] == "opus" and meta["sr_hz"] == 48000
    assert meta["dur_ms"] == 2000


def test_probe_ogg_foreign_stream_raises():
    data = _ogg_page(b"\x80theora" + bytes(16))
    with pytest.raises(AudioDecodeError):
        P.probe_ogg(data)


# ---------------------------------------------------------------------- MP4


def _box(name: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + name + body


def _mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        body = bytes([1]) + bytes(3) + bytes(16) + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big") + bytes(80)
    else:
        body = bytes([0]) + bytes(3) + bytes(8) + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big") + bytes(80)
    return _box(b"mvhd", body)


def _audio_trak(sr: int, duration: int, nch: int, entry: bytes = b"mp4a") -> bytes:
    """trak/mdia/(hdlr soun + mdhd + minf/stbl/stsd/mp4a) — the layout real
    muxers (ffmpeg/iTunes) emit; mdhd timescale = sample rate, stsd carries
    channelcount + 16.16 samplerate."""
    mdhd = _box(b"mdhd", bytes([0]) + bytes(3) + bytes(8) + sr.to_bytes(4, "big") + duration.to_bytes(4, "big") + bytes(4))
    hdlr = _box(b"hdlr", bytes(8) + b"soun" + bytes(12))
    sample_entry = _box(entry, bytes(16) + nch.to_bytes(2, "big") + (16).to_bytes(2, "big") + bytes(4) + ((sr << 16).to_bytes(4, "big")))
    stsd = _box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + sample_entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", mdia)


def _m4a(timescale: int, duration: int) -> bytes:
    """Legacy header: moov with ONLY an mvhd (no trak)."""
    moov = _box(b"moov", _mvhd(timescale, duration))
    ftyp = (16).to_bytes(4, "big") + b"ftypM4A " + bytes(4)
    return ftyp + moov


def _m4a_real(movie_ts: int, sr: int, dur_s: int, nch: int) -> bytes:
    """ffmpeg-style: mvhd timescale is a tick rate (600/1000), the audio
    trak carries the true sample rate and channel count."""
    moov = _box(b"moov", _mvhd(movie_ts, movie_ts * dur_s) + _audio_trak(sr, sr * dur_s, nch))
    ftyp = (16).to_bytes(4, "big") + b"ftypM4A " + bytes(4)
    return ftyp + moov


def test_probe_mp4_mvhd_legacy_fallback():
    meta = P.probe_mp4(_m4a(44100, 44100 * 7))
    assert meta["codec"] == "aac" and meta["sr_hz"] == 44100
    assert meta["dur_ms"] == 7000


def test_probe_mp4_real_muxer_layout():
    # the ADVICE r6 case: mvhd timescale=1000 (iTunes/ffmpeg tick rate) —
    # sr must come from the audio trak, NOT the movie header
    meta = P.probe_mp4(_m4a_real(1000, 44100, 7, 1))
    assert meta["sr_hz"] == 44100
    assert meta["n_channels"] == 1
    assert meta["dur_ms"] == 7000
    # and with the classic 600 tick rate + stereo 48 kHz
    meta = P.probe_mp4(_m4a_real(600, 48000, 3, 2))
    assert meta["sr_hz"] == 48000 and meta["n_channels"] == 2 and meta["dur_ms"] == 3000


def test_probe_mp4_video_trak_ignored():
    # a movie with a video trak first must still pick the SOUND trak
    vmdhd = _box(b"mdhd", bytes([0]) + bytes(3) + bytes(8) + (90000).to_bytes(4, "big") + (90000 * 7).to_bytes(4, "big") + bytes(4))
    vhdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    vtrak = _box(b"trak", _box(b"mdia", vmdhd + vhdlr))
    moov = _box(b"moov", _mvhd(1000, 7000) + vtrak + _audio_trak(22050, 22050 * 7, 2))
    meta = P.probe_mp4((16).to_bytes(4, "big") + b"ftypM4A " + bytes(4) + moov)
    assert meta["sr_hz"] == 22050 and meta["n_channels"] == 2 and meta["dur_ms"] == 7000


def test_probe_mp4_v1_mvhd_short_body_rejected():
    # version-1 mvhd whose body is 28..31 bytes: duration would read past
    # the box into the next box's bytes — must NOT parse (ADVICE r6 low)
    short = bytes([1]) + bytes(3) + bytes(16) + (1000).to_bytes(4, "big") + bytes(4)  # 28-byte body
    moov = _box(b"moov", _box(b"mvhd", short))
    with pytest.raises(AudioDecodeError):
        P.probe_mp4((16).to_bytes(4, "big") + b"ftypM4A " + bytes(4) + moov)
    # a full 32+-byte v1 body parses fine
    ftyp = (16).to_bytes(4, "big") + b"ftypM4A " + bytes(4)
    meta = P.probe_mp4(ftyp + _box(b"moov", _mvhd(1000, 7000, version=1)))
    assert meta["dur_ms"] == 7000


def test_probe_mp4_missing_moov_raises():
    with pytest.raises(AudioDecodeError):
        P.probe_mp4((16).to_bytes(4, "big") + b"ftypM4A " + bytes(4))


# ----------------------------------------------------------------- dispatch


def test_probe_audio_dispatch_and_sniff():
    wav = _wav_bytes(np.zeros(8000), 8000)
    assert P.probe_audio(wav)["codec"] == "pcm_s16le"
    assert P.probe_audio(_mp3_frames(3))["codec"] == "mp3"
    assert P.sniff_codec(_flac_streaminfo(8000, 1, 16, 8000)) == "flac"
    assert P.sniff_codec(b"\x00garbage\x00" * 8) == "unknown"
    assert P.sniff_codec(b"") == "unknown"


# ------------------------------------------------------- Spark ingest source


def test_read_audio_directory_mixed_containers(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.wav").write_bytes(_wav_bytes(np.zeros(16000), 16000))
    (d / "b.flac").write_bytes(_flac_streaminfo(22050, 1, 16, 22050))
    (d / "c.mp3").write_bytes(_mp3_frames(50))
    (d / "d.bin").write_bytes(b"\x00not audio at all\x00" * 4)
    got = {r["clip_id"]: r for r in read_audio_directory(spark, str(d)).collect()}
    assert got["a"]["codec"] == "pcm_s16le" and got["a"]["dur_ms"] == 1000
    assert got["b"]["codec"] == "flac" and got["b"]["sr_hz"] == 22050
    assert got["c"]["codec"] == "mp3" and got["c"]["dur_ms"] == 50 * 1152 * 1000 // 44100
    # unknown container keeps flowing with soft metadata, bytes intact
    assert got["d"]["codec"] == "unknown" and got["d"]["sr_hz"] == 0
    assert len(bytes(got["d"]["bytes"])) > 0
