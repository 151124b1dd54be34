"""Property-based tests (hypothesis) for the hashing/audio kernels — the
algebraic invariants the pipeline's correctness leans on, explored over
generated inputs instead of fixed examples."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from consult_spark.functions import audio
from consult_spark.functions import hashing as H

u16 = st.integers(min_value=0, max_value=0xFFFF)


@settings(max_examples=50, deadline=None)
@given(st.lists(u16, min_size=4, max_size=200))
def test_pack_symbols_bijective_on_windows(sym):
    """pack_symbols_u64 must be injective per window: two windows pack to
    the same uint64 iff their symbol tuples are equal (exact 16-bit fields,
    no mixing)."""
    arr = np.array(sym, dtype=np.uint64)
    packed = H.pack_symbols_u64(arr, 4, 16)
    windows = [tuple(sym[i : i + 4]) for i in range(len(sym) - 3)]
    assert len(packed) == len(windows)
    seen: dict = {}
    for w, p in zip(windows, packed):
        assert seen.setdefault(int(p), w) == w
    # and the pack is exactly the big-endian 16-bit concatenation
    for w, p in zip(windows, packed):
        expect = (w[0] << 48) | (w[1] << 32) | (w[2] << 16) | w[3]
        assert int(p) == expect


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=300),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_minhash_is_permutation_min(shingles, seed):
    """Each MinHash coordinate equals the explicit min over the set's
    per-element hash stream (the segment-min vectorization is exact)."""
    s = np.unique(np.array(shingles, dtype=np.uint64))
    sig = H.minhash(s, 8, seed)
    h1 = H.splitmix64(s ^ np.uint64(seed))
    h2 = H.splitmix64(s ^ np.uint64((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF)) | np.uint64(1)
    for i in range(8):
        with np.errstate(over="ignore"):
            expect = (h1 + np.uint64(i) * h2).min()
        assert sig[i] == expect


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=100),
       st.sets(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=100))
def test_minhash_subset_dominance(a, b):
    """MinHash of a union is the elementwise min of the parts' signatures —
    the lattice property banding relies on."""
    sa = np.array(sorted(a), dtype=np.uint64)
    sb = np.array(sorted(b), dtype=np.uint64)
    su = np.array(sorted(a | b), dtype=np.uint64)
    seed = 0x5EED
    m = H.minhash_batch([sa, sb, su], 16, seed)
    assert (np.minimum(m[0], m[1]) == m[2]).all()


@settings(max_examples=25, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_text_shingles_whitespace_invariant(s):
    """Transcript normalization: any run of whitespace == one space, so
    shingle sets are invariant to whitespace style."""
    import re

    messy = re.sub(r" ", lambda _: "  \t ", s)
    a = set(H.text_shingle_hashes(s, 5).tolist())
    b = set(H.text_shingle_hashes(messy, 5).tolist())
    assert a == b


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_wav_parser_never_crashes_on_garbage(data):
    """Arbitrary bytes (including RIFF-prefixed garbage) must either decode
    or raise AudioDecodeError — never IndexError/OverflowError/hang: the
    per-clip soft-failure contract depends on the exception type."""
    for payload in (data, b"RIFF" + data, b"RIFF\x10\x00\x00\x00WAVE" + data):
        try:
            x, sr = audio.decode_wav_pcm16(payload)
            assert sr >= 0 and x.ndim == 1
        except audio.AudioDecodeError:
            pass


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=60), st.text(max_size=60),
       st.floats(min_value=0.1, max_value=1.0, allow_nan=False))
def test_substring_contained_matches_dp_oracle(a, b, frac):
    """Suffix-array LCS == the independent numpy DP, on arbitrary unicode."""
    from consult_spark.functions.suffixarray import substring_contained
    from tests.oracle import lcs_len

    ok, lcs = substring_contained(a, b, frac)
    assert lcs == lcs_len(a, b)  # both measure utf-8 byte LCS
    m = min(len(a), len(b))
    assert ok == bool(m > 0 and lcs >= frac * m)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), min_size=32, max_size=2000),
       st.sampled_from([8000, 16000]))
def test_wav_pcm16_roundtrip_property(samples, sr):
    """Any float signal written as PCM16 WAV decodes back within 16-bit
    quantization error, at the original length and rate."""
    import struct

    x = np.array(samples, dtype=np.float64)
    payload = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(payload)) + payload)
    got, got_sr = audio.decode_wav_pcm16(wav)
    assert got_sr == sr and got.shape[0] == x.shape[0]
    assert np.abs(np.clip(x, -1, 1) * 32767 / 32768.0 - got).max() <= 1.0 / 32768.0 + 1e-7


# --- round-4 decoder properties: PNG mixed per-row filters, ADPCM --------

def _encode_png_mixed(img, filters, color_type=2):
    """Independent per-byte PNG encoder applying a CHOSEN filter PER ROW
    (real encoders mix filters row-by-row; the single-filter test encoder
    in test_sources_multimodal never exercises row transitions)."""
    import zlib

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    h, w, ch = img.shape
    px = img.astype(int)
    raw = bytearray()
    prev = np.zeros((w, ch), int)
    for r in range(h):
        ft = filters[r % len(filters)]
        cur = px[r]
        line = np.zeros((w, ch), int)
        for x in range(w):
            a = cur[x - 1] if x else np.zeros(ch, int)
            b = prev[x]
            c = prev[x - 1] if x else np.zeros(ch, int)
            if ft == 0:
                pred = np.zeros(ch, int)
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            line[x] = (cur[x] - pred) % 256
        raw += bytes([ft]) + line.astype(np.uint8).tobytes()
        prev = cur
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color_type, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),   # height
    st.integers(min_value=1, max_value=12),   # width
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_mixed_per_row_filters_roundtrip(h, w, filters, seed):
    """Decode(encode(img)) == img for ANY per-row filter sequence — the
    filter state (prev row) must thread correctly across rows that switch
    filter types, including 1-pixel-wide images where left refs vanish."""
    from consult_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = MM.decode_image(_encode_png_mixed(img, filters), "png")
    assert np.array_equal(got, img)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([12, 20, 256]),           # block_align
    st.integers(min_value=1, max_value=4),    # n_blocks
)
def test_ima_adpcm_vectorized_equals_sequential(seed, ba, n_blocks):
    """The block-vectorized IMA-ADPCM decoder must agree bit-exactly with
    a per-nibble sequential walk for arbitrary nibble streams with valid
    headers (mono)."""
    rng = np.random.default_rng(seed)
    payload = bytearray(rng.integers(0, 256, size=n_blocks * ba, dtype=np.uint8).tobytes())
    for b in range(n_blocks):
        payload[b * ba + 2] = int(rng.integers(0, 89))
        payload[b * ba + 3] = 0
    got = audio._decode_ima_adpcm(bytes(payload), ba, 1)
    step_t = audio._IMA_STEP_TABLE.tolist()
    idx_t = audio._IMA_INDEX_TABLE.tolist()
    ref = []
    for b0 in range(0, n_blocks * ba, ba):
        blk = bytes(payload[b0 : b0 + ba])
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        index = blk[2]
        ref.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = step_t[index]
                d = (step >> 3) + ((step >> 2) if nib & 1 else 0) \
                    + ((step >> 1) if nib & 2 else 0) + (step if nib & 4 else 0)
                pred = pred - d if nib & 8 else pred + d
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + idx_t[nib & 7]))
                ref.append(pred)
    assert np.array_equal(got, np.array(ref, dtype=np.float32) / 32768.0)
