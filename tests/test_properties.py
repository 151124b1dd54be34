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
