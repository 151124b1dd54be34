"""Vectorized hashing kernels (NumPy, uint64 wrap-around arithmetic).

These are the compute core of the engine — the analog of CONSULT's
``encodekmer`` (2-bit pack, main_map.cpp:1221-1256), ``encodekmer_bits``
(L x K bit-sampling signatures, main_map.cpp:1319-1338) and ``hd``
(two-plane popcount Hamming, main_map.cpp:1296-1317) — but expressed as
batch NumPy transforms so Arrow/pandas UDFs stay off the per-row Python
path entirely.

Everything here is seeded and platform-stable (pure integer arithmetic,
no ``hash()``, no RNG state), mirroring the fixed-position variant's
determinism stance (map_fixed_pos/main_map_fixed_pos.cpp:423-437).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
MERSENNE61 = np.uint64((1 << 61) - 1)

_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a cheap, high-quality 64-bit mixer."""
    with np.errstate(over="ignore"):
        z = (x.astype(_U64) + _SM_GAMMA)
        z = (z ^ (z >> _U64(30))) * _SM_M1
        z = (z ^ (z >> _U64(27))) * _SM_M2
        return z ^ (z >> _U64(31))


def hash_combine(a: np.ndarray, b) -> np.ndarray:
    """Order-sensitive 64-bit combine (boost-style, splitmix finalized)."""
    a = np.asarray(a, dtype=_U64)
    b = np.asarray(b, dtype=_U64)
    with np.errstate(over="ignore"):
        return splitmix64(a ^ (splitmix64(b) + _SM_GAMMA + (a << _U64(6)) + (a >> _U64(2))))


def bytes_shingle_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """All width-k window hashes over a 1-D uint8/uint64 symbol array.

    Vectorized analog of CONSULT's rolling ``update_kmer``
    (main_search.cpp:1169-1200): instead of an O(1) per-step update we hash
    every window at once with a polynomial rolling scheme evaluated by
    cumulative prefix products — O(n) total, no Python loop over windows.
    Returns uint64[n - k + 1]; empty array if n < k.
    """
    sym = np.asarray(data, dtype=_U64)
    n = sym.shape[0]
    if n < k:
        return np.empty(0, dtype=_U64)
    # windows via stride tricks, then fold with per-position multipliers.
    win = np.lib.stride_tricks.sliding_window_view(sym, k)
    mult = np.empty(k, dtype=_U64)
    m = _U64(0x100000001B3)  # FNV-ish odd multiplier
    acc = _U64(1)
    for i in range(k - 1, -1, -1):
        mult[i] = acc
        with np.errstate(over="ignore"):
            acc = acc * m
    with np.errstate(over="ignore"):
        h = (win * mult[None, :]).sum(axis=1, dtype=_U64)
    return splitmix64(h)


def pack_symbols_u64(sym: np.ndarray, k: int, bits: int) -> np.ndarray:
    """Exact fixed-width pack of k b-bit symbols into one uint64 per window
    (the direct analog of encodekmer's 32x2-bit pack, main_map.cpp:1221-1256).
    Requires k * bits <= 64. Returns uint64[n - k + 1]."""
    assert k * bits <= 64
    sym = np.asarray(sym, dtype=_U64)
    n = sym.shape[0]
    if n < k:
        return np.empty(0, dtype=_U64)
    win = np.lib.stride_tricks.sliding_window_view(sym, k)
    shifts = (_U64(bits) * np.arange(k - 1, -1, -1, dtype=_U64))
    with np.errstate(over="ignore"):
        return (win << shifts[None, :]).astype(_U64).sum(axis=1, dtype=_U64)


def text_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char shingle hashes of a normalized string -> uint64[]."""
    norm = " ".join(text.lower().split())
    b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
    if b.shape[0] < k:
        if b.shape[0] == 0:
            return np.empty(0, dtype=_U64)
        return np.unique(bytes_shingle_hashes(b, b.shape[0]))
    return np.unique(bytes_shingle_hashes(b, k))


EMPTY_MINHASH = _U64(0xFFFFFFFFFFFFFFFF)


def minhash(shingles: np.ndarray, n_hashes: int, seed: int) -> np.ndarray:
    """MinHash signature over one set of uint64 shingle hashes (see
    minhash_batch). Returns uint64[n_hashes]."""
    return minhash_batch([np.asarray(shingles, dtype=_U64)], n_hashes, seed)[0]


def minhash_batch(shingle_sets: list[np.ndarray], n_hashes: int, seed: int) -> np.ndarray:
    """MinHash for many sets at once -> uint64[n_sets, n_hashes].

    Kirsch–Mitzenmacher double hashing: two independent splitmix64 streams
    h1, h2 per shingle; the i-th hash is ``h1 + i * h2`` (uint64 wraparound,
    h2 forced odd).  This is the standard way to get n_hashes permutations
    from two strong ones, and it vectorizes: two mix passes over the
    flattened shingle pool, then n_hashes fused multiply-add +
    segment-minimum passes — no Python loop over documents.

    The analog of CONSULT's L x K bit-sampled signatures
    (main_map.cpp:385-486, 1319-1338), with seeds pinned in Config the way
    the fixed-position variant pins its sampling positions
    (map_fixed_pos/main_map_fixed_pos.cpp:423-437).
    Empty sets get the EMPTY_MINHASH sentinel (all 0xFF..F).
    """
    sizes = np.array([s.shape[0] for s in shingle_sets], dtype=np.int64)
    n_sets = len(shingle_sets)
    out = np.full((n_sets, n_hashes), EMPTY_MINHASH, dtype=_U64)
    nz = sizes > 0
    if not nz.any():
        return out
    flat = np.concatenate([np.asarray(s, dtype=_U64) for s in shingle_sets if s.shape[0] > 0])
    with np.errstate(over="ignore"):
        h1 = splitmix64(flat ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))
        h2 = splitmix64(flat ^ _U64((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF)) | _U64(1)
    n_seg = int(nz.sum())
    starts = np.zeros(n_seg, dtype=np.int64)
    np.cumsum(sizes[nz][:-1], out=starts[1:])
    rows = np.flatnonzero(nz)
    # scalar-broadcast FMA per hash keeps the inner loop contiguous (a
    # broadcasted outer product is ~500x slower in numpy); each pass is two
    # vector ops + one segment-min over the flat pool.
    v = np.empty_like(h1)
    for i in range(n_hashes):
        with np.errstate(over="ignore"):
            np.multiply(h2, _U64(i), out=v)
            np.add(v, h1, out=v)
        out[rows, i] = np.minimum.reduceat(v, starts)
    return out


def simhash_batch(shingle_sets: list[np.ndarray], bits: int = 64, seed: int = 0) -> np.ndarray:
    """64-bit SimHash per set (the verify fingerprint — analog of the
    two-plane ``b`` encoding, main_map.cpp:1221-1256). Majority vote per bit
    over splitmix64-mixed shingle hashes. Returns uint64[n_sets]."""
    assert bits == 64
    out = np.zeros(len(shingle_sets), dtype=_U64)
    sizes = np.array([s.shape[0] for s in shingle_sets], dtype=np.int64)
    nz = sizes > 0
    if not nz.any():
        return out
    flat = np.concatenate([s for s in shingle_sets if s.shape[0] > 0]).astype(_U64)
    with np.errstate(over="ignore"):
        mixed = splitmix64(flat ^ _U64(seed))
    # expand to bit matrix in chunks of 8 bits to bound memory
    n_seg = int(nz.sum())
    starts = np.zeros(n_seg, dtype=np.int64)
    np.cumsum(sizes[nz][:-1], out=starts[1:])
    fp = np.zeros(n_seg, dtype=_U64)
    for j in range(64):
        bit = ((mixed >> _U64(j)) & _U64(1)).astype(np.int64)
        np.multiply(bit, 2, out=bit)
        np.subtract(bit, 1, out=bit)  # ±1 votes, contiguous
        sums = np.add.reduceat(bit, starts)
        fp |= (sums > 0).astype(_U64) << _U64(j)
    out[np.flatnonzero(nz)] = fp
    return out


def band_hashes(signatures: np.ndarray, n_bands: int, rows_per_band: int, seed: int) -> np.ndarray:
    """Fold a (n_sets x n_hashes) MinHash matrix into (n_sets x n_bands)
    band hashes (the bucket keys — analog of the (tag, big_sig_hash) split,
    main_map.cpp:574-584, with the full hash as the key)."""
    n_sets = signatures.shape[0]
    out = np.empty((n_sets, n_bands), dtype=_U64)
    for l in range(n_bands):
        block = signatures[:, l * rows_per_band : (l + 1) * rows_per_band]
        h = splitmix64(np.full(n_sets, (seed ^ l), dtype=_U64))
        for r in range(rows_per_band):
            h = hash_combine(h, block[:, r])
        out[:, l] = h
    return out


def hamming64(a, b) -> np.ndarray:
    """popcount(a ^ b) — the exact-verify distance (hd(), main_map.cpp:1296-1317
    computes the same popcount over an xor, just on a two-plane layout)."""
    x = np.atleast_1d(np.asarray(a, dtype=_U64) ^ np.asarray(b, dtype=_U64))
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int32)
    by = x.view(np.uint8).reshape(x.shape[0], 8)
    return np.unpackbits(by, axis=1).sum(axis=1).astype(np.int32)
