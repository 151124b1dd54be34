"""Kernel parity: numpy uint64 kernels vs independent python-int oracle."""

from __future__ import annotations

import numpy as np

import consult_spark.functions.hashing as H
from consult_spark.config import Config
from tests import oracle as O

RNG = np.random.default_rng(7)


def test_splitmix64_matches_oracle():
    xs = RNG.integers(0, 2**64 - 1, size=200, dtype=np.uint64)
    got = H.splitmix64(xs)
    for x, g in zip(xs, got):
        assert int(g) == O.sm64(int(x))


def test_hash_combine_matches_oracle():
    a = RNG.integers(0, 2**64 - 1, size=50, dtype=np.uint64)
    b = RNG.integers(0, 2**64 - 1, size=50, dtype=np.uint64)
    got = H.hash_combine(a, b)
    for x, y, g in zip(a, b, got):
        assert int(g) == O.combine(int(x), int(y))


def test_poly_window_hash_matches_oracle():
    seq = RNG.integers(0, 255, size=60, dtype=np.uint64)
    for k in (1, 3, 5, 60):
        got = H.bytes_shingle_hashes(seq, k)
        exp = O.poly_hash_windows([int(v) for v in seq], k)
        assert [int(g) for g in got] == exp


def test_pack_symbols_matches_oracle():
    seq = RNG.integers(0, 2**12 - 1, size=40, dtype=np.uint64)
    got = H.pack_symbols_u64(seq, 5, 12)
    exp = O.pack_windows([int(v) for v in seq], 5, 12)
    assert [int(g) for g in got] == exp


def test_minhash_matches_oracle():
    cfg = Config()
    s = RNG.integers(0, 2**64 - 1, size=80, dtype=np.uint64)
    got = H.minhash(s, cfg.n_hashes, cfg.minhash_seed)
    exp = O.minhash_set({int(v) for v in s}, cfg.n_hashes, cfg.minhash_seed)
    assert [int(g) for g in got] == exp


def test_minhash_empty_sentinel():
    cfg = Config()
    got = H.minhash_batch([np.empty(0, dtype=np.uint64)], cfg.n_hashes, cfg.minhash_seed)
    assert (got == H.EMPTY_MINHASH).all()


def test_simhash_matches_oracle():
    cfg = Config()
    s = RNG.integers(0, 2**64 - 1, size=33, dtype=np.uint64)
    got = H.simhash_batch([s], seed=cfg.minhash_seed)
    assert int(got[0]) == O.simhash_set({int(v) for v in s}, cfg.minhash_seed)


def test_band_hashes_match_oracle():
    cfg = Config()
    s = RNG.integers(0, 2**64 - 1, size=30, dtype=np.uint64)
    sig = H.minhash_batch([s], cfg.n_hashes, cfg.minhash_seed)
    got = H.band_hashes(sig, cfg.n_bands, cfg.rows_per_band, cfg.band_seed)[0]
    exp = O.band_hash_list(
        [int(v) for v in sig[0]], cfg.n_bands, cfg.rows_per_band, cfg.band_seed
    )
    assert [int(g) for g in got] == exp


def test_minhash_is_order_and_duplication_invariant():
    cfg = Config()
    s = RNG.integers(0, 2**64 - 1, size=50, dtype=np.uint64)
    shuffled = s.copy()
    RNG.shuffle(shuffled)
    doubled = np.concatenate([s, s])
    a = H.minhash(s, cfg.n_hashes, cfg.minhash_seed)
    b = H.minhash(shuffled, cfg.n_hashes, cfg.minhash_seed)
    c = H.minhash(doubled, cfg.n_hashes, cfg.minhash_seed)
    assert (a == b).all() and (a == c).all()


def test_minhash_jaccard_estimate():
    """MinHash agreement rate estimates Jaccard (sanity of the LSH algebra)."""
    cfg = Config()
    a = RNG.integers(0, 2**64 - 1, size=400, dtype=np.uint64)
    b = np.concatenate([a[:300], RNG.integers(0, 2**64 - 1, size=100, dtype=np.uint64)])
    true_j = 300 / 500
    ma = H.minhash(np.unique(a), 512, cfg.minhash_seed)
    mb = H.minhash(np.unique(b), 512, cfg.minhash_seed)
    est = (ma == mb).mean()
    assert abs(est - true_j) < 0.08


def test_hamming64():
    a = np.array([0, 0xFF, 2**63], dtype=np.uint64)
    b = np.array([0, 0x0F, 0], dtype=np.uint64)
    assert list(H.hamming64(a, b)) == [0, 4, 1]
