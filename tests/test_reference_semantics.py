"""Reference-shaped micro-fixture (FIXTURES.md §3): pins the transplanted
algebra against CONSULT's own defaults without needing the missing upstream
golden blobs.

A tiny, self-contained NumPy model of CONSULT's probe pipeline — two-plane
encoding (main_map.cpp:1221-1256), L tables of K sampled positions
(main_map.cpp:385-486), capacity-capped buckets (main_map.cpp:592-623),
Hamming<=p verification (hd(), main_search.cpp:1238-1259), c-threshold reads
(main_search.cpp:883-894) — run at the reference defaults L=2, K=15, p=3,
c=1, cap=28 (main_map.cpp:198-229) over planted <=3-mismatch copies.

Asserts: (a) verified matches are exactly the <=p-mismatch plants;
(b) the empirical per-k-mer catch rate equals the analytic
C(32-d,K)/C(32,K) amplification within tolerance — the same S-curve algebra
our Config.band_catch_probability encodes for MinHash banding."""

from __future__ import annotations

from math import comb

import numpy as np

SL = 32  # k-mer length, #define SL 32 (main_map.cpp:61)
L, K, P, C, CAP = 2, 15, 3, 1, 28  # reference defaults (main_map.cpp:198-229)

BASES = "ACGT"


def two_plane_encode(s: str) -> int:
    """T -> 2^32+1, G -> 2^32, C -> 1, A -> 0, shifted per position —
    the layout that makes Hamming = popcount(low | high of xor)."""
    b = 0
    for ch in s:
        b <<= 1
        if ch == "T":
            b += (1 << 32) + 1
        elif ch == "G":
            b += 1 << 32
        elif ch == "C":
            b += 1
    return b


def hd(x: int, y: int) -> int:
    z = x ^ y
    return bin((z & 0xFFFFFFFF) | (z >> 32)).count("1")


def sample_positions(rng: np.random.Generator) -> list[np.ndarray]:
    return [rng.choice(SL, size=K, replace=False) for _ in range(L)]


def signature(s: str, pos: np.ndarray) -> tuple:
    return tuple(s[i] for i in pos)


def test_consult_probe_semantics():
    rng = np.random.default_rng(4242)

    # library: 500 random 32-mers
    lib = ["".join(BASES[i] for i in rng.integers(0, 4, SL)) for _ in range(500)]
    positions = sample_positions(rng)

    # index: per table, signature -> <=CAP member list (first-come capped)
    tables: list[dict] = [{} for _ in range(L)]
    for idx, kmer in enumerate(lib):
        for l in range(L):
            sig = signature(kmer, positions[l])
            slot = tables[l].setdefault(sig, [])
            if len(slot) < CAP:
                slot.append(idx)

    enc = [two_plane_encode(s) for s in lib]

    def probe(q: str) -> bool:
        qe = two_plane_encode(q)
        for l in range(L):
            for idx in tables[l].get(signature(q, positions[l]), []):
                if hd(qe, enc[idx]) <= P:
                    return True  # early exit (main_search.cpp:868-880)
        return False

    # queries: planted d-mismatch copies for d = 0..6
    n_per_d = 300
    caught = {d: 0 for d in range(7)}
    for d in range(7):
        for _ in range(n_per_d):
            base = lib[int(rng.integers(0, len(lib)))]
            mut = list(base)
            for i in rng.choice(SL, size=d, replace=False):
                mut[i] = BASES[(BASES.index(mut[i]) + int(rng.integers(1, 4))) % 4]
            if probe("".join(mut)):
                caught[d] += 1

    # (a) d <= p: catch rate must equal the bit-sampling amplification
    for d in range(P + 1):
        expect = 1 - (1 - comb(SL - d, K) / comb(SL, K)) ** L
        got = caught[d] / n_per_d
        assert abs(got - expect) < 0.08, (d, got, expect)

    # (b) d > p: verification must reject everything the sampler happens to
    # catch — EXCEPT accidental <=p-matches to a different library k-mer,
    # which are vanishingly rare at this scale
    for d in range(P + 1, 7):
        assert caught[d] / n_per_d <= 0.02, (d, caught[d])

    # d=0 must always be found (exact member, all positions agree)
    assert caught[0] == n_per_d


def test_minhash_scurve_matches_reference_shape(cfg):
    """Our Config's band S-curve is the same amplification law:
    1-(1-q^K)^L, monotone, with the operating point sized so the planted-dup
    similarity floor (~0.58 measured) clears 0.98 catch."""
    assert cfg.band_catch_probability(0.0) == 0.0
    assert cfg.band_catch_probability(1.0) == 1.0
    assert cfg.band_catch_probability(0.58) > 0.97
    assert cfg.band_catch_probability(0.30) < 0.25
    xs = np.linspace(0, 1, 21)
    ys = [cfg.band_catch_probability(x) for x in xs]
    assert all(b >= a for a, b in zip(ys, ys[1:]))
