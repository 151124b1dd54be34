"""Frozen pipeline configuration.

CONSULT persists every parameter of the build (p, L, alpha, K, masks, chunk
counts) in a binary ``_meta`` header and the search executable refuses to run
without reading it back (reference: main_map.cpp:859-946, main_search.cpp:164-381).
The fixed-position variant (map_fixed_pos/main_map_fixed_pos.cpp:423-437) exists
precisely because unpinned randomness broke reproducibility.  We take the same
stance: every knob and every hash seed lives in one frozen dataclass that is
persisted next to the data (``config`` table) so build and search provably share
parameters, and all randomness is seeded.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class Config:
    """All parameters of the dedup pipeline. Frozen; persist via to_json()."""

    # ---- audio decode + framing (the analog of CONSULT's k-mer extraction) ----
    frame_ms: int = 25            # analysis window
    hop_ms: int = 10              # hop between frames
    energy_bins: int = 16         # quantization levels for median-normalized log-energy
    energy_bin_db: float = 1.5    # dB per quantization bin
    symbol_bits: int = 16         # 4 energy + 4 bands x 2 + 4 centroid bits
    k_pcm: int = 4                # symbols per PCM shingle; 4 x 16 bits = 64-bit pack
                                  # (analog of encodekmer's 32 x 2-bit pack, main_map.cpp:1221-1256)
    dual_lattice: bool = True     # union of offset-0 and offset-0.5 quantization lattices
    pcm_minimizer_w: int = 0      # B4 minimizer thinning for the pcm channel: keep the
                                  # min hash of each window of w consecutive shingles
                                  # (minimization.cpp:158-171; README.md:143-163 motivation).
                                  # Density 2/(w+1): w=6 -> ~3.3x fewer shingle rows with
                                  # dup-cluster recall still >= 0.99 (test_minimizer_thinning).
                                  # DEFAULT OFF for this corpus: the synthetic fixture's low
                                  # spectral entropy makes winnowed sets of unrelated clips
                                  # overlap (measured: false-pair jaccard p99 0.24 -> 0.73 at
                                  # w=6), costing pairwise precision 0.97 -> ~0.90; enable on
                                  # real high-entropy audio where the docstring of
                                  # test_s_tier_pairwise_precision does not apply.

    # ---- transcript shingling ----
    k_txt: int = 5                # character shingle width over normalized text

    # ---- MinHash / banding (analog of L x K bit-sampling, main_map.cpp:385-486) ----
    n_hashes: int = 128
    n_bands: int = 32             # L
    rows_per_band: int = 4        # K ; n_hashes == n_bands * rows_per_band
    minhash_seed: int = 0x5EED_C0DE
    band_seed: int = 0xBAD5EED5

    # ---- SimHash fingerprint (analog of the two-plane `b` encoding + hd(),
    #      main_map.cpp:1221-1256 / 1296-1317) ----
    simhash_bits: int = 64
    simhash_max_hamming: int = 3   # p (reference default p=3, main_map.cpp:198)
    simhash_prefilter_max: int = 24  # hd() prefilter before the fat shingle
                                     # join; measured dup-pair hamming tops
                                     # out at 19 (p99=16), unrelated median
                                     # is 32 — 24 keeps every dup with margin
                                     # and cuts ~95% of junk candidates

    # ---- bucket capacity / skew bound (analog of the 28-slot row cap,
    #      main_map.cpp:62, 592-623) ----
    bucket_cap: int = 64          # max members kept per (channel, band, hash) bucket
    n_salts: int = 8              # legacy (rounds 1-4): explicit salt fan-out
                                  # for hot buckets; superseded by Spark's
                                  # partial WindowGroupLimit map-side bound
                                  # (bands.py) — kept so recorded configs /
                                  # params hashes stay loadable

    # ---- verification + classification ----
    jaccard_threshold: float = 0.45   # exact-Jaccard confirm threshold (pcm channel);
                                      # sits between the measured planted-dup floor
                                      # (~0.53) and the unrelated ceiling (~0.24)
    # low-complexity masking: clips with tiny shingle sets (flat dynamics)
    # accidentally overlap other flat clips; pairs where EITHER side has
    # fewer than low_info_floor distinct pcm shingles must clear the
    # stricter threshold (the audio analog of masking low-complexity k-mers;
    # measured: kills 97% of accidental confirms at 0.07% recall cost).
    # Stated in FULL-DENSITY shingle units; scale by 2/(w+1) when enabling
    # pcm_minimizer_w (the thinned populations compress toward each other,
    # see test_minimizer_thinning for the measured envelope).
    low_info_floor: int = 100
    low_info_jaccard: float = 0.70
    txt_jaccard_threshold: float = 0.60
    min_common_bands: int = 1         # c (reference default c=1, README.md:106)
    substr_min_frac: float = 0.5      # LCS(suffix-array) >= frac * min(len) => contained

    # ---- clustering ----
    cc_max_iters: int = 50
    cc_driver_max_edges: int = 20_000_000  # symmetrized-edge bound below which
                                           # CC runs as a driver-side Arrow
                                           # collect + numpy min-label instead
                                           # of paying fixed per-round
                                           # scheduler latency.  MEASURED
                                           # (scripts/calibrate_cc_driver.py,
                                           # docs/SCALE.md): the driver path
                                           # is 2.6-5x faster than the
                                           # distributed loop through at least
                                           # 20M raw pairs; the binding
                                           # constraint is driver RSS (~70 MB
                                           # per 1M pairs), so the default
                                           # bounds the collect at ~10M raw
                                           # pairs = ~0.7 GB.  Both paths
                                           # produce the identical min-label
                                           # result (tested on both).

    # ---- misc determinism ----
    master_seed: int = 42
    channels: tuple[str, ...] = ("pcm", "txt")

    def __post_init__(self) -> None:
        assert self.n_hashes == self.n_bands * self.rows_per_band, (
            "n_hashes must equal n_bands * rows_per_band"
        )

    # ------------------------------------------------------------------
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        if isinstance(d.get("channels"), list):
            d["channels"] = tuple(d["channels"])
        return cls(**d)

    @property
    def params_hash(self) -> str:
        """Stable fingerprint of the full config — stamped on every artifact so a
        resume can refuse to mix stages built under different parameters (the
        role of CONSULT's metadata read-back, main_search.cpp:164-381)."""
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    # ------------------------------------------------------------------
    def band_catch_probability(self, jaccard: float) -> float:
        """LSH S-curve: P(>=1 band collides) = 1 - (1 - j^K)^L.

        CONSULT computes the same amplification algebra for its bit-sampling
        scheme (per-k-mer catch prob printed from alpha/K/L, main_map.cpp:198-229);
        tests assert our (L, K) sizing clears the 0.99 recall bar for the
        planted-duplicate similarity level.
        """
        return 1.0 - (1.0 - jaccard**self.rows_per_band) ** self.n_bands


DEFAULT_CONFIG = Config()
