"""Decode + shingle + signature stage (mapInPandas).

One Arrow-batched pass over the clips table produces, per clip and channel:
the distinct shingle-hash set, the MinHash signature, the SimHash
fingerprint, and the per-band LSH bucket hashes.  Computing all of it in one
pass means the expensive part — audio decode — runs exactly once per clip
(CONSULT likewise encodes each k-mer once and derives all L signatures from
that encoding, main_map.cpp:550-584).

Channels:
  pcm — decoded audio -> per-frame 12-bit symbols (see functions/audio.py)
        -> k_pcm-symbol windows packed into uint64 (the analog of
        encodekmer's 2-bit pack, main_map.cpp:1221-1256), emitted for two
        quantization lattices (offset 0 / 0.5) tagged into the hash.
  txt — normalized transcript -> k_txt-char shingle hashes.

Output schema (FEATURES_SCHEMA): arrays of int64 reinterpret the uint64
hashes (bit-pattern preserved via .view) so they ride in Spark BIGINT
columns; equality/join/xor semantics are unaffected.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..config import Config
from ..functions import audio
from ..functions import hashing as H

FEATURES_SCHEMA = (
    "clip_id string, kind string, n_shingles int, "
    "shingles array<int>, minhash array<bigint>, simhash bigint, bands array<bigint>, "
    "decode_ok boolean"
)
# The stored shingle sets are the top-32-bit truncations of the 64-bit
# hashes: the exact-Jaccard verify only needs set intersection, and 32 bits
# gives a spurious-intersection rate of |A||B|/2^32 ~ 1e-4 per pair — far
# inside the threshold margins — while halving the payload of the verify
# joins (the pipeline's largest shuffle). MinHash/SimHash/banding still use
# the full 64-bit hashes.

_LATTICE_TAGS = (np.uint64(0x9E2F), np.uint64(0xB7E1))


def thin_minimizers(h: np.ndarray, w: int) -> np.ndarray:
    """B4 minimizer selection (minimization.cpp:158-171 precedent): the min
    hash of each window of w consecutive positions.  Near-identical
    sequences pick near-identical minimizers (the windows slide together),
    so pairwise Jaccard is preserved while volume drops ~2/(w+1) — the
    shingle-table size lever at 100 TB (README.md:143-163)."""
    if w <= 1 or h.shape[0] <= w:
        return h
    return np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)


def pcm_shingle_set(data: bytes, codec: str, cfg: Config) -> np.ndarray:
    """Distinct uint64 shingle hashes for the audio channel of one clip."""
    x, sr = audio.decode_clip(data, codec)
    log_e, ratio_db, centroid = audio.frame_features(x, sr, cfg.frame_ms, cfg.hop_ms)
    offsets = (0.0, 0.5) if cfg.dual_lattice else (0.0,)
    parts = []
    for li, off in enumerate(offsets):
        sym = audio.symbols_from_features(
            log_e, ratio_db, centroid, cfg.energy_bins, cfg.energy_bin_db, off
        )
        packed = H.pack_symbols_u64(sym.astype(np.uint64), cfg.k_pcm, cfg.symbol_bits)
        if packed.shape[0]:
            hashes = H.hash_combine(packed, _LATTICE_TAGS[li])
            parts.append(thin_minimizers(hashes, cfg.pcm_minimizer_w))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def txt_shingle_set(text: str, cfg: Config) -> np.ndarray:
    """Distinct uint64 shingle hashes for the transcript channel."""
    return H.text_shingle_hashes(text or "", cfg.k_txt)


def truncate_shingles(s: np.ndarray) -> np.ndarray:
    """64-bit shingle set -> distinct top-32-bit truncations (uint32)."""
    return np.unique((np.asarray(s, dtype=np.uint64) >> np.uint64(32)).astype(np.uint32))


def featurize_pdf(pdf: pd.DataFrame, cfg: Config) -> pd.DataFrame:
    """clips batch -> features batch (both channels). Pure pandas/numpy.

    Decode failures (corrupt container, unimplemented codec) are PER-CLIP,
    never task-fatal: the clip gets an empty shingle set and decode_ok=False
    — empty sets are excluded from banding (bands.explode_bands), so the
    clip simply can't match on that channel, and the pipeline reports a
    decode_failed metric instead of dying 100 TB in.  CONSULT's analog:
    unparseable tokens are skipped, not aborted on (main_search.cpp:770-781).
    """
    rows_id: list[str] = []
    rows_kind: list[str] = []
    rows_ok: list[bool] = []
    sets: list[np.ndarray] = []
    has_pcm = "pcm" in cfg.channels
    for t in pdf.itertuples(index=False):
        if has_pcm:
            data = t.bytes if isinstance(t.bytes, bytes) else bytes(t.bytes)
        for kind in cfg.channels:
            ok = True
            if kind == "pcm":
                try:
                    s = pcm_shingle_set(data, t.codec, cfg)
                except (audio.AudioDecodeError, NotImplementedError):
                    s = np.empty(0, dtype=np.uint64)
                    ok = False
            else:
                s = txt_shingle_set(t.transcript, cfg)
            rows_id.append(t.clip_id)
            rows_kind.append(kind)
            rows_ok.append(ok)
            sets.append(s)
    return signatures_frame(rows_id, rows_kind, sets, rows_ok, cfg)


def signatures_frame(ids: list[str], kinds: list[str], sets: list[np.ndarray],
                     oks: list[bool], cfg: Config) -> pd.DataFrame:
    """(uint64 shingle sets) -> full FEATURES_SCHEMA pandas frame: truncated
    verify sets + MinHash + SimHash + band hashes.  Shared by every channel
    (pcm/txt here, img/vid in operators/multimodal.py) — the signature
    algebra never depends on where the shingles came from."""
    mh = H.minhash_batch(sets, cfg.n_hashes, cfg.minhash_seed)
    sh = H.simhash_batch(sets, cfg.simhash_bits, cfg.minhash_seed)
    bh = H.band_hashes(mh, cfg.n_bands, cfg.rows_per_band, cfg.band_seed)
    trunc = [truncate_shingles(s) for s in sets]
    return pd.DataFrame(
        {
            "clip_id": ids,
            "kind": kinds,
            "n_shingles": [t.shape[0] for t in trunc],
            "shingles": [t.view(np.int32) for t in trunc],
            "minhash": list(mh.view(np.int64)),
            "simhash": sh.view(np.int64),
            "bands": list(bh.view(np.int64)),
            "decode_ok": oks,
        }
    )


def featurize(clips_df, cfg: Config):
    """Spark stage: clips DataFrame -> features DataFrame.

    Column-prunes to exactly what the active channels need before the Python
    boundary; `bytes` never travels further than this stage, and a txt-only
    config (e.g. deduping a documents table) needs no audio columns at all.
    """
    cols = ["clip_id"]
    if "pcm" in cfg.channels:
        cols += ["bytes", "codec"]
    if "txt" in cfg.channels:
        cols += ["transcript"]
    # snapshot driver-side registered codec decoders into the closure:
    # python workers import modules fresh, so a plain module-global registry
    # would be empty there — cloudpickle ships the snapshot with the UDF
    decoders = dict(audio._DECODERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for codec, fn in decoders.items():
            audio.register_decoder(codec, fn)
        for pdf in batches:
            if len(pdf):
                yield featurize_pdf(pdf, cfg)

    return clips_df.select(*cols).mapInPandas(run, schema=FEATURES_SCHEMA)


def featurize_from_parquet(spark, clips_path: str, cfg: Config):
    """Featurize with a Python-native source: executors read the parquet
    row groups directly with pyarrow instead of receiving the fat `bytes`
    column through the JVM->Python Arrow pipe.

    Measured locally, the JVM-side serialization of ~60 KB binary rows is
    the stage's bottleneck AND it anti-scales with core count (the pipe is a
    shared resource); reading the column in the worker makes featurize
    compute-bound and embarrassingly parallel — the same pattern a real
    cluster uses when Python workers read the object store directly
    (file-granular tasks = CONSULT's file-level OpenMP parallelism,
    main_search.cpp:704-707).

    Returns a features DataFrame identical (bit-for-bit) to
    ``featurize(spark.read.parquet(clips_path), cfg)``.
    """
    import glob as _glob
    import os as _os

    cols = ["clip_id"]
    if "pcm" in cfg.channels:
        cols += ["bytes", "codec"]
    if "txt" in cfg.channels:
        cols += ["transcript"]
    files = sorted(_glob.glob(_os.path.join(clips_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet part files under {clips_path}")
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(len(files))
    decoders = dict(audio._DECODERS)  # see featurize(): ship registry to workers

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for codec, fn in decoders.items():
            audio.register_decoder(codec, fn)
        for pdf in batches:
            for path in pdf["path"]:
                table = pq.read_table(path, columns=cols)
                clips_pdf = table.to_pandas()
                if len(clips_pdf):
                    yield featurize_pdf(clips_pdf, cfg)

    return fdf.mapInPandas(run, schema=FEATURES_SCHEMA)
