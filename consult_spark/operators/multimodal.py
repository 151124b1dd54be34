"""Multimodal binary columns: image / video plumbing.

Per the training-data-pipeline contract, image and video payloads are
treated exactly like audio: an opaque ``binary`` column plus typed metadata,
processed by Arrow-batched UDFs.  The audio path (functions/audio.py) is
fully real; the image/video DECODE steps require codec libraries absent
from this environment, so they are STUBBED behind NotImplementedError with
a deterministic-fake switch — the Spark-side plumbing (schemas, batch
shapes, partitioning, UDF signatures, downstream dedup wiring) is real and
tested.

Schemas:
  images(img_id string, bytes binary, width int, height int, format string)
  videos(vid_id string, bytes binary, fps double, dur_ms int, codec string)

The downstream dedup path is shared: features -> shingle-set column ->
the SAME minhash/banding/cap/pair/verify operators as audio (they operate
on (clip_id, shingles) and never look at where the shingles came from).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import Config
from ..functions import hashing as H

IMAGES_SCHEMA = "img_id string, bytes binary, width int, height int, format string"
VIDEOS_SCHEMA = "vid_id string, bytes binary, fps double, dur_ms int, codec string"


def decode_image(data: bytes, fmt: str, deterministic_fake: bool = False) -> np.ndarray:
    """bytes -> HxWx3 uint8 array.  Real decoders (PIL/opencv) are not in
    this image; ``deterministic_fake=True`` derives a seeded pseudo-image
    from the payload hash so the downstream plumbing can be exercised."""
    if deterministic_fake:
        rng = np.random.default_rng(_payload_seed(data))
        return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    raise NotImplementedError(
        f"image decode ({fmt!r}) requires PIL/opencv, absent from this "
        "environment; plug a decoder in here — the rest of the pipeline is real"
    )


def _payload_seed(data: bytes) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(data, digest_size=4).digest(), "little")


def sample_video_frames(data: bytes, codec: str, every_ms: int = 1000,
                        deterministic_fake: bool = False) -> list[np.ndarray]:
    """bytes -> sampled frames.  Same stub contract as decode_image."""
    if deterministic_fake:
        rng = np.random.default_rng(_payload_seed(data))
        return [rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8) for _ in range(4)]
    raise NotImplementedError(
        f"video decode ({codec!r}) requires ffmpeg bindings, absent from this "
        "environment; plug a frame sampler in here"
    )


def image_shingles(img: np.ndarray, cfg: Config) -> np.ndarray:
    """HxWx3 -> uint64 shingle hashes: 4x4 block mean-luminance grid,
    coarsely quantized, hashed per 2x2 block window — the image analog of
    the audio symbol/k-gram scheme (gain handled by median-centering)."""
    lum = img.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    bh, bw = max(1, h // 8), max(1, w // 8)
    blocks = lum[: (h // bh) * bh, : (w // bw) * bw].reshape(h // bh, bh, w // bw, bw).mean(axis=(1, 3))
    q = np.clip(((blocks - np.median(blocks)) / 16.0) + 8, 0, 15).astype(np.uint64)
    flat = q.reshape(-1)
    return np.unique(H.bytes_shingle_hashes(flat, min(4, flat.shape[0])))


def featurize_images(images: DataFrame, cfg: Config, deterministic_fake: bool = False) -> DataFrame:
    """images table -> FULL features rows (kind='img', FEATURES_SCHEMA:
    truncated shingles + MinHash + SimHash + bands + decode_ok) — directly
    consumable by the SAME banding/pair/verify operators as the audio/text
    channels (the signature block is shared via shingle.signatures_frame).
    Decode failures are per-image soft errors, like audio."""
    from .shingle import FEATURES_SCHEMA, signatures_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, sets, oks = [], [], [], []
            for t in pdf.itertuples(index=False):
                ok = True
                try:
                    img = decode_image(bytes(t.bytes), t.format, deterministic_fake)
                    s = image_shingles(img, cfg)
                except NotImplementedError:
                    s = np.empty(0, dtype=np.uint64)
                    ok = False
                ids.append(t.img_id)
                kinds.append("img")
                sets.append(s)
                oks.append(ok)
            yield signatures_frame(ids, kinds, sets, oks, cfg)

    return images.select("img_id", "bytes", "format").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )
