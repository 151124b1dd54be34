"""Multimodal binary columns: image / video plumbing.

Per the training-data-pipeline contract, image and video payloads are
treated exactly like audio: an opaque ``binary`` column plus typed metadata,
processed by Arrow-batched UDFs.  The audio path (functions/audio.py) is
fully real.  Image decode is REAL for the uncompressed formats that need no
codec library — binary PPM (P6) and 24-bit BMP, parsed in pure numpy like
the WAV container — so a planted-dup image pair flows decode -> shingle ->
bands -> pairs -> verify end-to-end on real bytes (test_sources_multimodal).
Compressed image formats (png/jpeg) and video decode require PIL/opencv/
ffmpeg, absent from this environment, and remain STUBBED behind
NotImplementedError with a deterministic-fake switch; the Spark-side
plumbing (schemas, batch shapes, partitioning, UDF signatures, downstream
dedup wiring) is identical either way.

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


class ImageDecodeError(ValueError):
    """Unparseable image payload — a PER-IMAGE soft error, like
    audio.AudioDecodeError: the image gets an empty shingle set and
    decode_ok=False instead of failing the task."""


def decode_image(data: bytes, fmt: str, deterministic_fake: bool = False) -> np.ndarray:
    """bytes -> HxWx3 uint8 array.

    REAL paths (pure numpy, the same stance as the WAV container parser in
    functions/audio.py): binary PPM (P6) and uncompressed 24-bit BMP — the
    two mainstream formats that need no codec library.  Compressed formats
    (png/jpeg/webp) require PIL/opencv, absent from this environment, and
    raise NotImplementedError; ``deterministic_fake=True`` derives a seeded
    pseudo-image from the payload hash so downstream plumbing can be
    exercised for those."""
    if deterministic_fake:
        rng = np.random.default_rng(_payload_seed(data))
        return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    f = (fmt or "").lower()
    if f in ("ppm", "p6") or data[:2] == b"P6":
        return _decode_ppm(data)
    if f == "bmp" or data[:2] == b"BM":
        return _decode_bmp(data)
    raise NotImplementedError(
        f"image decode ({fmt!r}) requires PIL/opencv, absent from this "
        "environment; plug a decoder in here — the rest of the pipeline is real"
    )


def _decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6): 'P6' <ws> width <ws> height <ws> maxval <one ws>
    then raw RGB triplets row-major.  '#' comments allowed in the header."""
    if data[:2] != b"P6":
        raise ImageDecodeError("not a P6 ppm")
    i, vals = 2, []
    n = len(data)
    while len(vals) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i] == 0x23:  # '#'
            while i < n and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ImageDecodeError("truncated ppm header")
        try:
            vals.append(int(data[i:j]))
        except ValueError as e:
            raise ImageDecodeError(f"bad ppm header token {data[i:j]!r}") from e
        i = j
    i += 1  # exactly one whitespace byte separates maxval from the raster
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ImageDecodeError(f"unsupported ppm geometry {w}x{h} maxval={maxval}")
    need = w * h * 3
    if n - i < need:
        raise ImageDecodeError(f"ppm raster truncated: {n - i} < {need}")
    return np.frombuffer(data, dtype=np.uint8, count=need, offset=i).reshape(h, w, 3)


def _decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows padded to
    4 bytes, BGR order, bottom-up when height is positive."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ImageDecodeError("not a BMP / truncated header")

    def u32(o):
        return int.from_bytes(data[o : o + 4], "little")

    def i32(o):
        return int.from_bytes(data[o : o + 4], "little", signed=True)

    off = u32(10)
    w, h = i32(18), i32(22)
    bpp = int.from_bytes(data[28:30], "little")
    comp = u32(30)
    if bpp != 24 or comp != 0:
        raise ImageDecodeError(f"unsupported BMP variant bpp={bpp} compression={comp}")
    if w <= 0 or h == 0:
        raise ImageDecodeError(f"unsupported BMP geometry {w}x{h}")
    rows = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(data) - off < stride * rows:
        raise ImageDecodeError("BMP raster truncated")
    raster = np.frombuffer(data, dtype=np.uint8, count=stride * rows, offset=off)
    px = raster.reshape(rows, stride)[:, : w * 3].reshape(rows, w, 3)[..., ::-1]
    if h > 0:
        px = px[::-1]  # bottom-up storage
    return np.ascontiguousarray(px)


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
                except (ImageDecodeError, NotImplementedError):
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
