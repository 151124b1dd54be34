"""Multimodal binary columns: image / video plumbing.

Per the training-data-pipeline contract, image and video payloads are
treated exactly like audio: an opaque ``binary`` column plus typed metadata,
processed by Arrow-batched UDFs.  The audio path (functions/audio.py) is
fully real.  Image decode is REAL for every format that needs no external
codec library — binary PPM (P6) and 24-bit BMP parsed in pure numpy like
the WAV container, and 8-bit PNG (color types 0/2/4/6) via stdlib zlib
inflate + a numpy per-row unfilter — so a planted-dup image pair flows
decode -> shingle -> bands -> pairs -> verify end-to-end on real bytes,
including PNG<->BMP cross-format (test_sources_multimodal).  Formats whose
codecs genuinely aren't in this image (jpeg/webp; h264 video) require
PIL/opencv/ffmpeg and remain STUBBED behind NotImplementedError with a
deterministic-fake switch; the Spark-side plumbing (schemas, batch shapes,
partitioning, UDF signatures, downstream dedup wiring) is identical either
way.

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
    if f == "png" or data[:8] == _PNG_SIG:
        return _decode_png(data)
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 interlace pass origins and steps: (x0, y0, dx, dy)
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(rows: np.ndarray, units: int, bpp: int) -> np.ndarray:
    """(n_rows, 1 + units*bpp) filtered scanlines -> (n_rows, units, bpp)
    reconstructed bytes.  Filters none/up vectorize over the row; sub is a
    per-channel cumulative sum; average/paeth run a width loop vectorized
    across the bpp filter step."""
    n_rows = rows.shape[0]
    out = np.zeros((n_rows, units, bpp), dtype=np.uint8)
    prev = np.zeros((units, bpp), dtype=np.uint8)
    for r in range(n_rows):
        f = int(rows[r, 0])
        cur = rows[r, 1:].reshape(units, bpp)
        if f == 0:  # None
            rec = cur.copy()
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-1]  (per channel)
            rec = np.cumsum(cur.astype(np.uint64), axis=0).astype(np.uint8)
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 3:  # Average: left+up recurrence -> width loop
            rec = np.zeros_like(cur)
            left = np.zeros(bpp, dtype=np.int32)
            up = prev.astype(np.int32)
            for x in range(units):
                left = (cur[x].astype(np.int32) + ((left + up[x]) >> 1)) & 0xFF
                rec[x] = left.astype(np.uint8)
        elif f == 4:  # Paeth
            rec = np.zeros_like(cur)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            up = prev.astype(np.int32)
            for x in range(units):
                p = left + up[x] - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up[x]), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], ul)
                )
                left = (cur[x].astype(np.int32) + pred) & 0xFF
                rec[x] = left.astype(np.uint8)
                ul = up[x]
        else:
            raise ImageDecodeError(f"bad PNG filter type {f} on row {r}")
        out[r] = rec
        prev = rec
    return out
# channels per PNG color type (8-bit depth): gray, RGB, palette, gray+alpha,
# RGBA (palette rows are 1 byte/pixel of PLTE indices)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# dirty-corpus allocation ceiling: 2^26 pixels (~8K x 8K) bounds the decode
# buffer at ~0.5 GB worst-case (16-bit RGBA) regardless of header claims
_PNG_MAX_PIXELS = 1 << 26


def _decode_png(data: bytes) -> np.ndarray:
    """Non-interlaced PNG (8-bit color types 0/2/3/4/6; 1/2/4-bit gray and
    palette) -> HxWx3 uint8.

    The one COMPRESSED mainstream format decodable with zero new
    dependencies: stdlib ``zlib`` inflates the IDAT stream; the chunk walk
    and the per-row unfilter (types 0-4) are numpy — the same pure-numpy
    stance as the WAV/PPM/BMP/Y4M parsers.  Filters none/up vectorize over
    the whole row; sub is a per-channel cumulative sum; average/paeth have a
    nonlinear left+up recurrence, so those rows run a width-loop vectorized
    across channels.  Palette images (type 3) dereference PLTE after the
    unfilter; sub-byte depths (1/2/4-bit gray or palette — the common web
    icon shape) unfilter in the byte domain (PNG's bpp-rounds-up-to-1
    rule) and then unpack MSB-first bit groups; 16-bit samples keep the
    high byte (the standard 8-bit downsample).  Adam7 interlace decodes
    at depths 8/16 (seven passes, each unfiltered independently then
    scattered into place); sub-byte interlace is rejected as
    ImageDecodeError (soft, per-image).  Gray replicates to 3 channels
    (sub-byte gray scaled to full range); alpha is dropped (dedup
    features are luminance-based).
    """
    import zlib

    if data[:8] != _PNG_SIG:
        raise ImageDecodeError("not a PNG")
    pos, n = 8, len(data)
    w = h = None
    color_type = None
    palette = None
    idat = bytearray()
    while pos + 8 <= n:
        clen = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen or pos + 12 + clen > n:
            raise ImageDecodeError("PNG chunk truncated")
        crc = int.from_bytes(data[pos + 8 + clen : pos + 12 + clen], "big")
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ImageDecodeError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if clen != 13:
                raise ImageDecodeError("bad IHDR length")
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            bit_depth, color_type, comp, filt, interlace = body[8:13]
            ok_depth = (
                bit_depth == 8
                or (bit_depth in (1, 2, 4) and color_type in (0, 3))
                or (bit_depth == 16 and color_type != 3)
            )
            if not ok_depth or color_type not in _PNG_CHANNELS:
                raise ImageDecodeError(
                    f"unsupported PNG depth={bit_depth} color_type={color_type}"
                )
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise ImageDecodeError(
                    f"unsupported PNG comp={comp} filter={filt} interlace={interlace}"
                )
            if interlace == 1 and bit_depth < 8:
                # sub-byte Adam7 passes bit-pack per pass row — out of scope
                raise ImageDecodeError(
                    f"unsupported PNG: interlaced at depth {bit_depth}"
                )
        elif ctype == b"PLTE":
            if clen % 3 or clen > 768:
                raise ImageDecodeError(f"bad PLTE length {clen}")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if w is None or color_type is None or not idat:
        raise ImageDecodeError("PNG missing IHDR/IDAT")
    if color_type == 3 and palette is None:
        raise ImageDecodeError("palette PNG missing PLTE")
    if w <= 0 or h <= 0:
        raise ImageDecodeError(f"unsupported PNG geometry {w}x{h}")
    if w * h > _PNG_MAX_PIXELS:
        # dirty-corpus guard: a crafted IHDR can declare absurd dimensions;
        # without this, np.zeros below would allocate from attacker-chosen
        # numbers and OOM the executor instead of soft-failing the image
        raise ImageDecodeError(f"PNG geometry {w}x{h} exceeds pixel cap")
    ch = _PNG_CHANNELS[color_type]
    if bit_depth == 8:
        stride = w * ch
        units, bpp = w, ch  # filter step = one pixel of ch bytes
    elif bit_depth == 16:
        stride = w * ch * 2
        units, bpp = w, ch * 2  # filter step = one pixel of 2*ch bytes
    else:
        # sub-byte gray/palette: filters operate on BYTES with a 1-byte
        # step (PNG spec: bpp rounds up to 1); pixels unpack afterwards
        stride = (w * bit_depth + 7) // 8
        units, bpp = stride, 1
    # exact expected inflated size from the validated geometry — computed
    # BEFORE inflating so a deflate bomb can never allocate past it
    if interlace == 0:
        expected = h * (1 + stride)
    else:
        expected = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                expected += ph * (1 + pw * bpp)
    dec = zlib.decompressobj()
    try:
        # max_length bounds the OUTPUT allocation: a bomb stream yields at
        # most expected+1 bytes (then fails the size check) instead of
        # inflating 1000x into executor memory
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ImageDecodeError(f"PNG inflate failed: {e}") from e
    if len(raw) > expected or dec.unconsumed_tail:
        raise ImageDecodeError(
            f"PNG inflated stream exceeds declared raster size {expected}"
        )
    if interlace == 0:
        if len(raw) != h * (1 + stride):
            raise ImageDecodeError(
                f"PNG raster size {len(raw)} != {h * (1 + stride)} for "
                f"{w}x{h} depth={bit_depth} ct={color_type}"
            )
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
        out = _png_unfilter(rows, units, bpp)
    else:
        # Adam7: 7 sub-images, each its own filtered scanline sequence;
        # unfilter each pass with the same machinery, scatter into place
        out = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bpp
            need = ph * (1 + pstride)
            if off + need > len(raw):
                raise ImageDecodeError("PNG interlaced raster truncated")
            rows = np.frombuffer(
                raw, dtype=np.uint8, count=need, offset=off
            ).reshape(ph, 1 + pstride)
            out[y0::dy, x0::dx] = _png_unfilter(rows, pw, bpp)
            off += need
        if off != len(raw):
            raise ImageDecodeError("PNG interlaced raster has trailing bytes")
    if bit_depth == 16:
        # big-endian 16-bit samples -> keep the high byte (the standard
        # 8-bit downsample; dedup features are 8-bit-luminance-based)
        out = np.ascontiguousarray(out.reshape(h, w, ch, 2)[..., 0])
    if bit_depth < 8:
        # MSB-first bit groups -> per-pixel values, truncated to width
        bits = np.unpackbits(out.reshape(h, stride), axis=1)
        vals = bits[:, : w * bit_depth].reshape(h, w, bit_depth)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        px = (vals * weights).sum(axis=2).astype(np.uint8)
        if color_type == 3:
            if int(px.max(initial=0)) >= palette.shape[0]:
                raise ImageDecodeError("PNG palette index out of range")
            return palette[px]
        # gray: scale to full 8-bit range (max sub-byte value -> 255)
        scaled = (px.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)).astype(np.uint8)
        return np.repeat(scaled[:, :, None], 3, axis=2)
    if color_type == 0:
        return np.repeat(out, 3, axis=2)
    if color_type == 3:
        idx = out[..., 0]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ImageDecodeError("PNG palette index out of range")
        return palette[idx]
    if color_type == 4:
        return np.repeat(out[..., :1], 3, axis=2)
    if color_type == 6:
        return np.ascontiguousarray(out[..., :3])
    return out


def _payload_seed(data: bytes) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(data, digest_size=4).digest(), "little")


def sample_video_frames(data: bytes, codec: str, every_ms: int = 1000,
                        deterministic_fake: bool = False) -> list[np.ndarray]:
    """bytes -> frames sampled every ``every_ms``, each HxWx3 uint8 RGB.

    REAL path: YUV4MPEG2 (.y4m) — the uncompressed video container, parsed
    in pure numpy (header + FRAME markers + raw 4:2:0/4:2:2/4:4:4/mono
    planes, BT.601 limited-range conversion), the video analog of the
    PPM/BMP image path.
    Compressed codecs (h264/vp9/av1) require ffmpeg bindings, absent here,
    and stay stubbed behind NotImplementedError."""
    if deterministic_fake:
        rng = np.random.default_rng(_payload_seed(data))
        return [rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8) for _ in range(4)]
    if (codec or "").lower() in ("y4m", "yuv4mpeg2") or data[:9] == b"YUV4MPEG2":
        return _sample_y4m(data, every_ms)
    raise NotImplementedError(
        f"video decode ({codec!r}) requires ffmpeg bindings, absent from this "
        "environment; plug a frame sampler in here"
    )


def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                   rep_y: int = 2, rep_x: int = 2) -> np.ndarray:
    """BT.601 limited-range YCbCr -> RGB uint8; chroma nearest-upsampled by
    (rep_y, rep_x) — (2,2) for 4:2:0, (1,2) for 4:2:2, (1,1) for 4:4:4."""
    u2 = u.repeat(rep_y, axis=0).repeat(rep_x, axis=1)[: y.shape[0], : y.shape[1]]
    v2 = v.repeat(rep_y, axis=0).repeat(rep_x, axis=1)[: y.shape[0], : y.shape[1]]
    yf = 1.164 * (y.astype(np.float32) - 16.0)
    uf = u2.astype(np.float32) - 128.0
    vf = v2.astype(np.float32) - 128.0
    rgb = np.stack(
        [yf + 1.596 * vf, yf - 0.392 * uf - 0.813 * vf, yf + 2.017 * uf], axis=-1
    )
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def _sample_y4m(data: bytes, every_ms: int) -> list[np.ndarray]:
    """YUV4MPEG2 stream header: 'YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<cs>';
    each frame: 'FRAME[params]\\n' + raw planes (Y then U then V for 4:2:0;
    Y only for mono)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ImageDecodeError("not a YUV4MPEG2 stream")
    w = h = None
    fps = 25.0
    cs = b"420"
    for field in data[:nl].split()[1:]:
        tag, val = field[:1], field[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = int(num) / int(den)
        elif tag == b"C":
            cs = val
    if not w or not h:
        raise ImageDecodeError("y4m header missing W/H")
    if cs.startswith(b"420"):
        # chroma planes are ceil(w/2) x ceil(h/2) — both dimensions round UP
        # for odd sizes (an odd-width stream has a final half-width chroma
        # column, same as the final half-height row)
        cw, ch = (w + 1) // 2, (h + 1) // 2
        rep = (2, 2)
    elif cs.startswith(b"422"):
        cw, ch = (w + 1) // 2, h
        rep = (1, 2)
    elif cs.startswith(b"444"):
        cw, ch = w, h
        rep = (1, 1)
    elif cs == b"mono":
        cw = ch = 0
    else:
        raise ImageDecodeError(f"unsupported y4m chroma sampling C{cs.decode()}")
    plane_sizes = (w * h, cw * ch, cw * ch) if cw else (w * h,)
    frame_bytes = sum(plane_sizes)
    step = max(1, int(round(fps * every_ms / 1000.0)))
    frames: list[np.ndarray] = []
    pos, idx, n = nl + 1, 0, len(data)
    while pos < n:
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ImageDecodeError("malformed y4m FRAME marker")
        pos = fnl + 1
        if pos + frame_bytes > n:
            raise ImageDecodeError("y4m frame truncated")
        if idx % step == 0:
            y = np.frombuffer(data, np.uint8, w * h, pos).reshape(h, w)
            if len(plane_sizes) == 3:
                u = np.frombuffer(data, np.uint8, cw * ch, pos + plane_sizes[0]).reshape(ch, cw)
                v = np.frombuffer(
                    data, np.uint8, cw * ch, pos + plane_sizes[0] + plane_sizes[1]
                ).reshape(ch, cw)
                frames.append(_yuv420_to_rgb(y, u, v, *rep))
            else:
                frames.append(np.repeat(y[:, :, None], 3, axis=2))
        pos += frame_bytes
        idx += 1
    if not frames:
        raise ImageDecodeError("y4m stream contains no frames")
    return frames


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


def featurize_videos(videos: DataFrame, cfg: Config, every_ms: int = 1000,
                     deterministic_fake: bool = False) -> DataFrame:
    """videos table -> FULL features rows (kind='vid'): frames sampled every
    ``every_ms``, per-frame block shingles unioned into one set per video —
    the frame-union plays the same role as the audio dual-lattice union, so
    videos sharing most frames land in shared buckets.  Real end-to-end for
    .y4m payloads; failures per-video soft errors."""
    from .shingle import FEATURES_SCHEMA, signatures_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, sets, oks = [], [], [], []
            for t in pdf.itertuples(index=False):
                ok = True
                try:
                    frames = sample_video_frames(
                        bytes(t.bytes), t.codec, every_ms, deterministic_fake
                    )
                    parts = [image_shingles(f, cfg) for f in frames]
                    s = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
                except (ImageDecodeError, NotImplementedError):
                    s = np.empty(0, dtype=np.uint64)
                    ok = False
                ids.append(t.vid_id)
                kinds.append("vid")
                sets.append(s)
                oks.append(ok)
            yield signatures_frame(ids, kinds, sets, oks, cfg)

    return videos.select("vid_id", "bytes", "codec").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )
