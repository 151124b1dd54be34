"""GIF decoder: independent test-side encoder, exact roundtrips.

GIF is LOSSLESS (palette indices + LZW), so unlike JPEG the contract is
exact: decode(encode(indices, palette)) must equal palette[indices]
byte-for-byte.  The encoder here is an independent implementation of the
GIF89a spec (its own LZW string-table compressor with the
one-entry-lagged width bump, sub-block framing, interlace row order) —
it shares no code with the engine decoder (multimodal._decode_gif).

Covered: global + local color tables, interlace, transparency over the
logical-screen background, frame offsets, table resets past 4096 LZW
entries, dirty-corpus rejection (truncation, bogus geometry, bad
signature), and the decode_image dispatch (named + sniffed).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from consult_spark.operators import multimodal as MM


# ---------------------------------------------------------------------------
# independent encoder (test-side construction, never engine code)
# ---------------------------------------------------------------------------

def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Textbook GIF LZW: string table, clear code up front and whenever
    the table would exceed 4096.  The width bump is one entry LATER than
    the decoder's own table size (the decoder lags the encoder by exactly
    one entry), i.e. bump when next_code == (1 << width) + 1."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    emit(clear, width)
    w = b""
    for b in indices:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        w = c
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    transparent: int | None = None,
    local_ct: bool = False,
    left: int = 0,
    top: int = 0,
    screen: tuple[int, int] | None = None,
    bg_index: int = 0,
) -> bytes:
    """Write a single-frame GIF89a.  `indices` is HxW uint8 into
    `palette` (Nx3 uint8, N a power of two >= 4)."""
    ih, iw = indices.shape
    sw, sh = screen if screen else (iw + left, ih + top)
    depth = max(int(palette.shape[0]).bit_length() - 1, 2)
    assert palette.shape[0] == 1 << depth
    ct = palette.astype(np.uint8).tobytes()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    if local_ct:
        out += bytes([0x00, bg_index, 0])          # no GCT
    else:
        out += bytes([0x80 | (depth - 1), bg_index, 0])
        out += ct
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += b"\x2c" + struct.pack("<HHHH", left, top, iw, ih)
    iflags = (0x40 if interlace else 0)
    if local_ct:
        iflags |= 0x80 | (depth - 1)
    out += bytes([iflags])
    if local_ct:
        out += ct
    rows = indices
    if interlace:
        order = np.concatenate(
            [np.arange(s, ih, step) for s, step in MM._GIF_INTERLACE_PASSES]
        )
        rows = indices[order]
    min_code_size = max(depth, 2)
    out += bytes([min_code_size])
    stream = _lzw_encode(rows.tobytes(), min_code_size)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _rand_img(rng, h, w, ncolors):
    idx = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    return idx, pal


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_gif_roundtrip_exact():
    rng = np.random.default_rng(7)
    idx, pal = _rand_img(rng, 23, 31, 16)
    got = MM._decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_interlaced_matches_progressive():
    rng = np.random.default_rng(8)
    idx, pal = _rand_img(rng, 37, 19, 32)
    plain = MM._decode_gif(encode_gif(idx, pal))
    inter = MM._decode_gif(encode_gif(idx, pal, interlace=True))
    np.testing.assert_array_equal(plain, inter)
    np.testing.assert_array_equal(plain, pal[idx])


def test_gif_local_color_table():
    rng = np.random.default_rng(9)
    idx, pal = _rand_img(rng, 11, 13, 8)
    got = MM._decode_gif(encode_gif(idx, pal, local_ct=True))
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_transparency_and_offset():
    rng = np.random.default_rng(10)
    idx, pal = _rand_img(rng, 6, 5, 8)
    idx[2:4, 1:3] = 3  # the transparent index
    data = encode_gif(idx, pal, transparent=3, left=2, top=1,
                      screen=(10, 9), bg_index=5)
    got = MM._decode_gif(data)
    assert got.shape == (9, 10, 3)
    expect = np.broadcast_to(pal[5], (9, 10, 3)).copy()
    frame = pal[idx].copy()
    keep = idx != 3
    expect[1:7, 2:7][keep] = frame[keep]
    np.testing.assert_array_equal(got, expect)


def test_gif_lzw_table_reset_past_4096():
    # noise at 128 colors over 200x200 pixels forces the string table
    # past 4096 -> the encoder emits mid-stream clear codes and the
    # decoder must reset width + table and keep byte-exact output
    rng = np.random.default_rng(11)
    idx, pal = _rand_img(rng, 200, 200, 128)
    got = MM._decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_fuzz_random_shapes():
    rng = np.random.default_rng(12)
    for _ in range(12):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        ncolors = int(2 ** rng.integers(2, 8))
        idx, pal = _rand_img(rng, h, w, ncolors)
        inter = bool(rng.integers(0, 2))
        got = MM._decode_gif(encode_gif(idx, pal, interlace=inter))
        np.testing.assert_array_equal(got, pal[idx])


def test_gif_rejects_dirty_corpus_bytes():
    rng = np.random.default_rng(13)
    idx, pal = _rand_img(rng, 9, 9, 4)
    good = encode_gif(idx, pal)
    with pytest.raises(MM.ImageDecodeError):
        MM._decode_gif(b"GIF90a" + good[6:])          # bad signature
    with pytest.raises(MM.ImageDecodeError):
        MM._decode_gif(good[:20])                     # truncated mid-table
    with pytest.raises(MM.ImageDecodeError):
        MM._decode_gif(good[:-30])                    # truncated LZW stream
    bomb = bytearray(good)                            # bogus huge geometry
    bomb[6:10] = struct.pack("<HH", 0xFFFF, 0xFFFF)
    with pytest.raises(MM.ImageDecodeError):
        MM._decode_gif(bytes(bomb))
    with pytest.raises(MM.ImageDecodeError):          # no image descriptor
        MM._decode_gif(good[:13 + 4 * 3] + b"\x3b")


def test_gif_decode_image_dispatch():
    rng = np.random.default_rng(14)
    idx, pal = _rand_img(rng, 8, 8, 4)
    data = encode_gif(idx, pal)
    np.testing.assert_array_equal(MM.decode_image(data, "gif"), pal[idx])
    # sniffed from magic with no format hint
    np.testing.assert_array_equal(MM.decode_image(data, ""), pal[idx])


def test_gif_cross_format_near_dup_confirms_e2e(spark, cfg):
    """A GIF and a PNG of the SAME raster must confirm as a near-dup pair
    through the shared bands -> pairs -> verify chain on real bytes (the
    same contract as the PNG<->BMP and JPEG<->PNG planted pairs)."""
    from tests.test_sources_multimodal import encode_png

    def mosaic(seed):
        r = np.random.default_rng(seed)
        idx = np.repeat(
            np.repeat(r.integers(0, 16, size=(8, 8), dtype=np.uint8),
                      4, axis=0), 4, axis=1)
        pal = r.integers(0, 256, size=(16, 3), dtype=np.uint8)
        return idx, pal

    idx, pal = mosaic(31)
    oidx, opal = mosaic(99)
    rows = [
        ("img_gif", encode_gif(idx, pal), 32, 32, "gif"),
        ("img_png", encode_png(pal[idx], 1), 32, 32, "png"),
        ("img_other", encode_png(opal[oidx], 1), 32, 32, "png"),
    ]
    images = spark.createDataFrame(rows, MM.IMAGES_SCHEMA)
    feats = MM.featurize_images(images, cfg)
    from consult_spark.operators import bands as B
    from consult_spark.operators import pairs as P
    from consult_spark.operators import verify as V

    cands = P.candidate_pairs(
        B.capped_buckets(B.explode_bands(feats), cfg), cfg)
    scored = V.channel_scores(cands, feats, "img", cfg)
    got = {(r["clip_a"], r["clip_b"]): r["jaccard"] for r in scored.collect()}
    assert ("img_gif", "img_png") in got
    assert got[("img_gif", "img_png")] >= cfg.txt_jaccard_threshold
    assert got.get(("img_gif", "img_other"), 0.0) < cfg.txt_jaccard_threshold


def test_gif_truncated_extension_soft_fails():
    """A graphic-control extension whose sub-block is cut short must raise
    ImageDecodeError (the dirty-corpus soft-fail contract), never IndexError
    — one malformed file must not kill the Spark task (ADVICE r5)."""
    rng = np.random.default_rng(11)
    idx, pal = _rand_img(rng, 8, 8, 8)
    data = encode_gif(idx, pal, transparent=5)
    i = data.find(b"\x21\xf9\x04")
    assert i > 0
    # keep the declared size byte (4) but cut the payload after 1 byte
    cut = data[: i + 4]
    with pytest.raises(MM.ImageDecodeError):
        MM._decode_gif(cut)
    # also: truncation exactly at the size byte
    with pytest.raises(MM.ImageDecodeError):
        MM._decode_gif(data[: i + 3])
    # and a file ending inside the extension with no terminator
    with pytest.raises(MM.ImageDecodeError):
        MM._decode_gif(data[: i + 2])
