"""Baseline JPEG decoder: independent encoder + stdlib-only oracle decoder.

The engine decoder (multimodal._decode_jpeg, numpy) is checked three ways:
  1. roundtrip SNR: decode(encode(img)) must reconstruct the original
     within quantization error (the encoder here is an independent
     implementation of T.81 with the published Annex K tables);
  2. oracle parity: a SECOND, pure-python (stdlib-only, no numpy) decoder
     re-derives every pixel; engine and oracle must agree within +/-1 LSB
     (float summation order differs between the two IDCTs);
  3. e2e: a planted JPEG<->PNG cross-format near-dup pair confirms through
     the shared bands -> pairs -> verify operators on real bytes.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from consult_spark.operators import multimodal as MM

# ---------------------------------------------------------------------------
# Published Annex K tables (ITU-T T.81) — used by the test ENCODER; the
# engine decoder reads whatever tables the file carries.
# ---------------------------------------------------------------------------

QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _huff_codes(bits, vals):
    """canonical (symbol -> (code, length)) per T.81 Annex C."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _fdct_block(block):
    """Forward DCT-II on one 8x8 (level-shifted) block — pure python."""
    out = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for v in range(8):
            cv = math.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x][y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u][v] = 0.25 * cu * cv * s
    return out


def _category(v):
    a = abs(v)
    s = 0
    while a:
        a >>= 1
        s += 1
    return s


def _amplitude(v, s):
    return v if v >= 0 else v + (1 << s) - 1


def encode_jpeg(img: np.ndarray, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Independent baseline JPEG encoder (Annex K tables).  img HxWx3 uint8.
    subsample: '444' (no subsampling) or '420'."""
    h, w = img.shape[:2]
    # RGB -> YCbCr (BT.601 full range, the JFIF convention)
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    if subsample == "420":
        hs = vs = 2
    else:
        hs = vs = 1
    # pad planes to MCU multiples
    mcu_w, mcu_h = 8 * hs, 8 * vs
    pw = -(-w // mcu_w) * mcu_w
    ph = -(-h // mcu_h) * mcu_h

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    if hs == 2:
        # 2x2 box average then round — a common, legal downsample choice
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    comps = [
        (1, hs, vs, 0, y),    # (id, h, v, tq, plane)
        (2, 1, 1, 1, cb),
        (3, 1, 1, 1, cr),
    ]
    dc_tabs = {0: _huff_codes(DC_LUM_BITS, DC_LUM_VALS),
               1: _huff_codes(DC_CHROM_BITS, DC_CHROM_VALS)}
    ac_tabs = {0: _huff_codes(AC_LUM_BITS, AC_LUM_VALS),
               1: _huff_codes(AC_CHROM_BITS, AC_CHROM_VALS)}
    qts = {0: QT_LUM, 1: QT_CHROM}

    mcus_x, mcus_y = pw // mcu_w, ph // mcu_h

    def encode_block(wtr, plane, bx, by, tq, td, pred):
        raster = [
            [plane[by * 8 + i][bx * 8 + j] - 128.0 for j in range(8)]
            for i in range(8)
        ]
        coef = _fdct_block(raster)
        q = qts[tq]
        zz = [
            int(round(coef[ZIGZAG[k] // 8][ZIGZAG[k] % 8] / q[ZIGZAG[k]]))
            for k in range(64)
        ]
        diff = zz[0] - pred
        s = _category(diff)
        code, length = dc_tabs[td][s]
        wtr.put(code, length)
        if s:
            wtr.put(_amplitude(diff, s), s)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, 64):
            if k > last_nz:
                code, length = ac_tabs[td][0x00]  # EOB
                wtr.put(code, length)
                break
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tabs[td][0xF0]  # ZRL
                wtr.put(code, length)
                run -= 16
            s = _category(v)
            code, length = ac_tabs[td][(run << 4) | s]
            wtr.put(code, length)
            wtr.put(_amplitude(v, s), s)
            run = 0
        return zz[0]

    segments = []
    preds = [0, 0, 0]
    wtr = _BitWriter()
    planes = [c[4].tolist() for c in comps]
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            segments.append(wtr.flush())
            wtr = _BitWriter()
            preds = [0, 0, 0]
        my, mx = divmod(mcu, mcus_x)
        for ci, (cid, chs, cvs, tq, _p) in enumerate(comps):
            td = 0 if ci == 0 else 1
            for v in range(cvs):
                for u in range(chs):
                    preds[ci] = encode_block(
                        wtr, planes[ci], mx * chs + u, my * cvs + v, tq, td, preds[ci]
                    )
    segments.append(wtr.flush())

    out = bytearray(b"\xff\xd8")
    # APP0 JFIF
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for tq, q in qts.items():
        body = bytes([tq]) + bytes(q[ZIGZAG[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, chs, cvs, tq, _p in comps:
        sof += bytes([cid, (chs << 4) | cvs, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for (tc, th, bits, vals) in [
        (0, 0, DC_LUM_BITS, DC_LUM_VALS), (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS), (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    ]:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([3])
    for ci, (cid, *_rest) in enumerate(comps):
        td = 0 if ci == 0 else 1
        sos += bytes([cid, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    for i, seg in enumerate(segments):
        out += seg
        if i < len(segments) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# stdlib-only oracle decoder (no numpy): the independent re-derivation
# ---------------------------------------------------------------------------

def oracle_decode_jpeg(data: bytes):
    """Pure-python baseline JPEG decoder -> list-of-rows of (r, g, b).

    Written against T.81 directly — shares no code with the engine decoder
    (bit reader, huffman walk, IDCT, upsample all re-derived)."""
    assert data[:2] == b"\xff\xd8"
    pos = 2
    qts, dcs, acs = {}, {}, {}
    frame = None
    ri = 0
    scan_sel = None
    while pos < len(data):
        assert data[pos] == 0xFF
        m = data[pos + 1]
        pos += 2
        if m in (0x01,) or 0xD0 <= m <= 0xD9:
            if m == 0xD9:
                break
            continue
        ln = (data[pos] << 8) | data[pos + 1]
        body = data[pos + 2 : pos + ln]
        pos += ln
        if m == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                assert pq == 0
                qts[tq] = list(body[i : i + 64])
                i += 64
        elif m == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1 : i + 17])
                nv = sum(counts)
                vals = list(body[i + 17 : i + 17 + nv])
                code, k, tab = 0, 0, {}
                for ln2 in range(1, 17):
                    for _ in range(counts[ln2 - 1]):
                        tab[(ln2, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                (acs if tc else dcs)[th] = tab
                i += 17 + nv
        elif m == 0xDD:
            ri = (body[0] << 8) | body[1]
        elif m == 0xC0:
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            nc = body[5]
            comps = []
            for c in range(nc):
                comps.append((body[6 + 3 * c], body[7 + 3 * c] >> 4,
                              body[7 + 3 * c] & 15, body[8 + 3 * c]))
            frame = (h, w, comps)
        elif m == 0xDA:
            ns = body[0]
            scan_sel = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 15)
                for c in range(ns)
            ]
            break
    h, w, comps = frame
    # entropy segments
    segs, cur, i = [], bytearray(), pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segs.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    state = {"seg": 0, "bytepos": 0, "bitpos": 0}

    def readbit():
        s = segs[state["seg"]]
        if state["bytepos"] >= len(s):
            return 1
        bit = (s[state["bytepos"]] >> (7 - state["bitpos"])) & 1
        state["bitpos"] += 1
        if state["bitpos"] == 8:
            state["bitpos"] = 0
            state["bytepos"] += 1
        return bit

    def readbits(k):
        v = 0
        for _ in range(k):
            v = (v << 1) | readbit()
        return v

    def huffdec(tab):
        code = 0
        for ln2 in range(1, 17):
            code = (code << 1) | readbit()
            if (ln2, code) in tab:
                return tab[(ln2, code)]
        raise AssertionError("bad huffman stream")

    def extend(v, s):
        if s == 0:
            return 0
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    planes = {}
    for cid, chs, cvs, tq in comps:
        planes[cid] = [
            [0] * (mcus_x * chs * 8) for _ in range(mcus_y * cvs * 8)
        ]
    preds = {c[0]: 0 for c in comps}
    idx = {c[0]: c for c in comps}
    for mcu in range(mcus_x * mcus_y):
        if ri and mcu and mcu % ri == 0:
            state["seg"] += 1
            state["bytepos"] = state["bitpos"] = 0
            preds = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for (cs, td, ta) in scan_sel:
            cid, chs, cvs, tq = idx[cs]
            for v in range(cvs):
                for u in range(chs):
                    zz = [0] * 64
                    s = huffdec(dcs[td])
                    preds[cid] += extend(readbits(s), s)
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = huffdec(acs[ta])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break
                        k += r
                        zz[k] = extend(readbits(s), s)
                        k += 1
                    # dequant (qt stored zigzag) + de-zigzag
                    blk = [[0.0] * 8 for _ in range(8)]
                    for k2 in range(64):
                        r2, c2 = divmod(ZIGZAG[k2], 8)
                        blk[r2][c2] = zz[k2] * qts[tq][k2]
                    # IDCT
                    sp = [[0.0] * 8 for _ in range(8)]
                    for x in range(8):
                        for y2 in range(8):
                            acc = 0.0
                            for uu in range(8):
                                cu = math.sqrt(0.5) if uu == 0 else 1.0
                                for vv in range(8):
                                    cv = math.sqrt(0.5) if vv == 0 else 1.0
                                    acc += (
                                        cu * cv * blk[uu][vv]
                                        * math.cos((2 * x + 1) * uu * math.pi / 16)
                                        * math.cos((2 * y2 + 1) * vv * math.pi / 16)
                                    )
                            sp[x][y2] = acc / 4.0
                    p = planes[cid]
                    for x in range(8):
                        for y2 in range(8):
                            val = int(math.floor(sp[x][y2] + 128.5))
                            p[(my * cvs + v) * 8 + x][(mx * chs + u) * 8 + y2] = (
                                0 if val < 0 else (255 if val > 255 else val)
                            )
    # upsample + color convert
    out = []
    get = {}
    for cid, chs, cvs, tq in comps:
        get[cid] = (chs, cvs)
    for yy in range(h):
        row = []
        for xx in range(w):
            vals = {}
            for cid, (chs, cvs) in get.items():
                vals[cid] = planes[cid][yy * cvs // vmax][xx * chs // hmax]
            if len(comps) == 1:
                g = vals[comps[0][0]]
                row.append((g, g, g))
            else:
                Y, Cb, Cr = vals[1], vals[2] - 128, vals[3] - 128
                r = int(math.floor(Y + 1.402 * Cr + 0.5))
                g = int(math.floor(Y - 0.344136 * Cb - 0.714136 * Cr + 0.5))
                b = int(math.floor(Y + 1.772 * Cb + 0.5))
                clip = lambda t: 0 if t < 0 else (255 if t > 255 else t)
                row.append((clip(r), clip(g), clip(b)))
        out.append(row)
    return out


def _smooth_image(rng, h, w):
    """Low-frequency test image (JPEG quantization is gentle on these, so
    roundtrip SNR is meaningful)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 80 * np.sin(2 * np.pi * xx / w * 2)
        + 40 * np.cos(2 * np.pi * yy / h * 3)
    )
    img = np.stack(
        [base, np.roll(base, h // 4, axis=0), 255 - base], axis=2
    )
    img = img + rng.normal(0, 3, size=img.shape)
    return img.clip(0, 255).astype(np.uint8)


def _snr_db(ref, got):
    ref = ref.astype(np.float64)
    got = got.astype(np.float64)
    noise = ((ref - got) ** 2).mean()
    if noise == 0:
        return float("inf")
    return 10 * math.log10((ref**2).mean() / noise)


def test_jpeg_roundtrip_444():
    rng = np.random.default_rng(1)
    img = _smooth_image(rng, 24, 31)  # non-multiple-of-8 dims
    got = MM.decode_image(encode_jpeg(img, "444"), "jpeg")
    assert got.shape == img.shape
    assert _snr_db(img, got) > 25


def test_jpeg_roundtrip_420():
    rng = np.random.default_rng(2)
    img = _smooth_image(rng, 33, 50)
    got = MM.decode_image(encode_jpeg(img, "420"), "jpeg")
    assert got.shape == img.shape
    # Annex K chroma table is coarse (flat 99s) and this image has strong
    # chroma edges; 4:2:0 lands ~21 dB, and the oracle-parity test pins
    # that the decode itself is exact — this asserts bounded distortion
    assert _snr_db(img, got) > 20


def test_jpeg_restart_markers():
    rng = np.random.default_rng(3)
    img = _smooth_image(rng, 32, 40)
    a = MM.decode_image(encode_jpeg(img, "444", restart_interval=0), "jpeg")
    b = MM.decode_image(encode_jpeg(img, "444", restart_interval=3), "jpeg")
    # restart markers change the container, not the pixels
    assert np.array_equal(a, b)


def test_jpeg_matches_stdlib_oracle():
    rng = np.random.default_rng(4)
    img = _smooth_image(rng, 16, 19)
    for sub in ("444", "420"):
        data = encode_jpeg(img, sub)
        eng = MM.decode_image(data, "jpeg")
        ora = np.array(oracle_decode_jpeg(data), dtype=np.int32)
        diff = np.abs(eng.astype(np.int32) - ora)
        # independent float pipelines: agree to the last bit or one LSB
        assert diff.max() <= 1, (sub, diff.max())


def test_jpeg_rejects_progressive_and_truncation():
    rng = np.random.default_rng(5)
    img = _smooth_image(rng, 16, 16)
    data = bytearray(encode_jpeg(img, "444"))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(MM.ImageDecodeError, match="SOF2"):
        MM.decode_image(bytes(data), "jpeg")
    with pytest.raises(MM.ImageDecodeError):
        MM.decode_image(b"\xff\xd8\xff\xdb\x00\x04\x00", "jpeg")


def test_jpeg_fuzz_random_images():
    """Arbitrary (noisy) content roundtrips through encode -> engine decode
    without errors and with bounded distortion vs the oracle decoder."""
    rng = np.random.default_rng(6)
    for trial in range(3):
        hh = int(rng.integers(8, 40))
        ww = int(rng.integers(8, 40))
        img = rng.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)
        data = encode_jpeg(img, "444" if trial % 2 else "420",
                           restart_interval=int(rng.integers(0, 4)))
        eng = MM.decode_image(data, "jpeg")
        assert eng.shape == (hh, ww, 3)
        ora = np.array(oracle_decode_jpeg(data), dtype=np.int32)
        assert np.abs(eng.astype(np.int32) - ora).max() <= 1


def test_jpeg_cross_format_near_dup_confirms_e2e(spark, cfg):
    """A JPEG and a PNG of the SAME image must confirm as a near-dup pair
    through the shared bands -> pairs -> verify chain on real bytes."""
    from tests.test_sources_multimodal import encode_png

    rng = np.random.default_rng(7)
    img = _smooth_image(rng, 32, 32)
    # genuinely different content: random 4x4 block mosaic (two smooth
    # sinusoids can collide in the coarse 8x8-luminance shingle space)
    other = np.repeat(
        np.repeat(
            np.random.default_rng(99).integers(0, 256, size=(8, 8, 3), dtype=np.uint8),
            4, axis=0,
        ),
        4, axis=1,
    )
    rows = [
        ("img_jpeg", encode_jpeg(img, "420"), 32, 32, "jpeg"),
        ("img_png", encode_png(img, 1), 32, 32, "png"),
        ("img_other", encode_png(other, 1), 32, 32, "png"),
    ]
    images = spark.createDataFrame(rows, MM.IMAGES_SCHEMA)
    feats = MM.featurize_images(images, cfg)
    from consult_spark.operators import bands as B
    from consult_spark.operators import pairs as P
    from consult_spark.operators import verify as V

    cands = P.candidate_pairs(B.capped_buckets(B.explode_bands(feats), cfg), cfg)
    scored = V.channel_scores(cands, feats, "img", cfg)
    got = {(r["clip_a"], r["clip_b"]): r["jaccard"] for r in scored.collect()}
    assert ("img_jpeg", "img_png") in got
    assert got[("img_jpeg", "img_png")] >= cfg.txt_jaccard_threshold
    assert got.get(("img_jpeg", "img_other"), 0.0) < cfg.txt_jaccard_threshold


def test_jpeg_truncated_sof0_and_sos_soft_fail():
    """SOF0/SOS segments cut short of their declared component lists must
    raise ImageDecodeError, never IndexError (ADVICE r5: one malformed file
    in a dirty corpus must soft-fail that image, not the Spark task)."""
    # SOF0 declares 3 components but the segment ends mid-list
    body = bytes([8, 0, 16, 0, 16, 3, 1, 0x11])  # prec,h,w,nc=3, comp0 cut
    seg = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(MM.ImageDecodeError):
        MM.decode_image(b"\xff\xd8" + seg + b"\x00\x00", "jpeg")
    # SOF0 with a body shorter than the fixed 6-byte header
    body = bytes([8, 0, 16])
    seg = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(MM.ImageDecodeError):
        MM.decode_image(b"\xff\xd8" + seg + b"\x00\x00", "jpeg")
    # SOS declares 3 scan components but provides only one selector byte
    body = bytes([3, 1])
    seg = b"\xff\xda" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(MM.ImageDecodeError):
        MM.decode_image(b"\xff\xd8" + seg + b"\x00\x00", "jpeg")
    # empty SOS body
    seg = b"\xff\xda" + (2).to_bytes(2, "big")
    with pytest.raises(MM.ImageDecodeError):
        MM.decode_image(b"\xff\xd8" + seg + b"\x00\x00", "jpeg")


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker.
    A spec-legal file with fill padding must decode identically to the
    unpadded stream (ADVICE r5: previously misparsed as segment desync)."""
    rng = np.random.default_rng(29)
    img = _smooth_image(rng, 24, 17)
    data = encode_jpeg(img, "420", restart_interval=2)
    ref = MM.decode_image(data, "jpeg")

    # insert fill bytes before several header markers: after SOI, before
    # the first DQT, and before SOF0
    padded = bytearray(data)
    for pat, nfill in ((b"\xff\xc0", 3), (b"\xff\xdb", 1), (b"\xff\xc4", 2)):
        i = bytes(padded).find(pat)
        assert i > 0
        padded[i:i] = b"\xff" * nfill
    got = MM.decode_image(bytes(padded), "jpeg")
    np.testing.assert_array_equal(got, ref)
