"""Deterministic synthetic clip corpus with planted near-duplicate structure.

The reference ships golden end-to-end fixtures (66,667-read FASTQ + expected
``ucseq_`` output, README.md:85-99) that are absent from this copy
(.MISSING_LARGE_BLOBS), so we synthesize our own per FIXTURES.md: WAV-PCM16
clips + word-salad transcripts, a seeded 30% of bases carrying 1-4
near-duplicate variants (SNR>=30dB perturbations), and one hot-bucket clique
of mutually near-identical clips to force LSH skew (the analog of CONSULT's
28-slot row overflow path, main_map.cpp:592-623).

Every clip is a pure function of (master_seed, base_idx, variant_idx), so the
corpus can be synthesized driver-side (small tiers) or executor-side via
mapInPandas (bench tiers) with identical bytes either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CLIP_COLUMNS = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du", "ka", "ke",
    "ki", "ko", "ku", "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo",
    "mu", "na", "ne", "ni", "no", "nu", "ra", "re", "ri", "ro", "ru", "sa",
    "se", "si", "so", "su", "ta", "te", "ti", "to", "tu", "va", "ve", "vi",
]


def _vocab(seed: int, size: int = 512) -> list[str]:
    rng = np.random.default_rng(seed)
    words = set()
    out = []
    while len(out) < size:
        n = int(rng.integers(2, 5))
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n))
        if w not in words:
            words.add(w)
            out.append(w)
    return out


def _clip_rng(master_seed: int, base_idx: int, variant_idx: int) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([master_seed & 0xFFFFFFFF, base_idx & 0xFFFFFFFF, variant_idx])
    )


def _wav_bytes(x: np.ndarray, sr: int) -> bytes:
    """float [-1,1] -> RIFF/WAV PCM16 mono bytes."""
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    body = pcm.tobytes()
    n = len(body)
    hdr = (
        b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")          # mono
        + sr.to_bytes(4, "little")
        + (sr * 2).to_bytes(4, "little")     # byte rate
        + (2).to_bytes(2, "little")          # block align
        + (16).to_bytes(2, "little")         # bits
        + b"data" + n.to_bytes(4, "little")
    )
    return hdr + body


def _base_signal(rng: np.random.Generator) -> tuple[np.ndarray, int, int]:
    """Seeded base clip: 2-4 sinusoids under a piecewise random-walk amplitude
    envelope (the envelope is what gives the log-energy symbol sequence its
    temporal structure), plus a -40 dBFS noise floor."""
    sr = 16000 if rng.random() < 0.9 else 8000
    dur_ms = int(rng.integers(800, 3001))
    n = sr * dur_ms // 1000
    t = np.arange(n, dtype=np.float64) / sr
    x = np.zeros(n, dtype=np.float64)
    for _ in range(int(rng.integers(2, 5))):
        f = rng.uniform(100.0, 3000.0)
        a = rng.uniform(0.05, 0.25)
        ph = rng.uniform(0, 2 * np.pi)
        x += a * np.sin(2 * np.pi * f * t + ph)
    # piecewise-constant-ish envelope: random walk over ~100 ms segments,
    # linearly interpolated
    seg = max(2, n // (sr // 10))
    walk = np.cumsum(rng.normal(0, 0.35, size=seg))
    walk = np.exp(walk - walk.max())          # (0, 1]
    env = np.interp(np.arange(n), np.linspace(0, n - 1, seg), walk)
    x *= 0.2 + 0.8 * env
    x += rng.normal(0, 10 ** (-40 / 20), size=n)  # noise floor -40 dBFS
    peak = np.abs(x).max()
    if peak > 0.99:
        x *= 0.99 / peak
    return x, sr, dur_ms


def _perturb(x: np.ndarray, sr: int, rng: np.random.Generator, tiny: bool = False) -> np.ndarray:
    """SNR>=30dB-preserving perturbation (FIXTURES.md: gain <= ±0.5 dB,
    additive noise at >=35 dB SNR, <=5 ms zero-pad at tail)."""
    gain_db = rng.uniform(-0.15, 0.15) * (0.2 if tiny else 1.0)
    y = x * 10 ** (gain_db / 20)
    sig_pow = np.mean(np.square(y)) or 1e-12
    snr = rng.uniform(40.0, 50.0) if tiny else rng.uniform(36.0, 48.0)
    y = y + rng.normal(0, np.sqrt(sig_pow / 10 ** (snr / 10)), size=y.shape[0])
    if not tiny and rng.random() < 0.5:
        y = np.concatenate([y, np.zeros(int(rng.integers(1, sr * 5 // 1000 + 1)))])
    peak = np.abs(y).max()
    if peak > 0.999:
        y = y * (0.999 / peak)
    return y


def _transcript(rng: np.random.Generator, vocab: list[str]) -> str:
    n = int(rng.integers(5, 41))
    return " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), size=n))


def _edit_transcript(s: str, rng: np.random.Generator) -> str:
    """<=2 character edits (substitutions) — near-dup text that intentionally
    fails the exact-equality invariant, per FIXTURES.md."""
    chars = list(s)
    for _ in range(int(rng.integers(1, 3))):
        i = int(rng.integers(0, len(chars)))
        chars[i] = chr(ord("a") + int(rng.integers(0, 26)))
    return "".join(chars)


# ----------------------------------------------------------------------
# corpus layout: pure driver-side bookkeeping, cheap at any scale
# ----------------------------------------------------------------------

def corpus_layout(n_rows: int, seed: int = 42, hot_frac: float | None = None) -> pd.DataFrame:
    """Plan the corpus: which rows exist, their group structure.

    Returns DataFrame(clip_id, base_idx, variant_idx, group_kind) where
    group_kind in ('solo','dup','hot'). variant_idx 0 = the base itself.

    ``hot_frac`` sizes the hot clique (near-identical clips that all land in
    the same LSH buckets — the planted Zipfian head): None keeps the
    default ~0.5%; 0.0 removes the clique entirely (the uniform control for
    skew benchmarks); e.g. 0.01 makes the hottest key ~1% of all rows.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xC0]))
    if hot_frac is None:
        n_hot = max(50, int(0.005 * n_rows)) if n_rows >= 100 else max(6, n_rows // 20)
    else:
        n_hot = int(hot_frac * n_rows)
    rows: list[tuple[str, int, int, str]] = []
    # hot clique: one base, n_hot near-identical members
    for j in range(n_hot):
        rows.append((f"hot_{j:06d}", -1, j, "hot"))
    base_idx = 0
    while len(rows) < n_rows:
        is_dup = rng.random() < 0.30
        n_var = int(rng.integers(1, 5)) if is_dup else 0
        kind = "dup" if n_var > 0 else "solo"
        for v in range(0, n_var + 1):
            if len(rows) >= n_rows:
                break
            rows.append((f"clip_{base_idx:08d}_v{v}", base_idx, v, kind))
        base_idx += 1
    return pd.DataFrame(rows, columns=["clip_id", "base_idx", "variant_idx", "group_kind"])


def synthesize_rows(layout: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Materialize clip rows for a slice of the layout. Pure per-row function
    of (seed, base_idx, variant_idx) — safe to call on any partition slice."""
    vocab = _vocab(seed ^ 0x7EA7)
    out = []
    for t in layout.itertuples(index=False):
        if t.group_kind == "hot":
            base_rng = _clip_rng(seed, -1, 0)
            x, sr, dur_ms = _base_signal(base_rng)
            tr = _transcript(_clip_rng(seed, -1, 1), vocab)
            if t.variant_idx > 0:
                y = _perturb(x, sr, _clip_rng(seed, -1, 1000 + t.variant_idx), tiny=True)
            else:
                y = x
        else:
            base_rng = _clip_rng(seed, t.base_idx, 0)
            x, sr, dur_ms = _base_signal(base_rng)
            tr_rng = _clip_rng(seed, t.base_idx, 1)
            tr = _transcript(tr_rng, vocab)
            if t.variant_idx == 0:
                y = x
            else:
                vrng = _clip_rng(seed, t.base_idx, 1000 + t.variant_idx)
                y = _perturb(x, sr, vrng)
                if vrng.random() < 0.5:
                    tr = _edit_transcript(tr, vrng)
        out.append(
            (
                t.clip_id,
                _wav_bytes(y, sr),
                np.int32(sr),
                np.int32(y.shape[0] * 1000 // sr),
                "pcm_s16le",
                tr,
            )
        )
    return pd.DataFrame(out, columns=CLIP_COLUMNS)


def truth_tables(layout: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Ground-truth sidecars (FIXTURES.md): all planted dup pairs (a<b),
    the transitive-closure clusters, and the unique set (ucseq analog)."""
    pairs = []
    clusters = []
    for (kind, key), grp in layout.groupby(["group_kind", "base_idx"]):
        ids = sorted(grp["clip_id"])
        label = ids[0]
        for cid in ids:
            clusters.append((cid, label))
        if kind in ("dup", "hot") and len(ids) > 1:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.append((ids[i], ids[j], kind))
    truth_pairs = pd.DataFrame(pairs, columns=["clip_a", "clip_b", "kind"])
    truth_clusters = pd.DataFrame(clusters, columns=["clip_id", "cluster_id"])
    sizes = truth_clusters.groupby("cluster_id")["clip_id"].transform("size")
    truth_unique = truth_clusters.loc[sizes == 1, ["clip_id"]].reset_index(drop=True)
    return {
        "truth_pairs": truth_pairs,
        "truth_clusters": truth_clusters,
        "truth_unique": truth_unique,
    }


def generate_corpus_pandas(n_rows: int, seed: int = 42) -> dict[str, pd.DataFrame]:
    """Driver-side generation (xs/s tiers)."""
    layout = corpus_layout(n_rows, seed)
    clips = synthesize_rows(layout, seed)
    t = truth_tables(layout)
    return {"clips": clips, "layout": layout, **t}


def generate_corpus_spark(spark, n_rows: int, seed: int = 42, n_partitions: int | None = None,
                          hot_frac: float | None = None):
    """Executor-parallel generation (bench tiers): ship the layout, synthesize
    bytes inside mapInPandas. Deterministic under any partitioning because
    every row derives from its own SeedSequence."""
    layout = corpus_layout(n_rows, seed, hot_frac=hot_frac)
    # ~250 clips (~15 MB of WAV) per output file: enough files that a 32-core
    # local run and a many-executor cluster both get fine-grained tasks
    n_partitions = n_partitions or max(8, n_rows // 250)
    ldf = spark.createDataFrame(layout).repartition(n_partitions, "clip_id")

    def gen(batches):
        for pdf in batches:
            yield synthesize_rows(pdf, seed)

    clips = ldf.mapInPandas(gen, schema=CLIPS_SCHEMA)
    return clips, layout


# ---------------------------------------------------------------------------
# deterministic image corpus (media dedup fixtures / golden gate)
# ---------------------------------------------------------------------------

IMAGES_COLUMNS = ("img_id", "bytes", "width", "height", "format")


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _bmp_bytes(img: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP, rows padded to 4 bytes."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:
        raster += row[:, ::-1].tobytes()  # RGB -> BGR
        raster += b"\x00" * (stride - w * 3)
    header = (
        b"BM" + (54 + len(raster)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little") + b"\x00" * 16
    )
    return bytes(header) + bytes(raster)


def _png_bytes(img: np.ndarray) -> bytes:
    """8-bit truecolor PNG (color type 2), filter 0 per row, one IDAT."""
    import zlib

    h, w, _ = img.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, deflate, filter0, no interlace
    )
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# Annex K (ITU-T T.81) quantization tables, raster order — the standard
# baseline tables every JPEG tool ships
_JPEG_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_JPEG_QT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32, dtype=np.int32)
_JPEG_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_JPEG_DCT_M = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)]
    for u in range(8)
])


def _jpeg_bytes(img: np.ndarray) -> bytes:
    """Baseline 4:2:0 JPEG writer (numpy DCT + quant, fixed-length huffman
    tables: DC symbols 0-11 at 4 bits, AC symbols 0-255 at 9 bits — legal
    canonical codes, chosen for writer simplicity; the engine decoder reads
    whatever tables the file declares, and the Annex-K variable-length
    tables are exercised by tests/test_jpeg.py's independent encoder)."""
    import struct

    h, w, _ = img.shape
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
    cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
    cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    def quantized_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
        hh, ww = plane.shape
        blocks = (
            plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8) - 128.0
        )
        coef = np.einsum("ux,nxy,vy->nuv", _JPEG_DCT_M, blocks, _JPEG_DCT_M)
        q = np.round(coef.reshape(-1, 64) / qt[np.newaxis, :]).astype(np.int64)
        return q[:, _JPEG_ZZ]  # zigzag stream order

    # quality ~90: halved Annex K tables — keeps the planted brightness-
    # shift variants inside the block-feature quantization margin, so the
    # LOSSY format still exercises the full dedup chain without eroding
    # the planted ground truth
    qt_lum = np.maximum(1, _JPEG_QT_LUM // 2)
    qt_chrom = np.maximum(1, _JPEG_QT_CHROM // 2)
    yq = quantized_blocks(y, qt_lum)
    cbq = quantized_blocks(cb, qt_chrom)
    crq = quantized_blocks(cr, qt_chrom)

    bits: list[tuple[int, int]] = []

    def put(v: int, k: int) -> None:
        bits.append((v, k))

    def put_block(zz: np.ndarray, pred: int) -> int:
        diff = int(zz[0]) - pred
        s = int(abs(diff)).bit_length()
        put(s, 4)  # DC code: symbol s at 4 bits (code == symbol)
        if s:
            put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        nz = np.flatnonzero(zz[1:])
        k = 1
        for idx in nz:
            pos = int(idx) + 1
            run = pos - k
            while run > 15:
                put(0xF0, 9)  # ZRL
                run -= 16
            v = int(zz[pos])
            s = int(abs(v)).bit_length()
            put((run << 4) | s, 9)
            put(v if v >= 0 else v + (1 << s) - 1, s)
            k = pos + 1
        if k < 64:
            put(0x00, 9)  # EOB
        return int(zz[0])

    mcus_x, mcus_y = pw // 16, ph // 16
    preds = [0, 0, 0]
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for v in range(2):
            for u in range(2):
                bi = (my * 2 + v) * (mcus_x * 2) + (mx * 2 + u)
                preds[0] = put_block(yq[bi], preds[0])
        ci = my * mcus_x + mx
        preds[1] = put_block(cbq[ci], preds[1])
        preds[2] = put_block(crq[ci], preds[2])

    # pack bits, FF-stuffing
    payload = bytearray()
    acc = nb = 0
    for v, k in bits:
        acc = (acc << k) | (v & ((1 << k) - 1))
        nb += k
        while nb >= 8:
            nb -= 8
            b = (acc >> nb) & 0xFF
            payload.append(b)
            if b == 0xFF:
                payload.append(0x00)
            acc &= (1 << nb) - 1
    if nb:
        pad = 8 - nb
        b = ((acc << pad) | ((1 << pad) - 1)) & 0xFF
        payload.append(b)
        if b == 0xFF:
            payload.append(0x00)

    out = bytearray(b"\xff\xd8")
    for tq, qt in ((0, qt_lum), (1, qt_chrom)):
        body = bytes([tq]) + bytes(int(qt[z]) for z in _JPEG_ZZ)
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DC: symbols 0-11, all 4-bit -> canonical code == symbol.
    # AC: symbols 0-254 at 9 bits (code == symbol) + symbol 255 at 10 bits
    # (a DHT count byte maxes at 255); the encoder never emits 0xFF (run 15 /
    # size 15 cannot occur at 8-bit precision), so every emitted AC code is
    # the 9-bit symbol value itself.
    dc_counts = [0] * 16
    dc_counts[3] = 12
    dc_body = bytes([0x00]) + bytes(dc_counts) + bytes(range(12))
    ac_counts = [0] * 16
    ac_counts[8] = 255
    ac_counts[9] = 1
    ac_body = bytes([0x10]) + bytes(ac_counts) + bytes(range(255)) + bytes([255])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dc_body)) + dc_body
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(ac_body)) + ac_body
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += payload
    out += b"\xff\xd9"
    return bytes(out)


def _gif_median_cut(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic median-cut to <=256 colors: (palette 256x3 uint8,
    indices HxW uint8).  Lossless when the image already fits a 256-color
    table; otherwise boxes split on their widest channel at the
    pixel-count median and map to the count-weighted box mean — for the
    smooth gradient corpus the residual is a few LSBs, absorbed by the
    median-centered block features the same way JPEG quantization is."""
    h, w, _ = img.shape
    px = img.reshape(-1, 3).astype(np.int32)
    uniq, inv, counts = np.unique(
        px, axis=0, return_inverse=True, return_counts=True
    )
    if len(uniq) <= 256:
        pal, mapped = uniq, inv
    else:
        boxes = [np.arange(len(uniq))]
        while len(boxes) < 256:
            best, best_range, best_ch = -1, -1, 0
            for bi, box in enumerate(boxes):
                if len(box) < 2:
                    continue
                rng = uniq[box].max(axis=0) - uniq[box].min(axis=0)
                ch = int(rng.argmax())
                if rng[ch] > best_range:
                    best, best_range, best_ch = bi, int(rng[ch]), ch
            if best < 0:
                break
            box = boxes.pop(best)
            order = box[np.argsort(uniq[box][:, best_ch], kind="stable")]
            cum = np.cumsum(counts[order])
            k = int(np.searchsorted(cum, cum[-1] // 2, side="right"))
            k = min(max(k, 1), len(order) - 1)
            boxes.append(order[:k])
            boxes.append(order[k:])
        pal = np.array([
            np.round(
                (uniq[box] * counts[box, None]).sum(axis=0) / counts[box].sum()
            )
            for box in boxes
        ], dtype=np.int32)
        box_of = np.empty(len(uniq), dtype=np.int64)
        for pi, box in enumerate(boxes):
            box_of[box] = pi
        mapped = box_of[inv]
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: len(pal)] = pal.astype(np.uint8)
    return palette, mapped.reshape(h, w).astype(np.uint8)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW writer (LSB-first): clear code up front and
    whenever the table would pass 4096; the width bumps one entry after
    the decoder's table-size bump (decoder lags encoder by one entry)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        step = run + bytes([b])
        if step in table:
            run = step
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[step] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = eoi + 1, min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_bytes(img: np.ndarray) -> bytes:
    """GIF89a writer: deterministic median-cut palette (256-entry global
    color table), 8-bit LZW, single frame, no interlace."""
    import struct

    h, w, _ = img.shape
    palette, idx = _gif_median_cut(img)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 7, 0, 0])  # GCT present, 2^8 entries
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
    out += bytes([8])  # min code size
    stream = _gif_lzw_encode(idx.tobytes(), 8)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def generate_image_corpus_pandas(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic images with planted near-duplicate structure, mirroring
    the clip corpus: ~30% of bases get a variant (uniform brightness shift
    that the median-centered block features must absorb), rotating
    PPM/BMP/PNG/JPEG/GIF containers so dups cross formats — including the
    compressed PNG path (stdlib-zlib decode), the LOSSY baseline-JPEG
    path (the brightness-shifted variant of a jpeg base must survive both
    quantization noise and the shift), and the palette-quantized GIF path
    (median-cut to 256 colors when the image exceeds a color table).  Pixels are smooth gradients +
    seeded low-frequency blobs (structured, like photographs) rather than
    white noise, so block features carry signal."""
    rows = []
    i = 0
    base_idx = 0
    while len(rows) < n_rows:
        rng = np.random.default_rng(np.random.SeedSequence([seed, 7, base_idx]))
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
        img = 60 + 40 * np.sin(xx / rng.uniform(3, 9)) + 40 * np.cos(yy / rng.uniform(3, 9))
        for _ in range(rng.integers(2, 5)):
            cx, cy, r = rng.uniform(0, 32), rng.uniform(0, 32), rng.uniform(3, 10)
            img += rng.uniform(20, 80) * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
        chan = np.stack([img * rng.uniform(0.7, 1.0) for _ in range(3)], axis=-1)
        base = np.clip(chan, 0, 255).astype(np.uint8)
        variants = [base]
        if rng.random() < 0.30 and len(rows) + 2 <= n_rows + 1:
            shift = int(rng.integers(4, 12))
            variants.append(np.clip(base.astype(np.int32) + shift, 0, 255).astype(np.uint8))
        for v_idx, img_v in enumerate(variants):
            if len(rows) >= n_rows:
                break
            fmt = ("ppm", "bmp", "png", "jpeg", "gif")[(base_idx + v_idx) % 5]
            enc = {"ppm": _ppm_bytes, "bmp": _bmp_bytes, "png": _png_bytes,
                   "jpeg": _jpeg_bytes, "gif": _gif_bytes}[fmt]
            rows.append((f"img_{base_idx:06d}_{v_idx}", enc(img_v), 32, 32, fmt))
            i += 1
        base_idx += 1
    return pd.DataFrame(rows, columns=list(IMAGES_COLUMNS))


VIDEOS_COLUMNS = ("vid_id", "bytes", "fps", "dur_ms", "codec")


def _y4m_bytes(frames: list[np.ndarray], fps: int = 4) -> bytes:
    """YUV4MPEG2 writer: BT.601 limited-range forward transform, 2x2 chroma
    averaging (C420)."""
    h, w, _ = frames[0].shape
    out = bytearray(b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps))
    for f in frames:
        r, g, b = (f[..., c].astype(np.float64) for c in range(3))
        y = 16.0 + 0.257 * r + 0.504 * g + 0.098 * b
        u = 128.0 - 0.148 * r - 0.291 * g + 0.439 * b
        v = 128.0 + 0.439 * r - 0.368 * g - 0.071 * b
        out += b"FRAME\n"
        out += np.clip(y + 0.5, 0, 255).astype(np.uint8).tobytes()
        out += np.clip(u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) + 0.5, 0, 255).astype(np.uint8).tobytes()
        out += np.clip(v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) + 0.5, 0, 255).astype(np.uint8).tobytes()
    return bytes(out)


def _image_frame(seed_parts: list[int]) -> np.ndarray:
    """One structured 32x32 RGB frame (the generate_image_corpus_pandas
    recipe factored out for video reuse)."""
    rng = np.random.default_rng(np.random.SeedSequence(seed_parts))
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
    img = 60 + 40 * np.sin(xx / rng.uniform(3, 9)) + 40 * np.cos(yy / rng.uniform(3, 9))
    for _ in range(rng.integers(2, 5)):
        cx, cy, r = rng.uniform(0, 32), rng.uniform(0, 32), rng.uniform(3, 10)
        img += rng.uniform(20, 80) * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
    chan = np.stack([img * rng.uniform(0.7, 1.0) for _ in range(3)], axis=-1)
    return np.clip(chan, 0, 255).astype(np.uint8)


def generate_video_corpus_pandas(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic y4m videos with planted near-dup structure: each base is
    4 structured frames at 1 fps; ~30% of bases get a variant sharing 3 of
    the 4 frames (the frame-union shingle overlap must catch it)."""
    rows = []
    base_idx = 0
    while len(rows) < n_rows:
        rng = np.random.default_rng(np.random.SeedSequence([seed, 11, base_idx]))
        frames = [_image_frame([seed, 11, base_idx, k]) for k in range(4)]
        variants = [frames]
        if rng.random() < 0.30 and len(rows) + 2 <= n_rows + 1:
            alt = frames[:3] + [_image_frame([seed, 11, base_idx, 99])]
            variants.append(alt)
        for v_idx, fr in enumerate(variants):
            if len(rows) >= n_rows:
                break
            rows.append((f"vid_{base_idx:06d}_{v_idx}", _y4m_bytes(fr, fps=1), 1.0, 4000, "y4m"))
        base_idx += 1
    return pd.DataFrame(rows, columns=list(VIDEOS_COLUMNS))
