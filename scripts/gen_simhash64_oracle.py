"""Golden-table generator for the simhash64_band_pairs driver gate.

INDEPENDENT implementation of the 64-bit SimHash band-dedup spec in pure
Python big-int arithmetic (no numpy, no engine imports) — the same stance as
tests/oracle.py for the audio stages: an independent implementation of the
same spec, run once over the FIXED 500-doc tier, pinned as parquet.

Spec (shared with consult_spark.operators.text.simhash64 /
simhash64_band_pairs):
  normalize   = lowercase + whitespace collapsed to single spaces
  shingle set = distinct width-5 byte windows of the normalized utf-8 text
                (whole text if shorter than 5 bytes; empty text -> fp 0)
  window hash = splitmix64( sum_i byte_i * m^(k-1-i) mod 2^64 ),
                m = 0x100000001B3 (the bytes_shingle_hashes polynomial)
  per-feature = splitmix64(window_hash)  (simhash_batch's seed-0 mix)
  fingerprint = bit j set iff strictly more features have bit j set than not
  bands       = 4 x 16 bits; candidates share ANY (band, value)
  verified    = popcount(fp_a XOR fp_b) <= 3

Run: python scripts/gen_simhash64_oracle.py
Writes tests/fixtures/oracle_simhash64_band_pairs.parquet.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

MASK64 = (1 << 64) - 1
DOCS = "/root/testdata/sf0.001/documents.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "oracle_simhash64_band_pairs.parquet",
)


def splitmix64(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return z ^ (z >> 31)


def shingle_hashes(text: str, k: int = 5) -> set[int]:
    norm = " ".join((text or "").lower().split())
    b = norm.encode("utf-8")
    if not b:
        return set()
    k = min(k, len(b))
    out = set()
    for i in range(len(b) - k + 1):
        # Horner evaluation ((..(b0*m + b1)*m + b2)..) mod 2^64 equals the
        # spec's sum b_i * m^(k-1-i) — same polynomial, different op order.
        h = 0
        for byte in b[i : i + k]:
            h = (h * 0x100000001B3 + byte) & MASK64
        out.add(splitmix64(h))
    return out


def simhash64(text: str) -> int:
    feats = shingle_hashes(text)
    if not feats:
        return 0
    mixed = {splitmix64(h) for h in feats}
    n = len(mixed)
    fp = 0
    for j in range(64):
        ones = sum((h >> j) & 1 for h in mixed)
        if 2 * ones - n > 0:
            fp |= 1 << j
    return fp


def to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def main() -> None:
    rows = duckdb.sql(f"SELECT doc_id, text FROM '{DOCS}' ORDER BY doc_id").fetchall()
    fps = {doc_id: simhash64(text) for doc_id, text in rows}

    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, fp in fps.items():
        for b in range(4):
            buckets.setdefault((b, (fp >> (16 * b)) & 0xFFFF), []).append(doc_id)

    cand = set()
    for members in buckets.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))

    out = {"doc_a": [], "doc_b": [], "sim_a": [], "sim_b": [], "hamming": []}
    for a, b in sorted(cand):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= 3:
            out["doc_a"].append(a)
            out["doc_b"].append(b)
            out["sim_a"].append(to_i64(fps[a]))
            out["sim_b"].append(to_i64(fps[b]))
            out["hamming"].append(h)

    n = len(rows)
    print(f"docs={n} candidates={len(cand)} "
          f"({100.0 * len(cand) / (n * (n - 1) / 2):.3f}% of all pairs) "
          f"confirmed={len(out['doc_a'])}")
    table = pa.table(
        {k: pa.array(v, type=pa.int64()) for k, v in out.items()}
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
