"""Generate the golden oracle tables for the UDF-only audio queries.

The numpy oracle (tests/oracle.py) is an independent implementation of the
pipeline spec — different decode path (stdlib wave), different hashing
(python big-int), different clustering (union-find).  This script runs it
over the deterministic 200-clip driver fixture (generate_corpus_pandas(200,
42) — the same corpus __spark_entry__._clips_fixture serves) and freezes the
expected `audio_confirmed_pairs` / `audio_clusters` tables as parquet, which
the driver's DuckDB side reads via read_parquet() — upgrading those queries
from rows-only to full hash-checked entries.  CONSULT's analog: golden
end-to-end FASTQ outputs as the trusted fixtures (README.md:85-99).

Usage: python scripts/gen_audio_oracle.py   (rewrites tests/fixtures/*.parquet)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from consult_spark.config import Config
from consult_spark.datagen import generate_corpus_pandas
from tests.oracle import run_oracle

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def main() -> None:
    cfg = Config()
    clips = generate_corpus_pandas(200, 42)["clips"]
    r = run_oracle(clips, cfg)

    confirmed = pd.DataFrame(
        [
            {
                "clip_a": a,
                "clip_b": b,
                "pcm_jaccard": float(s["pcm_jaccard"]),
                "txt_jaccard": float(s["txt_jaccard"]),
                "pcm_hamming": int(s["pcm_hamming"]),
                "txt_hamming": int(s["txt_hamming"]),
                "n_bands_pcm": int(s["n_bands_pcm"]),
                "n_bands_txt": int(s["n_bands_txt"]),
                "lcs": int(s["lcs"]),
                "substr": bool(s["substr"]),
                "is_dup": bool(s["is_dup"]),
            }
            for (a, b), s in sorted(r.confirmed.items())
        ]
    ).astype({"pcm_hamming": "int32", "txt_hamming": "int32",
              "n_bands_pcm": "int32", "n_bands_txt": "int32", "lcs": "int32"})
    clusters = pd.DataFrame(
        [{"clip_id": cid, "cluster_id": lab} for cid, lab in sorted(r.clusters.items())]
    )

    # probe_metadata golden: the GENERATOR's own stored metadata columns —
    # ground truth by construction (dur_ms is computed from the actual
    # sample count at synthesis, datagen.synthesize_rows) — which the
    # header-only probes (functions/probe.py) must recover from bytes alone
    meta = clips[["clip_id", "codec", "sr_hz", "dur_ms"]].astype(
        {"sr_hz": "int32", "dur_ms": "int32"}
    )

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    confirmed.to_parquet(os.path.join(FIXTURE_DIR, "oracle_audio_confirmed_pairs.parquet"), index=False)
    clusters.to_parquet(os.path.join(FIXTURE_DIR, "oracle_audio_clusters.parquet"), index=False)
    meta.to_parquet(os.path.join(FIXTURE_DIR, "oracle_probe_metadata.parquet"), index=False)
    print(f"wrote {len(confirmed)} confirmed pairs, {len(clusters)} cluster rows, "
          f"{len(meta)} probe-metadata rows -> {FIXTURE_DIR}")


if __name__ == "__main__":
    main()
