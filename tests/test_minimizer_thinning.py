"""B4 minimizer thinning for the pcm channel (minimization.cpp:158-171
precedent, README.md:143-163 motivation) — the shingle-table volume lever.

Config-gated (default off — see Config.pcm_minimizer_w for the measured
precision tradeoff on this low-entropy synthetic corpus).  This suite pins
the envelope at w=6 on the 5k-clip s-tier:

  * volume: thinned pcm shingle rows/clip drop >= 3x;
  * recall: planted dup pairs still land in one cluster >= 0.99;
  * precision floor: the measured degradation stays bounded (>= 0.85
    pairwise) so a regression is still caught;
  * unit: engine thinning == independent python-loop oracle.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from consult_spark.config import Config
from consult_spark.datagen import generate_corpus_spark, truth_tables
from consult_spark.operators import bands as B
from consult_spark.operators import cluster as C
from consult_spark.operators import pairs as P
from consult_spark.operators import shingle as SH
from consult_spark.operators import verify as V

THINNED = Config(pcm_minimizer_w=6, low_info_floor=32)  # 32 ~= 100 * 2/(w+1)


def test_thin_minimizers_matches_loop_oracle():
    rng = np.random.default_rng(7)
    for n in (0, 3, 6, 7, 50, 500):
        h = rng.integers(0, 1 << 63, size=n).astype(np.uint64)
        got = SH.thin_minimizers(h, 6)
        hs = [int(x) for x in h]
        exp = hs if len(hs) <= 6 else [min(hs[i : i + 6]) for i in range(len(hs) - 5)]
        assert [int(x) for x in got] == exp


def test_thinning_reduces_volume(corpus_xs):
    full = Config()
    ns_full, ns_thin = [], []
    for _, row in corpus_xs["clips"].head(30).iterrows():
        ns_full.append(len(SH.pcm_shingle_set(bytes(row["bytes"]), "pcm_s16le", full)))
        ns_thin.append(len(SH.pcm_shingle_set(bytes(row["bytes"]), "pcm_s16le", THINNED)))
    ratio = sum(ns_full) / max(1, sum(ns_thin))
    assert ratio >= 3.0, f"thinning ratio {ratio:.2f}"


@pytest.fixture(scope="module")
def s_tier_thinned(spark):
    clips, layout = generate_corpus_spark(spark, 5000, seed=42)
    clips = clips.persist()
    clips.count()
    feats = SH.featurize(clips, THINNED).persist()
    buckets = B.capped_buckets(B.explode_bands(feats), THINNED)
    cands = P.candidate_pairs(buckets, THINNED)
    confirmed = V.confirm_pairs(cands, feats, clips, THINNED).persist()
    clusters = {
        r["clip_id"]: r["cluster_id"]
        for r in C.assign_clusters(clips, confirmed, THINNED).collect()
    }
    truth = truth_tables(layout)
    yield clusters, truth, confirmed
    clips.unpersist()
    feats.unpersist()
    confirmed.unpersist()


def test_thinned_s_tier_recall(s_tier_thinned):
    clusters, truth, _ = s_tier_thinned
    pairs = truth["truth_pairs"]
    hit = sum(
        1 for t in pairs.itertuples(index=False) if clusters[t.clip_a] == clusters[t.clip_b]
    )
    recall = hit / len(pairs)
    assert recall >= 0.99, f"thinned s-tier recall {recall:.4f} over {len(pairs)} pairs"


def test_thinned_s_tier_precision_envelope(s_tier_thinned):
    """Winnowed sets of unrelated low-entropy clips overlap (false-pair
    jaccard p99 rises 0.24 -> ~0.73 at w=6, measured) — precision degrades
    to ~0.90 on THIS corpus.  Pin the measured envelope so a real regression
    (e.g. a thinning bug collapsing all sets) is still caught."""
    clusters, truth, confirmed = s_tier_thinned
    tset = set(zip(truth["truth_pairs"]["clip_a"], truth["truth_pairs"]["clip_b"]))
    rows = confirmed.select("clip_a", "clip_b").collect()
    extra = sum(1 for r in rows if (r["clip_a"], r["clip_b"]) not in tset)
    precision = 1 - extra / max(1, len(rows))
    assert precision >= 0.85, f"thinned pairwise precision {precision:.4f}"
