"""Shingle/signature stage vs oracle, and determinism across partitionings."""

from __future__ import annotations

import numpy as np

from consult_spark.operators import shingle as SH
from tests import oracle as O


def test_pcm_shingles_match_oracle(corpus_xs, cfg):
    for _, row in corpus_xs["clips"].head(15).iterrows():
        got = {int(v) for v in SH.pcm_shingle_set(row["bytes"], "pcm_s16le", cfg)}
        exp = O.pcm_shingles(row["bytes"], cfg)
        assert got == exp, row["clip_id"]


def test_txt_shingles_match_oracle(corpus_xs, cfg):
    for _, row in corpus_xs["clips"].head(30).iterrows():
        got = {int(v) for v in SH.txt_shingle_set(row["transcript"], cfg)}
        exp = O.txt_shingles(row["transcript"], cfg)
        assert got == exp


def test_featurize_spark_matches_oracle(spark, clips_xs, oracle_xs, cfg):
    feats = SH.featurize(clips_xs, cfg).collect()
    assert len(feats) == 2 * clips_xs.count()
    from tests.oracle import truncate32

    for r in feats:
        key = (r["clip_id"], r["kind"])
        got_set = {int(np.uint32(np.int32(v))) for v in r["shingles"]}
        assert got_set == truncate32(oracle_xs.shingle_sets[key]), key
        got_mh = [int(np.uint64(np.int64(v))) for v in r["minhash"]]
        assert got_mh == oracle_xs.minhashes[key], key
        assert int(np.uint64(np.int64(r["simhash"]))) == oracle_xs.simhashes[key], key
        exp_bands = O.band_hash_list(
            oracle_xs.minhashes[key], cfg.n_bands, cfg.rows_per_band, cfg.band_seed
        )
        got_bands = [int(np.uint64(np.int64(v))) for v in r["bands"]]
        assert got_bands == exp_bands, key


def test_featurize_deterministic_across_partitionings(spark, clips_xs, cfg):
    a = SH.featurize(clips_xs.repartition(1), cfg)
    b = SH.featurize(clips_xs.repartition(7, "clip_id"), cfg)
    pa = {(r["clip_id"], r["kind"]): (r["simhash"], tuple(r["minhash"])) for r in a.collect()}
    pb = {(r["clip_id"], r["kind"]): (r["simhash"], tuple(r["minhash"])) for r in b.collect()}
    assert pa == pb
