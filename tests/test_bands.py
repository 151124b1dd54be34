"""Band explode + salted cap: hot-bucket behavior, determinism, oracle parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from consult_spark.operators import bands as B
from consult_spark.operators import shingle as SH


@pytest.fixture(scope="module")
def features_xs(spark, clips_xs, cfg):
    return SH.featurize(clips_xs, cfg).cache()


def test_band_explode_counts(spark, features_xs, cfg):
    n_feat = features_xs.filter(F.col("n_shingles") > 0).count()
    n_bands = B.explode_bands(features_xs).count()
    assert n_bands == n_feat * cfg.n_bands


def test_cap_enforced_on_hot_bucket(spark, features_xs, cfg):
    """The planted hot clique (50 near-identical clips) must produce buckets
    above the cap pre-cap and exactly at the cap post-cap."""
    bands = B.explode_bands(features_xs)
    pre = bands.groupBy(*B.BUCKET_COLS).count()
    hot_pre = pre.filter(F.col("count") > cfg.bucket_cap)
    # hot clique is 50 > cap? cap=64 in default config: tighten cap for test
    from consult_spark.config import Config

    small = Config(bucket_cap=8)
    capped = B.capped_buckets(bands, small)
    post = capped.groupBy(*B.BUCKET_COLS).count()
    assert post.agg(F.max("count")).first()[0] <= small.bucket_cap
    # every pre-cap bucket still exists post-cap
    assert post.count() == pre.count()


def test_cap_keeps_smallest_clip_ids(spark, features_xs, cfg):
    """Deterministic cap: survivors are exactly the cap-smallest clip_ids
    (two-phase salted result == single global window result == oracle rule)."""
    from consult_spark.config import Config

    small = Config(bucket_cap=5)
    bands = B.explode_bands(features_xs).filter(F.col("kind") == "pcm")
    capped = B.capped_buckets(bands, small)
    got = {
        (r["kind"], r["table_l"], r["band_hash"]): sorted(r["members"])
        for r in capped.groupBy(*B.BUCKET_COLS)
        .agg(F.collect_list("clip_id").alias("members"))
        .collect()
    }
    exp_all = {}
    for r in bands.collect():
        exp_all.setdefault((r["kind"], r["table_l"], r["band_hash"]), []).append(r["clip_id"])
    for key, members in exp_all.items():
        assert got[key] == sorted(members)[: small.bucket_cap], key


def test_bucket_stats_counts_drops(spark, features_xs):
    from consult_spark.config import Config

    small = Config(bucket_cap=8)
    bands = B.explode_bands(features_xs)
    stats = B.bucket_stats(bands, small)
    dropped = stats.agg(F.sum("n_dropped")).first()[0]
    # hot clique of 50 at cap 8 must drop members in many buckets
    assert dropped > 0


def test_buckets_deterministic_across_partitionings(spark, features_xs, cfg):
    a = B.capped_buckets(B.explode_bands(features_xs.repartition(3)), cfg)
    b = B.capped_buckets(B.explode_bands(features_xs.repartition(11, "clip_id")), cfg)
    sa = sorted(map(tuple, a.collect()))
    sb = sorted(map(tuple, b.collect()))
    assert sa == sb


def test_buckets_match_oracle(spark, features_xs, oracle_xs, cfg):
    capped = B.capped_buckets(B.explode_bands(features_xs), cfg)
    got: dict = {}
    for r in capped.collect():
        got.setdefault((r["kind"], r["table_l"], int(np.uint64(np.int64(r["band_hash"])))), []).append(
            r["clip_id"]
        )
    exp = {
        key: sorted(members)[: cfg.bucket_cap]
        for key, members in oracle_xs.buckets.items()
    }
    assert {k: sorted(v) for k, v in got.items()} == exp
