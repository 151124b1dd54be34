"""Band explode + salted, capacity-capped LSH buckets.

The analog of CONSULT's capped grouped insert (28 slots per bucket row,
overflow dropped and counted — main_map.cpp:62, 592-623, 903-905).  The cap
is load-bearing twice over:

* semantics — matching the reference's recall behavior means a hot bucket
  contributes at most `cap` members, deterministically (we order by clip_id,
  where the reference keeps first-come order and documents the resulting
  irreproducibility, README.md:201-207);
* scale — at 10^12 clips a Zipfian band hash would otherwise put one bucket
  on one task.  The cap is enforced in TWO phases so no single task ever
  sees a whole hot bucket:

    phase 1 (salted, map-side-ish): window over (kind, table_l, band_hash,
        salt) keeps the cap-smallest clip_ids per salt slice — a hot bucket
        of M rows shrinks to at most n_salts * cap rows;
    phase 2: window over (kind, table_l, band_hash) keeps the global
        cap-smallest.  Input to this window is already bounded, so the skew
        is gone before the expensive shuffle.

Salt = pmod(xxhash64(clip_id), n_salts) — deterministic, not random, so the
result (and therefore every downstream table) is reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import Config

BUCKET_COLS = ["kind", "table_l", "band_hash"]


def explode_bands(features: DataFrame) -> DataFrame:
    """features -> one row per (clip_id, kind, table_l, band_hash).

    posexplode is JVM-side; no Python is involved in the fan-out.
    Empty shingle sets are excluded — an all-sentinel MinHash would
    otherwise make every empty clip collide with every other empty clip.
    """
    return features.filter(F.col("n_shingles") > 0).select(
        "clip_id",
        "kind",
        F.posexplode("bands").alias("table_l", "band_hash"),
    )


def salted_capped_buckets(bands: DataFrame, cfg: Config) -> DataFrame:
    """bands -> bucket membership with the per-bucket cap enforced.

    Returns (kind, table_l, band_hash, clip_id) with at most cfg.bucket_cap
    rows per bucket. Deterministic: ties broken by clip_id ordering.
    """
    salted = bands.withColumn(
        "salt", F.pmod(F.xxhash64("clip_id"), F.lit(cfg.n_salts)).cast("int")
    )
    w1 = Window.partitionBy("kind", "table_l", "band_hash", "salt").orderBy("clip_id")
    phase1 = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= cfg.bucket_cap)
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy(*BUCKET_COLS).orderBy("clip_id")
    return (
        phase1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= cfg.bucket_cap)
        .drop("rn")
    )


def bucket_stats(bands: DataFrame, cfg: Config) -> DataFrame:
    """Occupancy histogram + drop accounting (the analog of CONSULT's per-l
    kept-k-mer counters and row-occupancy histogram, main_map.cpp:903-905,
    1170-1197). Returns (kind, table_l, bucket_size, n_buckets, n_dropped)."""
    sizes = bands.groupBy(*BUCKET_COLS).agg(F.count("*").alias("bucket_size"))
    return (
        sizes.groupBy("kind", "table_l", "bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .withColumn(
            "n_dropped",
            F.when(
                F.col("bucket_size") > cfg.bucket_cap,
                (F.col("bucket_size") - cfg.bucket_cap) * F.col("n_buckets"),
            ).otherwise(F.lit(0)),
        )
    )
