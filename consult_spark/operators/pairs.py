"""Candidate-pair generation from LSH buckets.

CONSULT probes each query k-mer against the bucket its signature addresses
(main_search.cpp:810-846).  In pair-generation mode the probe becomes a
bucket-local self-join: every pair of members of the same (kind, table_l,
band_hash) bucket is a candidate.  Because buckets are already capped at
cfg.bucket_cap (bands.py), the expansion is bounded by cap^2/2 per bucket —
the cap is what makes the self-join safe at 10^12 rows.

Implementation note: instead of a DataFrame self-join (two shuffles of the
bucket table), we groupBy the bucket key once, collect the (sorted, capped)
member array, and expand combinations with JVM-side higher-order functions
(transform/slice/flatten) — one shuffle, no Python, and the sort gives
`clip_a < clip_b` canonicalization for free.  Cross-band duplicate hits are
collapsed by the final groupBy, which is also where the c-threshold lives
(reads matched iff >= c k-mer hits, main_search.cpp:883-894, README.md:106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import Config
from .bands import BUCKET_COLS

_PAIR_EXPAND = (
    "flatten(transform(members, (x, i) -> "
    "transform(slice(members, i + 2, size(members)), y -> "
    "struct(x AS clip_a, y AS clip_b))))"
)


def bucket_pairs(buckets: DataFrame) -> DataFrame:
    """capped buckets -> one row per (kind, clip_a, clip_b) per bucket hit."""
    grouped = buckets.groupBy(*BUCKET_COLS).agg(
        F.sort_array(F.collect_list("clip_id")).alias("members")
    )
    return (
        grouped.filter(F.size("members") >= 2)
        .select("kind", F.explode(F.expr(_PAIR_EXPAND)).alias("p"))
        .select("kind", "p.clip_a", "p.clip_b")
    )


def probe_candidates(query_bands: DataFrame, lib_buckets: DataFrame, cfg: Config) -> DataFrame:
    """Query-vs-library probe (CONSULT's actual search mode,
    main_search.cpp:810-846): join query band rows against the prebuilt
    bucket table -> (query_id, lib_id, kind, n_bands).

    The library side is capped (bands.salted_capped_buckets), so each query
    band row meets <= cap library rows.  Catalyst picks broadcast when the
    library fits (the distributed stand-in for CONSULT's RAM-resident shared
    index, main_search.cpp:523-658) and a shuffled join otherwise.
    """
    lib = lib_buckets.withColumnsRenamed({"clip_id": "lib_id"})
    q = query_bands.withColumnsRenamed({"clip_id": "query_id"})
    hits = q.join(lib, BUCKET_COLS, "inner").filter(F.col("query_id") != F.col("lib_id"))
    agg = hits.groupBy("query_id", "lib_id").agg(
        F.sum(F.when(F.col("kind") == "pcm", 1).otherwise(0)).alias("n_bands_pcm"),
        F.sum(F.when(F.col("kind") == "txt", 1).otherwise(0)).alias("n_bands_txt"),
        F.count("*").alias("n_bands_all"),
    )
    c = cfg.min_common_bands
    # any channel reaching c qualifies (img/vid features probe the same way)
    return agg.filter(
        (F.col("n_bands_pcm") >= c)
        | (F.col("n_bands_txt") >= c)
        | ((F.col("n_bands_all") - F.col("n_bands_pcm") - F.col("n_bands_txt")) >= c)
    ).drop("n_bands_all")


def candidate_pairs(buckets: DataFrame, cfg: Config) -> DataFrame:
    """-> (clip_a, clip_b, n_bands_pcm, n_bands_txt), clip_a < clip_b,
    deduplicated across bands and channels, c-threshold applied per channel
    (a pair qualifies if ANY channel reaches cfg.min_common_bands — the
    L-table OR of the reference, main_search.cpp:810-880)."""
    hits = bucket_pairs(buckets)
    agg = hits.groupBy("clip_a", "clip_b").agg(
        F.sum(F.when(F.col("kind") == "pcm", 1).otherwise(0)).alias("n_bands_pcm"),
        F.sum(F.when(F.col("kind") == "txt", 1).otherwise(0)).alias("n_bands_txt"),
        F.count("*").alias("n_bands_all"),
    )
    c = cfg.min_common_bands
    # any channel reaching c qualifies; n_bands_all covers non-pcm/txt
    # channels (img/vid features ride the same operators)
    return agg.filter(
        (F.col("n_bands_pcm") >= c)
        | (F.col("n_bands_txt") >= c)
        | ((F.col("n_bands_all") - F.col("n_bands_pcm") - F.col("n_bands_txt")) >= c)
    ).drop("n_bands_all")
