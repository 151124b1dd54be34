"""Text near-duplicate pipeline over a generic documents table
(doc_id, text) — the SQL-expressible twin of the main audio pipeline, built
ONLY from engine-portable expressions (md5, substring, min, window, join) so
every stage has an exact DuckDB oracle for the driver's correctness gate.

Stage map to the reference (same ids as SURVEY §2):
  doc_shingles          S5  sliding-window shingle enumeration
  minimizer_thin        B4  per-window lexicographic minimizer (minimization.cpp:158-171)
  exact_dup_groups      B5  dedup of identical payloads
  minhash_bands         B7/B8  L x K signatures -> bucket keys
  capped_buckets        B9  capacity-capped grouped insert (main_map.cpp:592-623)
  bucket_histogram      B16 occupancy histogram (main_map.cpp:1170-1197)
  candidate_pairs       S6  bucket probe as self-join
  pair_jaccard          S9  exact verification re-score
  confirmed_pairs       S11 c-threshold classification
  unique_docs           S13 anti-join output (ucseq_ analog)

Determinism-over-floats rule: every fractional quantity is emitted as
``floor(1e6 * x)`` (a *_micro BIGINT) so Spark and DuckDB hash identically —
float formatting never touches the comparison.

MinHash here uses md5-lexicographic minima (portable across engines); the
main engine uses the faster xxhash64/splitmix64 kernels — the algebra
(min over per-seed hashes, banding, cap, threshold) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHINGLE_K = 5
N_SEEDS = 8
ROWS_PER_BAND = 2
N_BANDS = N_SEEDS // ROWS_PER_BAND
BUCKET_CAP = 8
JACCARD_MICRO_THRESHOLD = 500_000  # 0.5
MINIMIZER_W = 4


def load_documents(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def doc_shingles(docs: DataFrame, k: int = SHINGLE_K, distinct: bool = True) -> DataFrame:
    """(doc_id, sh [, i]) — all width-k character windows of text."""
    base = (
        docs.filter(F.length("text") >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - (k - 1))).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("i"),
            F.expr(f"substring(text, i, {k})").alias("sh"),
        )
    )
    if distinct:
        return base.select("doc_id", "sh").distinct()
    return base


def shingle_stats(docs: DataFrame) -> DataFrame:
    """Per doc: total windows + distinct shingles (S5 window-count check)."""
    all_sh = doc_shingles(docs, distinct=False)
    return all_sh.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.countDistinct("sh").alias("n_distinct"),
    )


def minimizer_thin(docs: DataFrame) -> DataFrame:
    """B4 analog: per window of MINIMIZER_W consecutive shingles keep the
    lexicographic minimum; report distinct minimizers per doc."""
    sh = doc_shingles(docs, distinct=False)
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, MINIMIZER_W - 1)
    n = Window.partitionBy("doc_id")
    full = (
        sh.withColumn("minimizer", F.min("sh").over(w))
        .withColumn("n_win", F.max("i").over(n))
        .filter(F.col("i") <= F.col("n_win") - (MINIMIZER_W - 1))
    )
    return full.groupBy("doc_id").agg(
        F.countDistinct("minimizer").alias("n_minimizers"),
        F.min("minimizer").alias("first_minimizer"),
    )


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """B5/exact dedup: md5(text) grouping; emit members of non-trivial groups
    with their canonical (min doc_id) representative."""
    hashed = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
    w = Window.partitionBy("h")
    return (
        hashed.withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "canonical_id", F.col("group_size").cast("bigint").alias("group_size"))
    )


def _shingles_from_sets(sets: DataFrame) -> DataFrame:
    """(doc_id, sh) re-derived from collected shingle-set arrays — lets every
    stage downstream of a checkpointed doc_shingle_sets() reuse the one
    materialized shingle computation instead of re-running the substring
    explode (the round-2 bench regression: confirmed_pairs re-derived this
    subtree 3x per action)."""
    return sets.select("doc_id", F.explode("shs").alias("sh"))


def minhash_table(docs: DataFrame, sets: DataFrame | None = None) -> DataFrame:
    """(doc_id, r, minh): per-seed md5-lexicographic minima over the distinct
    shingle set — the portable MinHash.

    One groupBy(doc_id) with N_SEEDS min-aggregates instead of an 8x
    explode-then-shuffle (the same de-amplification as simhash16): the mins
    ride map-side partials of a single exchange, and the (doc_id, r, minh)
    long form is a stack() over N_SEEDS-wide rows — N_SEEDS x #docs rows,
    not N_SEEDS x #shingles.

    ``sets``: optional pre-computed (ideally checkpointed) doc_shingle_sets
    output to derive the shingles from instead of re-exploding the text."""
    sh = _shingles_from_sets(sets) if sets is not None else doc_shingles(docs)
    aggs = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(str(r)), F.col("sh")).cast("binary"))
        ).alias(f"m{r}")
        for r in range(N_SEEDS)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(f"{r}, m{r}" for r in range(N_SEEDS))
    return wide.select(
        "doc_id",
        F.expr(f"stack({N_SEEDS}, {stack_args}) AS (r, minh)"),
    ).select("doc_id", F.col("r").cast("int").alias("r"), "minh")


def minhash_bands(docs: DataFrame, sets: DataFrame | None = None) -> DataFrame:
    """(doc_id, band, band_key): fold ROWS_PER_BAND seed-minima per band."""
    mh = minhash_table(docs, sets=sets)
    banded = mh.withColumn("band", F.floor(F.col("r") / ROWS_PER_BAND).cast("int"))
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("r", "minh"))),
                    lambda x: x["minh"],
                ),
                "|",
            ).cast("binary")
        ).alias("band_key")
    )


def capped_buckets(docs: DataFrame, cap: int = BUCKET_CAP, sets: DataFrame | None = None) -> DataFrame:
    """B9: per-bucket rank by doc_id, keep <= cap (deterministic)."""
    bands = minhash_bands(docs, sets=sets)
    w = Window.partitionBy("band", "band_key").orderBy("doc_id")
    return (
        bands.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "band", "band_key", "rn")
    )


def bucket_histogram(docs: DataFrame) -> DataFrame:
    """B16: bucket-size occupancy histogram per band."""
    bands = minhash_bands(docs)
    sizes = bands.groupBy("band", "band_key").agg(F.count("*").alias("bucket_size"))
    return sizes.groupBy("band", "bucket_size").agg(F.count("*").alias("n_buckets"))


def candidate_pairs(docs: DataFrame, sets: DataFrame | None = None) -> DataFrame:
    """S6: bucket self-join -> canonical pairs + co-bucketed band count."""
    b = capped_buckets(docs, sets=sets)
    left = b.select(F.col("band"), F.col("band_key"), F.col("doc_id").alias("doc_a"))
    right = b.select(F.col("band"), F.col("band_key"), F.col("doc_id").alias("doc_b"))
    hits = left.join(right, ["band", "band_key"]).filter(F.col("doc_a") < F.col("doc_b"))
    return hits.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_bands"))


def doc_shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shs array<string>): each doc's distinct shingle set as ONE
    array row — the same payload shape the audio verify uses.  Exact-verify
    joins then move 5k array rows instead of shuffling the multi-million-row
    exploded shingle table per pair side."""
    return doc_shingles(docs).groupBy("doc_id").agg(F.collect_list("sh").alias("shs"))


def pair_jaccard(docs: DataFrame) -> DataFrame:
    """S9: exact Jaccard re-score of candidates -> jaccard_micro BIGINT.

    The shingle-set table is computed ONCE and localCheckpoint'ed — the
    MinHash/banding subtree inside candidate_pairs and both sides of the
    verify join all read the materialized blocks instead of re-running the
    substring explode (Catalyst does not reuse a subtree across differing
    projections; measured round-2 regression: 3x recompute inside one
    action).  Candidates are likewise checkpointed (referenced twice, and
    structurally bounded by the bucket cap)."""
    sets = doc_shingle_sets(docs).localCheckpoint(eager=False)
    cand = candidate_pairs(docs, sets=sets).localCheckpoint(eager=False)
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            F.floor(
                1_000_000.0 * n_inter / (F.size("sh_a") + F.size("sh_b") - n_inter)
            ).cast("bigint").alias("jaccard_micro"),
        )
    )


def confirmed_pairs(docs: DataFrame) -> DataFrame:
    """S11: threshold classification."""
    return pair_jaccard(docs).filter(F.col("jaccard_micro") >= JACCARD_MICRO_THRESHOLD)


def probe_matched(docs: DataFrame, threshold: int = JACCARD_MICRO_THRESHOLD) -> DataFrame:
    """CONSULT's actual flagship shape — query-vs-library probe
    (main_search.cpp:810-894) in its SQL-expressible text form: docs with
    doc_id % 5 == 0 are the query set, the rest are the library; query band
    rows probe the CAPPED library buckets (the query side is never capped —
    every query must be answered), survivors are exactly re-scored and
    classified by the Jaccard threshold.  Output = the matched_clips analog
    (query_id, lib_id, n_bands, jaccard_micro).

    Subtree reuse (the round-2 bench fix): shingle sets are computed once
    and checkpointed, the band table is computed ONCE over all docs (also
    checkpointed) and split into query/library sides by filter — the
    query-side minhash and the library-side minhash previously ran as two
    full independent passes over the corpus."""
    sets = doc_shingle_sets(docs).localCheckpoint(eager=False)
    bands = minhash_bands(docs, sets=sets).localCheckpoint(eager=False)
    qb = bands.filter(F.col("doc_id") % 5 == 0).withColumnsRenamed({"doc_id": "query_id"})
    lib_bands = bands.filter(F.col("doc_id") % 5 != 0)
    w = Window.partitionBy("band", "band_key").orderBy("doc_id")
    libcap = (
        lib_bands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BUCKET_CAP)
        .withColumnsRenamed({"doc_id": "lib_id"})
        .drop("rn")
    )
    hits = qb.join(libcap, ["band", "band_key"])
    cand = hits.groupBy("query_id", "lib_id").agg(F.count("*").alias("n_bands"))
    a = sets.select(F.col("doc_id").alias("query_id"), F.col("shs").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("lib_id"), F.col("shs").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(a, "query_id")
        .join(b, "lib_id")
        .withColumn(
            "jaccard_micro",
            F.floor(
                1_000_000.0 * n_inter / (F.size("sh_a") + F.size("sh_b") - n_inter)
            ).cast("bigint"),
        )
        .filter(F.col("jaccard_micro") >= threshold)
        .select("query_id", "lib_id", "n_bands", "jaccard_micro")
    )


def doc_clusters(docs: DataFrame) -> DataFrame:
    """Transitive near-duplicate clustering over the text channel: the
    engine's distributed connected components (cluster.py pointer jumping)
    on confirmed pairs, verified against a recursive-CTE transitive-closure
    oracle in DuckDB — the one stage of the core pipeline that previously
    had no SQL twin of its own.  cluster_id = min doc_id in the component;
    singletons label themselves."""
    from ..config import Config
    from .cluster import assign_clusters

    # zero-pad ids so the CC min-label (lexical on strings) agrees with the
    # numeric min the oracle computes
    def pad(c):
        return F.lpad(F.col(c).cast("string"), 20, "0")

    conf = confirmed_pairs(docs)
    clips_like = docs.select(pad("doc_id").alias("clip_id"))
    edges = conf.select(pad("doc_a").alias("clip_a"), pad("doc_b").alias("clip_b"))
    assigned = assign_clusters(clips_like, edges, Config())
    return assigned.select(
        F.col("clip_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
    )


def incremental_clusters(docs: DataFrame) -> DataFrame:
    """Same output as :func:`doc_clusters`, computed through the
    INCREMENTAL path: split docs deterministically into a 'history'
    (doc_id % 3 != 0) and a 'delta', assign clusters over history-only
    pairs, then fold the delta's pairs in with cluster.merge_clusters.
    The driver gate hash-checks this against the same recursive-CTE
    transitive-closure oracle as doc_clusters — pinning fold == rebuild
    through SQL, not just pytest (incremental.py module docstring for why
    equality holds: the delta edge set contains every pair touching a
    delta doc)."""
    from ..config import Config
    from .cluster import assign_clusters, merge_clusters

    def pad(c):
        return F.lpad(F.col(c).cast("string"), 20, "0")

    cfg = Config()
    # NOT persisted: the returned plan is lazy (the driver collects later),
    # so a persist here would be dropped before materialization; the shared
    # shingle/candidate subtrees are lazily checkpointed inside pair_jaccard
    # like in every other caller
    conf = confirmed_pairs(docs)
    edges = conf.select(pad("doc_a").alias("clip_a"), pad("doc_b").alias("clip_b"))
    old_ids = docs.filter(F.col("doc_id") % 3 != 0).select(pad("doc_id").alias("clip_id"))
    new_ids = docs.filter(F.col("doc_id") % 3 == 0).select(pad("doc_id").alias("clip_id"))
    old_edges = edges.join(
        old_ids.withColumnRenamed("clip_id", "clip_a"), "clip_a", "left_semi"
    ).join(old_ids.withColumnRenamed("clip_id", "clip_b"), "clip_b", "left_semi")
    delta_edges = edges.exceptAll(old_edges)  # every pair touching a delta doc
    base = assign_clusters(old_ids, old_edges, cfg)
    merged = merge_clusters(base, delta_edges, cfg, new_clips=new_ids)
    return merged.select(
        F.col("clip_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
    )


def unique_docs(docs: DataFrame) -> DataFrame:
    """S13: anti-join — docs with no confirmed dup partner."""
    conf = confirmed_pairs(docs)
    members = conf.select(F.col("doc_a").alias("doc_id")).union(
        conf.select(F.col("doc_b").alias("doc_id"))
    )
    return docs.select("doc_id").join(members.distinct(), "doc_id", "left_anti")
