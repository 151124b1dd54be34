"""Candidate-pair verification: SimHash prefilter -> exact Jaccard ->
suffix-array substring check -> threshold classification.

CONSULT verifies every LSH candidate with an exact Hamming check
(hd(b, candidate) <= p, main_search.cpp:867, 1238-1259) before it counts
toward the read's match threshold (matched >= c, main_search.cpp:883-894).
Our verification ladder, cheapest first:

1. SimHash Hamming prefilter — JVM-side ``bit_count(simhash_a ^ simhash_b)``
   on 8-byte fingerprints (the direct hd() analog; Spark >=3.3 bit_count,
   whole-stage codegen).  Only survivors pay for the fat shingle join.
2. Exact Jaccard re-score on the full shingle sets (Arrow-batched numpy).
3. Suffix-array longest-common-substring containment on transcripts.

Decision: pcm channel drives (audio near-dup); transcript similarity +
containment is an independent confirmation path.  All scores are kept in the
output so thresholds can be re-applied without recomputation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import Config
from ..functions.suffixarray import substring_contained

CONFIRMED_SCHEMA = (
    "clip_a string, clip_b string, "
    "pcm_jaccard double, txt_jaccard double, "
    "pcm_hamming int, txt_hamming int, "
    "n_bands_pcm int, n_bands_txt int, "
    "lcs int, substr boolean, is_dup boolean"
)

# size-routed broadcast bound for the fat (clip_id, shingles) projection:
# below it, the whole channel's shingle table broadcasts — the distributed
# stand-in for CONSULT's RAM-resident index (main_search.cpp:523-658), and
# the survivors stream through it without shuffling either side.  Above it
# (the 10^12 path) Catalyst plans a shuffled join; same ceiling stance as
# ann.MAX_BROADCAST_VECTORS.  ~100k clips x ~1k int64 shingles ~= 800 MB
# worst-case on this corpus shape; the bench tier (20k clips) is well under.
MAX_BROADCAST_FAT_ROWS = 100_000


def _channel_features(features: DataFrame, kind: str) -> DataFrame:
    return features.filter(F.col("kind") == kind).select(
        "clip_id", "shingles", "simhash", "n_shingles"
    )


def _prefiltered_survivors(pairs: DataFrame, features: DataFrame, kind: str,
                           cfg: Config) -> tuple[DataFrame, DataFrame]:
    """Shared prefilter ladder for one channel -> (survivors, feats) where
    survivors = (clip_a, clip_b, hamming) rows that may still verify and
    feats is the channel's feature projection.

    Two cheap prunes run on the narrow (clip_id, simhash, n_shingles)
    projection BEFORE the shingle arrays are joined in, so pairs that cannot
    possibly verify never move the fat payload across the shuffle:

      1. SimHash Hamming <= cfg.simhash_prefilter_max (the hd() analog);
      2. containment bound: jaccard <= min_n/max_n, so if the size ratio is
         already below the pair's applicable threshold the exact jaccard
         cannot clear it — size-mismatched pairs die for 16 bytes of IO.

    One implementation serves channel_scores AND txt_scores_with_lcs so the
    fused path cannot drift from the per-channel one."""
    feats = _channel_features(features, kind)
    narrow = feats.select("clip_id", "simhash", "n_shingles")
    if kind == "pcm":
        thr = F.when(
            F.least("n_a", "n_b") < cfg.low_info_floor, F.lit(cfg.low_info_jaccard)
        ).otherwise(F.lit(cfg.jaccard_threshold))
    else:
        thr = F.lit(cfg.txt_jaccard_threshold)

    def _narrow_join(p: DataFrame) -> DataFrame:
        return (
            p.select("clip_a", "clip_b")
            .join(
                narrow.withColumnsRenamed(
                    {"clip_id": "clip_a", "simhash": "simhash_a", "n_shingles": "n_a"}
                ),
                "clip_a",
            )
            .join(
                narrow.withColumnsRenamed(
                    {"clip_id": "clip_b", "simhash": "simhash_b", "n_shingles": "n_b"}
                ),
                "clip_b",
            )
        )

    carried = {f"sim_{kind}_a", f"sim_{kind}_b", f"n_{kind}_a", f"n_{kind}_b"}
    primary = bool(cfg.channels) and cfg.channels[0] == kind
    if primary and carried <= set(pairs.columns):
        # fast path: the candidate rows already carry both members'
        # fingerprints for this channel (denormalized through banding —
        # bands.py module docstring), so the prefilter needs NO join.  Only
        # pairs that never co-occurred in this channel's buckets (sims null
        # — e.g. a txt-qualified pair being scored on pcm) fall back to the
        # feature-table join.  Gated to the PRIMARY channel (cfg.channels
        # [0]) because coverage follows candidate generation: the channel
        # that produced the band hits carries sims on ~every pair, while a
        # secondary channel is mostly null (measured at 480k: the txt
        # channel of the audio pipeline is ~90% null because pcm collisions
        # dominate candidates) — there the "fallback" IS the full join and
        # the have/miss split + union just adds two extra passes over the
        # candidate cache (+22s at 480k/16c, A/B-measured).
        base = pairs.select(
            "clip_a", "clip_b",
            F.col(f"sim_{kind}_a").alias("simhash_a"),
            F.col(f"sim_{kind}_b").alias("simhash_b"),
            F.col(f"n_{kind}_a").alias("n_a"),
            F.col(f"n_{kind}_b").alias("n_b"),
        )
        have = base.filter(F.col("simhash_a").isNotNull())
        miss = base.filter(F.col("simhash_a").isNull()).select("clip_a", "clip_b")
        with_sim = have.unionByName(_narrow_join(miss).select(*have.columns))
    else:
        with_sim = _narrow_join(pairs)
    with_sim = with_sim.withColumn(
        "hamming", F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    )
    survivors = with_sim.filter(
        (F.col("hamming") <= cfg.simhash_prefilter_max)
        & (F.least("n_a", "n_b") >= thr * F.greatest("n_a", "n_b"))
    ).select("clip_a", "clip_b", "hamming")
    return survivors, feats


def _broadcast_if_bounded(df: DataFrame) -> DataFrame:
    """Size-routed broadcast hint (one cheap bounded count).  Catalyst's own
    size estimate broadcasts the NARROW survivors side and streams the fat
    cache — correct by size, but it puts the python scoring behind the fat
    table's partitioning and scans the shingle arrays through the join
    probe.  When the side's row count is bounded, broadcasting it instead
    is strictly better (the survivors stream in their existing
    distribution, one broadcast build serves both aliased join sides) —
    measured ~1 s off the sf0.1 verify stage.  Above the bound the hint is
    omitted so the 10^12 path keeps the shuffled join."""
    if df.select("clip_id").limit(MAX_BROADCAST_FAT_ROWS + 1).count() <= MAX_BROADCAST_FAT_ROWS:
        return F.broadcast(df)
    return df


def _batch_jaccard(pdf: pd.DataFrame):
    """Vectorized exact Jaccard over one Arrow batch of (sh_a, sh_b) pairs
    -> (jac float64[n], lens_a, lens_b).  ONE lexsort pass instead of a
    python loop with a sort per pair: tag every shingle with its pair
    index, lexsort (value within pair), and count adjacent equal values —
    each side's set is unique, so an intersection element appears exactly
    twice and lands adjacent.  Measured 6.6 s -> ~4 s on the sf0.1 verify
    stage when this replaced the per-pair loop."""
    n = len(pdf)
    sa_list = [np.asarray(x, dtype=np.int64) for x in pdf["sh_a"]]
    sb_list = [np.asarray(x, dtype=np.int64) for x in pdf["sh_b"]]
    lens_a = np.fromiter((a.size for a in sa_list), np.int64, count=n)
    lens_b = np.fromiter((b.size for b in sb_list), np.int64, count=n)
    allv = np.concatenate(sa_list + sb_list) if (lens_a.sum() + lens_b.sum()) else np.empty(0, np.int64)
    allp = np.concatenate(
        [np.repeat(np.arange(n), lens_a), np.repeat(np.arange(n), lens_b)]
    )
    if allv.size:
        order = np.lexsort((allv, allp))
        v, p = allv[order], allp[order]
        eq = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(p[:-1][eq], minlength=n)
    else:
        inter = np.zeros(n, dtype=np.int64)
    union = lens_a + lens_b - inter
    jac = np.divide(
        inter, union, out=np.zeros(n, dtype=np.float64), where=union > 0
    )
    return jac, lens_a, lens_b


def channel_scores(pairs: DataFrame, features: DataFrame, kind: str, cfg: Config) -> DataFrame:
    """pairs x features -> (clip_a, clip_b, jaccard, hamming, min_n) via the
    shared prefilter ladder (_prefiltered_survivors) + the size-routed fat
    shingle join + the vectorized Jaccard kernel (_batch_jaccard)."""
    survivors, feats = _prefiltered_survivors(pairs, features, kind, cfg)
    fat = _broadcast_if_bounded(feats.select("clip_id", "shingles"))
    joined = (
        survivors
        .join(fat.withColumnsRenamed({"clip_id": "clip_a", "shingles": "sh_a"}), "clip_a")
        .join(fat.withColumnsRenamed({"clip_id": "clip_b", "shingles": "sh_b"}), "clip_b")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            jac, lens_a, lens_b = _batch_jaccard(pdf)
            yield pd.DataFrame(
                {
                    "clip_a": pdf["clip_a"],
                    "clip_b": pdf["clip_b"],
                    "jaccard": jac,
                    "hamming": pdf["hamming"].astype("int32"),
                    "min_n": np.minimum(lens_a, lens_b).astype(np.int32),
                }
            )

    return joined.mapInPandas(
        score,
        schema="clip_a string, clip_b string, jaccard double, hamming int, min_n int",
    )


def transcript_scores(pairs: DataFrame, clips: DataFrame, cfg: Config) -> DataFrame:
    """Suffix-array LCS containment per pair -> (clip_a, clip_b, lcs, substr).

    Standalone form of the LCS stage (score any pair set you hand it);
    confirm_pairs itself uses the fused txt_scores_with_lcs below, which
    embeds the same ladder behind the txt-jaccard gate."""
    tr = clips.select("clip_id", "transcript")
    joined = (
        pairs.select("clip_a", "clip_b")
        .join(tr.withColumnsRenamed({"clip_id": "clip_a", "transcript": "tr_a"}), "clip_a")
        .join(tr.withColumnsRenamed({"clip_id": "clip_b", "transcript": "tr_b"}), "clip_b")
    )
    min_frac = cfg.substr_min_frac

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            lcs = np.empty(len(pdf), dtype=np.int64)
            ok = np.empty(len(pdf), dtype=bool)
            for i, (a, b) in enumerate(zip(pdf["tr_a"], pdf["tr_b"])):
                a, b = a or "", b or ""
                m = min(len(a), len(b))
                if m == 0:
                    ok[i], lcs[i] = False, 0
                elif a in b or b in a:
                    # full containment: LCS == the shorter text, and the
                    # min_frac test is trivially met — C-level find, skips
                    # the O(n log^2 n) suffix array for the dominant case
                    # (near-dup transcripts are mostly equal or contained;
                    # measured ~90% of LCS-gated pairs at sf0.1)
                    ok[i], lcs[i] = True, m
                else:
                    ok[i], lcs[i] = substring_contained(a, b, min_frac)
            yield pd.DataFrame(
                {"clip_a": pdf["clip_a"], "clip_b": pdf["clip_b"], "lcs": lcs, "substr": ok}
            )

    return joined.mapInPandas(
        score, schema="clip_a string, clip_b string, lcs bigint, substr boolean"
    )


def txt_scores_with_lcs(pairs: DataFrame, features: DataFrame, clips: DataFrame,
                        cfg: Config) -> DataFrame:
    """Fused txt-channel verification: exact Jaccard AND the suffix-array
    LCS containment in ONE subtree and one python pass ->
    (clip_a, clip_b, jaccard, hamming, lcs, substr, has_lcs).

    confirm_pairs previously evaluated the whole txt channel_scores subtree
    TWICE inside one action — once joined into the output, once filtered to
    gate transcript_scores (Catalyst has no cross-join subtree reuse, and a
    localCheckpoint barrier A/B-measured slower than the recompute).
    Fusing moves the jaccard >= threshold LCS gate INSIDE the batch scorer:
    identical semantics (only txt-qualified pairs pay the O(n) suffix
    array; the rest emit lcs=0/substr=false exactly as the old left-join
    coalesce produced), one txt prefilter+join tree instead of two, one
    final join instead of two.  Measured: confirm_pairs 4.5–6.4 s ->
    2.8–3.6 s at sf0.1/32c, output byte-identical.

    Uses the SAME _prefiltered_survivors ladder as channel_scores (the
    primary-channel join-free fast path included — a txt-primary config,
    the text flagship, carries both fingerprints on the candidate rows).
    Transcripts attach with LEFT joins: a clip with txt features but no
    transcripts row (e.g. an index whose transcripts table is absent or
    params-mismatched) keeps its real jaccard/hamming and falls back to
    lcs=0/substr=false — exactly what the old split flow produced for
    missing-transcript pairs."""
    survivors, feats = _prefiltered_survivors(pairs, features, "txt", cfg)
    fat = _broadcast_if_bounded(feats.select("clip_id", "shingles"))
    tr = _broadcast_if_bounded(clips.select("clip_id", "transcript"))
    joined = (
        survivors
        .join(fat.withColumnsRenamed({"clip_id": "clip_a", "shingles": "sh_a"}), "clip_a")
        .join(fat.withColumnsRenamed({"clip_id": "clip_b", "shingles": "sh_b"}), "clip_b")
        .join(tr.withColumnsRenamed({"clip_id": "clip_a", "transcript": "tr_a"}), "clip_a", "left")
        .join(tr.withColumnsRenamed({"clip_id": "clip_b", "transcript": "tr_b"}), "clip_b", "left")
    )
    jthr = cfg.txt_jaccard_threshold
    min_frac = cfg.substr_min_frac

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the shared jaccard kernel, plus the per-qualifying-pair LCS ladder
        # of transcript_scores.score — one pass, one boundary crossing
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            jac, _lens_a, _lens_b = _batch_jaccard(pdf)
            lcs = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            has = np.zeros(n, dtype=bool)
            for i in np.flatnonzero(jac >= jthr):
                # left-joined transcripts arrive as None/NaN when absent
                a, b = pdf["tr_a"].iat[i], pdf["tr_b"].iat[i]
                a = a if isinstance(a, str) else ""
                b = b if isinstance(b, str) else ""
                has[i] = True
                m = min(len(a), len(b))
                if m == 0:
                    ok[i], lcs[i] = False, 0
                elif a in b or b in a:
                    ok[i], lcs[i] = True, m
                else:
                    ok[i], lcs[i] = substring_contained(a, b, min_frac)
            yield pd.DataFrame(
                {
                    "clip_a": pdf["clip_a"],
                    "clip_b": pdf["clip_b"],
                    "jaccard": jac,
                    "hamming": pdf["hamming"].astype("int32"),
                    "lcs": lcs,
                    "substr": ok,
                    "has_lcs": has,
                }
            )

    return joined.mapInPandas(
        score,
        schema=(
            "clip_a string, clip_b string, jaccard double, hamming int, "
            "lcs bigint, substr boolean, has_lcs boolean"
        ),
    )


def confirm_pairs(candidates: DataFrame, features: DataFrame, clips: DataFrame, cfg: Config) -> DataFrame:
    """Full verification -> CONFIRMED_SCHEMA rows (only pairs passing at
    least one channel's confirmation, i.e. is_dup = true)."""
    pcm = channel_scores(candidates, features, "pcm", cfg).withColumnsRenamed(
        {"jaccard": "pcm_jaccard", "hamming": "pcm_hamming", "min_n": "pcm_min_n"}
    )
    # txt jaccard + the (gated) suffix-array containment arrive fused from
    # one subtree — see txt_scores_with_lcs for why (the split form
    # evaluated the txt channel twice per action)
    txt = txt_scores_with_lcs(candidates, features, clips, cfg).withColumnsRenamed(
        {"jaccard": "txt_jaccard", "hamming": "txt_hamming"}
    )
    out = (
        candidates.join(pcm, ["clip_a", "clip_b"], "left")
        .join(txt, ["clip_a", "clip_b"], "left")
        .withColumn("pcm_jaccard", F.coalesce("pcm_jaccard", F.lit(0.0)))
        .withColumn("txt_jaccard", F.coalesce("txt_jaccard", F.lit(0.0)))
        .withColumn("pcm_hamming", F.coalesce("pcm_hamming", F.lit(64)).cast("int"))
        .withColumn("txt_hamming", F.coalesce("txt_hamming", F.lit(64)).cast("int"))
        .withColumn(
            "lcs",
            F.coalesce(F.when(F.col("has_lcs"), F.col("lcs")), F.lit(0)).cast("int"),
        )
        .withColumn(
            "substr",
            F.coalesce(F.when(F.col("has_lcs"), F.col("substr")), F.lit(False)),
        )
        .withColumn("pcm_min_n", F.coalesce("pcm_min_n", F.lit(0)))
        .withColumn(
            # low-complexity masking: flat clips (tiny shingle sets) must
            # clear the stricter threshold — see Config.low_info_floor
            "pcm_threshold",
            F.when(F.col("pcm_min_n") < cfg.low_info_floor, F.lit(cfg.low_info_jaccard))
            .otherwise(F.lit(cfg.jaccard_threshold)),
        )
        .withColumn(
            "is_dup",
            (F.col("pcm_jaccard") >= F.col("pcm_threshold"))
            | ((F.col("txt_jaccard") >= cfg.txt_jaccard_threshold) & F.col("substr")),
        )
        .select(
            "clip_a", "clip_b", "pcm_jaccard", "txt_jaccard",
            "pcm_hamming", "txt_hamming",
            F.col("n_bands_pcm").cast("int").alias("n_bands_pcm"),
            F.col("n_bands_txt").cast("int").alias("n_bands_txt"),
            "lcs", "substr", "is_dup",
        )
    )
    return out.filter(F.col("is_dup"))
