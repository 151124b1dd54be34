"""Connected components over confirmed pairs -> cluster assignments.

CONSULT stops at per-read classification (matched / unmatched,
main_search.cpp:883-894); the graft extends it to transitive clustering per
the north rule.  Algorithm: alternating large-star / small-star min-label
propagation (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) expressed as DataFrame joins:

  large-star: every node sends its smallest known label to all its
              strictly-larger neighbors;
  small-star: every node adopts the smallest label among its <=-neighbors.

Implemented as min-label propagation with pointer jumping: each round first
takes ``label(x) = min(label(x), min over neighbors' labels)`` (the
propagation step), then compresses paths with ``label(x) = label(label(x))``
(the jumping step — the Spark-join form of union-find path halving).  The
jump is what turns O(diameter) rounds into O(log n): a 1M-node path
converges in ~20 rounds instead of 1M.  Ties are deterministic (labels are
clip_ids, min = lexical).  ``localCheckpoint`` truncates lineage every round
so the plan doesn't grow exponentially (the iterative-DataFrame trap flagged
in SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import Config


def connected_components(edges: DataFrame, cfg: Config) -> DataFrame:
    """edges (clip_a, clip_b) -> (clip_id, cluster_id).

    Only nodes that appear in edges are returned; callers union in
    singletons (see assign_clusters). cluster_id = smallest clip_id in the
    component — deterministic, no label renumbering needed to compare runs.

    Two physical strategies behind one contract (both produce the identical
    min-label result; test_cluster runs the suite against both):

    * 2|pairs| <= cfg.cc_driver_max_edges: Arrow-collect (toPandas) of the
      RAW canonical pairs + vectorized min-label propagation on the driver
      (the in-memory update walks each edge in both directions, so no
      symmetrize/distinct shuffle is ever paid on this path).  Each
      distributed round costs 2 joins + a checkpoint barrier of fixed
      scheduler latency — a pure serial term that caps strong scaling
      (measured ~20 s of the 240k-clip pipeline regardless of cores).  A
      graph under the threshold is a tens-of-MB Arrow batch and sub-second
      numpy work (factorize ids, then the SAME min-label + pointer-jump
      iteration as the distributed path, over in-memory arrays); the bound
      is a driver-memory bound, same design as ann.MAX_BROADCAST_VECTORS.
    * above it: the O(log n)-round min-label + pointer-jumping loop — the
      path that scales to edge sets no driver can hold.
    """
    # the driver path needs neither the symmetrized table nor its distinct
    # shuffle: the in-memory min-label update already propagates across each
    # edge in BOTH directions, so it collects the raw canonical pairs —
    # half the rows, zero extra shuffles.  Only the distributed loop (joins
    # are directional) builds `sym`.  The routing count + the collect (or
    # the distributed loop) both consume `edges`, so materialize the
    # upstream lineage ONCE here — for a lazily-derived edge set (the
    # confirmed-pairs pipeline) the count would otherwise execute the most
    # expensive subtree and toPandas() would execute it again.
    # NOTE localCheckpoint trades fault-tolerance for speed: the truncated
    # lineage is unrecoverable if an executor holding blocks dies, so on a
    # real cluster with dynamic allocation prefer
    # spark.sparkContext.setCheckpointDir + .checkpoint() (reliable) — the
    # single-JVM sandbox cannot lose an executor, so the fast form is used
    # here.  Every checkpoint this function creates is unpersisted before
    # return except the final labels table (small, and the returned
    # DataFrame's only storage — its lineage is truncated by design).
    edges = edges.select("clip_a", "clip_b").localCheckpoint(eager=True)
    n_pairs = edges.count()
    if 2 * n_pairs <= cfg.cc_driver_max_edges:
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import StructField, StructType

        spark = edges.sparkSession
        pdf = (
            edges.select(F.col("clip_a").alias("src"), F.col("clip_b").alias("dst"))
            .toPandas()  # Arrow batches, not per-Row deserialization
        )
        edges.unpersist()  # checkpoint blocks no longer needed once collected
        # factorize(sort=True): code order == value order, so min over codes
        # == min over ids (lexical for strings, numeric for ints) — the same
        # tie-break as the distributed F.least path.
        codes, uniques = pd.factorize(
            pd.concat([pdf["src"], pdf["dst"]], ignore_index=True), sort=True
        )
        m = len(pdf)
        a, b = codes[:m], codes[m:]
        label = np.arange(len(uniques), dtype=np.int64)
        while True:
            prev = label.copy()
            # propagate the smaller label across each edge, then pointer-jump
            np.minimum.at(label, a, prev[b])
            np.minimum.at(label, b, prev[a])
            label = label[label]
            if np.array_equal(label, prev):
                break
        id_type = edges.schema["clip_a"].dataType
        out = pd.DataFrame({"clip_id": uniques, "cluster_id": np.asarray(uniques)[label]})
        schema = StructType(
            [StructField("clip_id", id_type), StructField("cluster_id", id_type)]
        )
        return spark.createDataFrame(out, schema=schema)

    sym = edges.select(
        F.col("clip_a").alias("src"), F.col("clip_b").alias("dst")
    ).union(edges.select(F.col("clip_b").alias("src"), F.col("clip_a").alias("dst")))
    sym = sym.distinct().localCheckpoint(eager=True)
    edges.unpersist()  # sym's checkpoint now holds the data; drop the input blocks

    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("clip_id"),
            F.least("src", "nbr_min").alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    prev_ckpt = labels  # the most recent materialized checkpoint

    for _ in range(cfg.cc_max_iters):
        # 1) propagate: candidate label for dst = min label among its neighbors
        prop = (
            sym.join(labels.withColumnsRenamed({"clip_id": "src"}), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnsRenamed({"dst": "clip_id"})
        )
        # carry the pre-round label through the checkpoint so convergence is
        # a FILTER over already-materialized blocks, not a third join+shuffle
        # per round (labels only ever decrease, so old != new detects every
        # change exactly)
        stepped = labels.join(prop, "clip_id", "left").select(
            "clip_id",
            F.col("label").alias("old_label"),
            F.least("label", F.coalesce("nbr_label", F.col("label"))).alias("label"),
        )
        # 2) pointer jump: label <- label(label)  (path halving)
        lmap = stepped.select(
            F.col("clip_id").alias("label"), F.col("label").alias("label2")
        )
        checkpointed = (
            stepped.join(lmap, "label", "left")
            .select(
                "clip_id",
                "old_label",
                F.least("label", F.coalesce("label2", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = checkpointed.filter(F.col("label") != F.col("old_label")).limit(1).count()
        prev_ckpt.unpersist()  # previous round's checkpoint superseded (eager above)
        prev_ckpt = checkpointed
        labels = checkpointed.drop("old_label")
        if changed == 0:
            break
    sym.unpersist()
    return labels.withColumnsRenamed({"label": "cluster_id"})


def assign_clusters(clips: DataFrame, confirmed: DataFrame, cfg: Config) -> DataFrame:
    """All clips -> (clip_id, cluster_id); singletons label themselves."""
    comp = connected_components(
        confirmed.select("clip_a", "clip_b"), cfg
    )
    singles = (
        clips.select("clip_id")
        .join(comp, "clip_id", "left_anti")
        .withColumn("cluster_id", F.col("clip_id"))
    )
    return comp.unionByName(singles)


def merge_clusters(
    assignments: DataFrame,
    new_pairs: DataFrame,
    cfg: Config,
    new_clips: DataFrame | None = None,
) -> DataFrame:
    """Incremental cluster maintenance: fold newly confirmed pairs into an
    existing assignment at O(increment) cost instead of re-running CC over
    the full corpus.

    ``assignments`` is a prior (clip_id, cluster_id) table holding the
    assign_clusters invariant (cluster_id = smallest clip_id in the
    component).  ``new_pairs`` (clip_a, clip_b) are the newly confirmed
    edges — e.g. a streaming probe's matched_clips, or a delta batch's
    confirmed pairs; endpoints may be existing clips, or new ones.
    ``new_clips`` optionally supplies the delta's clip ids so clips that
    matched nothing still appear (as singletons).

    Equivalence: the output equals assign_clusters over (all clips, all
    pairs) PROVIDED ``new_pairs`` contains every confirmed pair that
    touches a new clip (old-old pairs are already folded into
    ``assignments``).  Proof shape: contracting each existing cluster to
    its label preserves connectivity, and min-label over the contracted
    graph = min clip_id over the merged component because each label IS
    its cluster's min member (tests/test_cluster.py pins recompute
    equality).

    Scale shape: the existing assignment is only ever scanned — both joins
    put the small side (the delta's pairs / the contracted component
    relabel map) opposite it, so Catalyst broadcasts the delta and the
    10^12-row table never shuffles.  The contracted CC input is <=
    |new_pairs| edges, which routes to the driver path for any sane
    increment (cc_driver_max_edges) and to the distributed loop past it.
    """
    # labels for every id the delta can mention: existing assignment, plus
    # self-labels for genuinely-new ids (pair endpoints and new_clips rows
    # not present in the assignment).  "Not present" is computed WITHOUT an
    # anti-join against the big table (whose build side would be the
    # 10^12-row assignment — unbroadcastable, so Catalyst would shuffle
    # it): instead pull the PRESENT delta ids out with a broadcast
    # semi-join (scan-only on the assignment), then anti-join two
    # delta-sized frames.
    delta_ids = (
        new_pairs.select(F.col("clip_a").alias("clip_id"))
        .union(new_pairs.select(F.col("clip_b").alias("clip_id")))
    )
    if new_clips is not None:
        delta_ids = delta_ids.union(new_clips.select("clip_id"))
    delta_ids = delta_ids.distinct()
    present = assignments.join(F.broadcast(delta_ids), "clip_id", "left_semi").select(
        "clip_id"
    )
    fresh = delta_ids.join(present, "clip_id", "left_anti").withColumn(
        "cluster_id", F.col("clip_id")
    )
    labels = assignments.unionByName(fresh)

    # contract: each new edge becomes an edge between its endpoints' CURRENT
    # labels; intra-cluster edges vanish.  new_pairs is hinted broadcast so
    # the label lookups stream the big side (labels restricted to delta
    # endpoints via the join itself).
    la = labels.select(F.col("clip_id").alias("clip_a"), F.col("cluster_id").alias("la"))
    lb = labels.select(F.col("clip_id").alias("clip_b"), F.col("cluster_id").alias("lb"))
    # hint BOTH lookups (the hint does not survive through the first join's
    # output, and its post-join size is unknown to the static planner)
    edges_a = F.broadcast(new_pairs.select("clip_a", "clip_b")).join(la, "clip_a")
    contracted = (
        F.broadcast(edges_a)
        .join(lb, "clip_b")
        .filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("clip_a"), F.col("lb").alias("clip_b"))
        .distinct()
    )
    comp = connected_components(contracted, cfg).select(
        F.col("clip_id").alias("cluster_id"),
        F.col("cluster_id").alias("merged_id"),
    )
    # relabel: only rows whose old cluster merged change; comp is tiny
    # (<= 2|new_pairs| rows) so this is a broadcast join against the scan
    return labels.join(F.broadcast(comp), "cluster_id", "left").select(
        "clip_id",
        F.coalesce("merged_id", F.col("cluster_id")).alias("cluster_id"),
    )


def unique_clips(clips: DataFrame, confirmed: DataFrame) -> DataFrame:
    """The anti-join output — IDS of clips with no confirmed dup partner
    (the ucseq_ unclassified-reads analog, main_search.cpp:1021-1041,
    README.md:82).

    Ids only, by design: materializing full rows would copy ~half the
    corpus byte payload into a second table (a ~50 TB duplicate at the
    10^12-clip tier) and turn every downstream rewrite — notably the delta
    fold's O(delta) maintenance of this table — into corpus-sized IO.
    CONSULT writes the actual unclassified sequences because its output IS
    a FASTA file; here the clips live in an addressable table, so the ids
    join back to the payload when a consumer needs it."""
    members = confirmed.select(F.col("clip_a").alias("clip_id")).union(
        confirmed.select(F.col("clip_b").alias("clip_id"))
    )
    return clips.select("clip_id").join(members.distinct(), "clip_id", "left_anti")
