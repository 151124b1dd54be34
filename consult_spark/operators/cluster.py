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

    * |E| <= cfg.cc_driver_max_edges: collect + union-find on the driver.
      Each distributed round costs 2 joins + a checkpoint barrier of fixed
      scheduler latency — a pure serial term that caps strong scaling
      (measured ~20 s of the 240k-clip pipeline regardless of cores).  A
      graph under the threshold is a few-MB collect and microseconds of
      union-find; the bound is a driver-memory bound, same design as
      ann.MAX_BROADCAST_VECTORS.
    * above it: the O(log n)-round min-label + pointer-jumping loop — the
      path that scales to edge sets no driver can hold.
    """
    sym = edges.select(
        F.col("clip_a").alias("src"), F.col("clip_b").alias("dst")
    ).union(edges.select(F.col("clip_b").alias("src"), F.col("clip_a").alias("dst")))
    sym = sym.distinct().localCheckpoint(eager=True)

    n_edges = sym.count()
    if n_edges <= cfg.cc_driver_max_edges:
        spark = edges.sparkSession
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in sym.collect():
            a, b = row[0], row[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN label keeps cluster_id = component minimum
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        rows = [(x, find(x)) for x in parent]
        return spark.createDataFrame(rows, "clip_id string, cluster_id string")

    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("clip_id"),
            F.least("src", "nbr_min").alias("label"),
        )
        .localCheckpoint(eager=True)
    )

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
        labels = checkpointed.drop("old_label")
        if changed == 0:
            break
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


def unique_clips(clips: DataFrame, confirmed: DataFrame) -> DataFrame:
    """The anti-join output — clips with no confirmed dup partner (the
    ucseq_ unclassified-reads analog, main_search.cpp:1021-1041, README.md:82)."""
    members = confirmed.select(F.col("clip_a").alias("clip_id")).union(
        confirmed.select(F.col("clip_b").alias("clip_id"))
    )
    return clips.join(members.distinct(), "clip_id", "left_anti")
