"""Connected-components clustering on planted topologies + oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consult_spark.config import Config
from consult_spark.operators.cluster import assign_clusters, connected_components, unique_clips


@pytest.fixture(
    scope="module",
    params=["driver_union_find", "distributed_pointer_jumping"],
)
def cc_cfg(request):
    """Every topology runs against BOTH physical CC strategies — the
    driver union-find fast path and the distributed min-label loop
    (cc_driver_max_edges=0 forces the latter)."""
    if request.param == "driver_union_find":
        return Config(cc_max_iters=30)
    return Config(cc_max_iters=30, cc_driver_max_edges=0)


def _components(spark, edges, cc_cfg):
    df = spark.createDataFrame(edges, "clip_a string, clip_b string")
    return {
        r["clip_id"]: r["cluster_id"] for r in connected_components(df, cc_cfg).collect()
    }


def test_cc_path_graph(spark, cc_cfg):
    """A long path is the worst case for min-label propagation."""
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(40)]
    got = _components(spark, edges, cc_cfg)
    assert set(got.values()) == {"n000"}
    assert len(got) == 41


def test_cc_star_and_cliques(spark, cc_cfg):
    edges = [("hub", f"leaf{i}") for i in range(10)]
    edges += [(f"c{i}", f"c{j}") for i in range(4) for j in range(i + 1, 4)]
    got = _components(spark, edges, cc_cfg)
    assert got["hub"] == got["leaf3"] == "hub"
    assert got["c3"] == "c0"


def test_cc_two_components_stay_apart(spark, cc_cfg):
    edges = [("a1", "a2"), ("a2", "a3"), ("b1", "b2")]
    got = _components(spark, edges, cc_cfg)
    assert got["a3"] == "a1" and got["b2"] == "b1"
    assert got["a1"] != got["b1"]


def test_assign_clusters_includes_singletons(spark, cc_cfg):
    clips = spark.createDataFrame([("x",), ("y",), ("z",)], "clip_id string")
    conf = spark.createDataFrame([("x", "y")], "clip_a string, clip_b string")
    got = {r["clip_id"]: r["cluster_id"] for r in assign_clusters(clips, conf, cc_cfg).collect()}
    assert got == {"x": "x", "y": "x", "z": "z"}


def test_unique_clips_anti_join(spark):
    clips = spark.createDataFrame([("x",), ("y",), ("z",)], "clip_id string")
    conf = spark.createDataFrame([("x", "y")], "clip_a string, clip_b string")
    got = {r["clip_id"] for r in unique_clips(clips, conf).collect()}
    assert got == {"z"}


def test_driver_cc_empty_edges_and_typed_ids(spark, cfg):
    """Driver-path CC edge cases: an empty edge set yields self-labeled
    singletons, and non-string ids keep their type in the output schema
    (round-2 ADVICE: the old path hardcoded strings)."""
    from consult_spark.operators.cluster import assign_clusters, connected_components

    clips = spark.createDataFrame([("a",), ("b",)], "clip_id string")
    empty = spark.createDataFrame([], "clip_a string, clip_b string")
    got = sorted(tuple(r) for r in assign_clusters(clips, empty, cfg).collect())
    assert got == [("a", "a"), ("b", "b")]

    ints = spark.createDataFrame([(1, 2), (2, 3)], "clip_a bigint, clip_b bigint")
    cc = connected_components(ints, cfg)
    assert cc.schema.simpleString() == "struct<clip_id:bigint,cluster_id:bigint>"
    assert sorted(tuple(r) for r in cc.collect()) == [(1, 1), (2, 1), (3, 1)]


def test_merge_clusters_equals_recompute(spark, corpus_xs, cc_cfg):
    """Incremental maintenance pins recompute equality on the real corpus:
    split clips into an 'old' batch and a 'new' delta, fold the delta's
    pairs into the old assignment, and the result must equal
    assign_clusters over everything (same min-clip_id labels, byte for
    byte)."""
    from consult_spark.operators.cluster import merge_clusters

    clips = spark.createDataFrame(corpus_xs["clips"][["clip_id"]])
    pairs = spark.createDataFrame(corpus_xs["truth_pairs"][["clip_a", "clip_b"]])
    # deterministic split: a clip is 'new' when its id hashes odd
    new_ids = clips.filter(F.abs(F.hash("clip_id")) % 3 == 0)
    old_ids = clips.join(new_ids, "clip_id", "left_anti")
    # old pairs = both endpoints old; delta pairs = every pair touching new
    old_pairs = (
        pairs.join(old_ids.withColumnRenamed("clip_id", "clip_a"), "clip_a", "left_semi")
        .join(old_ids.withColumnRenamed("clip_id", "clip_b"), "clip_b", "left_semi")
    )
    delta_pairs = pairs.exceptAll(old_pairs)

    base = assign_clusters(old_ids, old_pairs, cc_cfg)
    merged = merge_clusters(base, delta_pairs, cc_cfg, new_clips=new_ids)
    full = assign_clusters(clips, pairs, cc_cfg)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_merge_clusters_bridges_existing_clusters(spark, cc_cfg):
    """A single new edge between two existing clusters relabels BOTH to the
    merged min, and chains of new edges merge transitively through the
    contracted graph."""
    from consult_spark.operators.cluster import merge_clusters

    base = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1"),
         ("c1", "c1"), ("d9", "d9")],
        "clip_id string, cluster_id string",
    )
    # b2-c1 bridges {b}, {c}; c1-e7 pulls in a brand-new clip; a-cluster
    # untouched
    new_pairs = spark.createDataFrame(
        [("b2", "c1"), ("c1", "e7")], "clip_a string, clip_b string"
    )
    got = {r["clip_id"]: r["cluster_id"] for r in merge_clusters(base, new_pairs, cc_cfg).collect()}
    assert got == {"a1": "a1", "a2": "a1", "b1": "b1", "b2": "b1",
                   "c1": "b1", "d9": "d9", "e7": "b1"}


def test_merge_clusters_noop_on_intra_cluster_pairs(spark, cc_cfg):
    """Pairs already inside one cluster contract away — assignment unchanged."""
    from consult_spark.operators.cluster import merge_clusters

    base = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("a3", "a1")],
        "clip_id string, cluster_id string",
    )
    new_pairs = spark.createDataFrame([("a2", "a3")], "clip_a string, clip_b string")
    got = sorted(map(tuple, merge_clusters(base, new_pairs, cc_cfg).collect()))
    assert got == [("a1", "a1"), ("a2", "a1"), ("a3", "a1")]
