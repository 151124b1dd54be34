"""Calibrate Config.cc_driver_max_edges from measurement.

The connected-components operator routes edge sets below the threshold to
a driver-side Arrow collect + vectorized numpy min-label loop, and larger
sets to the distributed O(log n) join loop (operators/cluster.py).  The 5M
default was asserted, not measured (round-3 VERDICT 'Next round' #6).
This script times BOTH paths on identical synthetic edge sets and reports
driver peak RSS, so the default is justified by a curve instead of a
guess.  Results land in docs/SCALE.md.

Edge sets: supercritical random graphs (n_edges over n_edges/2 nodes →
one giant component + fringe), the worst case for label-propagation
round count and close to the shape real near-dup graphs take when a
corpus has large duplicate families.

Usage: taskset -c 0-15 python scripts/calibrate_cc_driver.py [sizes...]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from consult_spark.config import Config
from consult_spark.operators.cluster import connected_components
from consult_spark.session import get_spark

SIZES = [int(float(s)) for s in sys.argv[1:]] or [1_000_000, 5_000_000, 20_000_000]


def make_edges(spark, n_edges: int):
    """Deterministic pseudo-random edges over ~n_edges/2 nodes (int64 ids)."""
    n_nodes = max(2, n_edges // 2)
    e = (
        spark.range(n_edges)
        .select(
            (F.xxhash64(F.col("id"), F.lit(1)) % n_nodes).alias("a"),
            (F.xxhash64(F.col("id"), F.lit(2)) % n_nodes).alias("b"),
        )
        .select(
            (F.abs(F.col("a"))).alias("a"), (F.abs(F.col("b"))).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("clip_a"), F.greatest("a", "b").alias("clip_b")
        )
    )
    return e.localCheckpoint(eager=True)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    spark = get_spark("cc_calibrate", master="local[16]", shuffle_partitions=16)
    rows = []
    for n in SIZES:
        edges = make_edges(spark, n)
        n_real = edges.count()

        cfg_driver = Config(cc_driver_max_edges=2**62)
        r0 = rss_mb()
        t0 = time.time()
        out = connected_components(edges, cfg_driver)
        n_comp_driver = out.select("cluster_id").distinct().count()
        t_driver = time.time() - t0
        rss_after = rss_mb()

        cfg_dist = Config(cc_driver_max_edges=0)
        t0 = time.time()
        out = connected_components(edges, cfg_dist)
        n_comp_dist = out.select("cluster_id").distinct().count()
        t_dist = time.time() - t0

        assert n_comp_driver == n_comp_dist, (n_comp_driver, n_comp_dist)
        rows.append({
            "edges": n_real,
            "driver_sec": round(t_driver, 1),
            "driver_peak_rss_mb": round(rss_after, 0),
            "rss_delta_mb": round(rss_after - r0, 0),
            "distributed_sec": round(t_dist, 1),
            "components": n_comp_driver,
        })
        print(json.dumps(rows[-1]))
        edges.unpersist()
    print(json.dumps({"table": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
