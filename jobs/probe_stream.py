"""Continuous probe job — the streaming counterpart of jobs/search.py:
classify newly-arriving clip files against a prebuilt index
(jobs/build_index.py), writing verified matches and per-batch unmatched
ids under a checkpoint.  Writes are epoch-keyed partition overwrites, so
a crash-replayed micro-batch converges to the same bytes (idempotent
at-least-once = exactly-once effect; streaming/probe.py module docstring).

    spark-submit --py-files dist/consult_spark.zip jobs/probe_stream.py \
        --clips <streaming parquet dir> --warehouse <index dir> \
        --out <dir> --checkpoint <dir> [--once]

``--once`` processes everything currently available and exits
(Trigger.AvailableNow); without it the job polls the source continuously
(processing-time trigger) until terminated externally.  ``--update-clusters``
folds the drain's verified matches into a maintained <out>/clusters table
via incremental connected components (O(matches) per drain, idempotent).
``--enroll-unmatched`` grows the library with the drain's unmatched clips
(incremental.grow_index: same cap-compose algebra as the delta fold,
id-idempotent, snapshot-guarded) so the NEXT drain matches against them —
CONSULT's frozen map cannot do this (main_map.cpp:859-946); a crawl
deployment absorbing its own novelty is the continuous version of the
build-then-search loop.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True, help="streaming source dir (parquet)")
    ap.add_argument("--warehouse", required=True, help="index dir from build_index")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--update-clusters", action="store_true",
                    help="after the drain, fold verified matches into a "
                    "maintained <out>/clusters table (incremental CC; "
                    "idempotent across re-runs)")
    ap.add_argument("--enroll-unmatched", action="store_true",
                    help="after the drain, grow the index with the drain's "
                    "unmatched clips (id-idempotent, snapshot-guarded) so "
                    "the next drain matches against them")
    ap.add_argument("--master", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    args = ap.parse_args()

    from consult_spark.session import get_spark
    from consult_spark.streaming.probe import stream_probe

    spark = get_spark("consult_spark.probe_stream", master=args.master)
    q = stream_probe(
        spark,
        args.clips,
        args.warehouse,
        args.out,
        args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        once=args.once,
    )
    q.awaitTermination()
    import os

    matched_dir = os.path.join(args.out, "matched_clips")
    n = (
        spark.read.parquet(matched_dir).count()
        if os.path.isdir(matched_dir)
        else 0
    )
    summary = {"n_matched_rows": n}
    metrics_dir = os.path.join(args.out, "probe_metrics")
    if os.path.isdir(metrics_dir):
        m = spark.read.parquet(metrics_dir)
        agg = m.groupBy().sum("n_queries", "n_matched_clips", "n_unmatched").head()
        summary.update(
            n_epochs=m.count(),
            n_queries=agg[0] or 0,
            n_matched_clips=agg[1] or 0,
            n_unmatched=agg[2] or 0,
        )
    if args.update_clusters:
        from consult_spark.streaming.probe import update_probe_clusters

        clusters = update_probe_clusters(spark, args.out)
        summary["n_clustered_clips"] = clusters.count()
        summary["n_clusters"] = clusters.select("cluster_id").distinct().count()
    if args.enroll_unmatched:
        from pyspark.sql import functions as F

        from consult_spark.config import Config
        from consult_spark.incremental import grow_index
        from consult_spark.io import Warehouse

        unmatched_dir = os.path.join(args.out, "unmatched_clips")
        if os.path.isdir(unmatched_dir):
            ids = spark.read.parquet(unmatched_dir).select("clip_id").distinct()
            delta = spark.read.parquet(args.clips).join(
                F.broadcast(ids), "clip_id", "left_semi"
            )
            wh = Warehouse(spark, args.warehouse, Config())
            snap = None if wh.use_iceberg else wh.snapshot(tag="pre_enroll")
            try:
                enroll = grow_index(spark, delta, args.warehouse)
            except BaseException:
                if snap is not None:
                    wh.restore(snap)
                    print({"enroll": "FAILED", "restored_from_snapshot": True})
                raise
            if snap is not None:
                wh.drop_snapshot(snap)
            summary["n_enrolled"] = enroll["n_enrolled"]
            summary["n_already_present"] = enroll["n_already_present"]
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
