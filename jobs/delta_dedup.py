"""Delta fold job — grow an existing dedup warehouse by a batch of new
clips (a day's crawl) at O(delta) compute instead of an O(history)
pipeline re-run (consult_spark/incremental.py module docstring for the
algebra; CONSULT's build-once index, main_map.cpp:540-1132, has no
equivalent — growing its library means rebuilding).

    spark-submit --py-files dist/consult_spark.zip jobs/delta_dedup.py \
        --delta <parquet path | --delta-dir <raw audio dir>> \
        --warehouse <dir from jobs/pipeline.py or a previous fold>

Appends features/transcripts/confirmed_pairs, re-caps only the touched
LSH buckets, merges clusters incrementally, maintains unique_clips.
The warehouse config must match the session's (params_hash check).

A fold is not atomic across tables, so by default the job hardlink-
snapshots the warehouse first (cheap: payload files are immutable, only
directory entries are linked) and restores it byte-for-byte if the fold
fails — the parquet-mode analog of rolling Iceberg tables back to the
pre-fold snapshot.  ``--no-snapshot`` skips this (e.g. when an outer
system already snapshots).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--delta", help="parquet path of the new clips")
    src.add_argument(
        "--delta-dir",
        help="directory of raw audio files; metadata filled by header-only "
        "probes (sources/clips.py)",
    )
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--no-snapshot", action="store_true",
                    help="skip the pre-fold warehouse snapshot/rollback guard")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from consult_spark.config import Config
    from consult_spark.incremental import fold_delta
    from consult_spark.io import Warehouse
    from consult_spark.session import get_spark

    spark = get_spark("consult_spark.delta_dedup", master=args.master)
    if args.delta_dir:
        from consult_spark.sources.clips import read_audio_directory

        delta = read_audio_directory(spark, args.delta_dir)
    else:
        delta = spark.read.parquet(args.delta)

    wh = Warehouse(spark, args.warehouse, Config())
    snap = None if (args.no_snapshot or wh.use_iceberg) else wh.snapshot()
    try:
        summary = fold_delta(spark, delta, args.warehouse)
    except BaseException:
        if snap is not None:
            wh.restore(snap)
            print({"fold": "FAILED", "restored_from_snapshot": True})
        raise
    if snap is not None:
        wh.drop_snapshot(snap)
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
