"""Search job — the Spark re-expression of `./main_search -i DB -c 1 -q DIR`
(main_search.cpp:684-1061): probe query clips against a prebuilt index
(jobs/build_index.py), verify candidates exactly, classify each query clip
matched/unmatched by the c-threshold, and write:

  matched_clips(query_id, lib_id, scores...)  — verified hits
  unmatched_clips(clip_id ...)                — the ucseq_ analog
                                                 (main_search.cpp:1021-1041)
  per-run metrics                             — (file, lines, matched) analog

    spark-submit --py-files dist/consult_spark.zip jobs/search.py \
        --queries <parquet> --warehouse <index dir> --out <dir>
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from consult_spark.config import Config
from consult_spark.io import Warehouse
from consult_spark.metrics import MetricsSink
from consult_spark.probing import probe_clips


def search(spark: SparkSession, queries: DataFrame, warehouse_dir: str,
           cfg: Config | None = None) -> dict:
    # ADOPT the persisted config (CONSULT reads _meta back and runs with it,
    # main_search.cpp:164-381) — an index built under any Config is
    # searchable without the caller reconstructing it; only an explicitly
    # passed CONFLICTING cfg is refused.
    probe = Warehouse(spark, warehouse_dir, cfg or Config())
    stored = Config.from_json(probe.read("config").head()["config_json"])
    if cfg is not None and cfg.params_hash != stored.params_hash:
        raise ValueError(
            f"index built with params_hash={stored.params_hash}, caller "
            f"explicitly passed {cfg.params_hash}; refusing to mix"
        )
    cfg = stored
    wh = Warehouse(spark, warehouse_dir, cfg, run_id=probe.run_id)
    sink = MetricsSink(wh)

    lib_buckets = wh.read("lsh_buckets")
    lib_features = wh.read("features")
    lib_tr = wh.read("transcripts") if wh.exists("transcripts") else None
    # verify with the query side as clip_a and library side as clip_b —
    # the probe core shared with the continuous probe (streaming/probe.py)
    confirmed = probe_clips(spark, queries, lib_buckets, lib_features, lib_tr, cfg)

    matched = confirmed.select(F.col("clip_a").alias("clip_id")).distinct()
    unmatched = queries.select("clip_id").join(matched, "clip_id", "left_anti")
    sink.add("search", "n_queries", queries.count())
    n_matched = matched.count()
    sink.add("search", "n_matched", n_matched)
    sink.flush()
    return {
        "confirmed": confirmed,
        "matched": matched,
        "unmatched": unmatched,
        "n_matched": n_matched,
        "warehouse": wh,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from consult_spark.session import get_spark

    spark = get_spark("consult_spark.search", master=args.master)
    res = search(spark, spark.read.parquet(args.queries), args.warehouse)
    res["confirmed"].write.mode("overwrite").parquet(f"{args.out}/matched_clips")
    res["unmatched"].write.mode("overwrite").parquet(f"{args.out}/unmatched_clips")
    print({"n_matched": res["n_matched"]})
    spark.stop()


if __name__ == "__main__":
    main()
