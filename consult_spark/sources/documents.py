"""Document-table ingest: JSONL / CSV / parquet -> the documents contract
schema (doc_id bigint, text string [, lang, source, n_chars]).

Training-data corpora arrive overwhelmingly as JSONL shards; ingest is a
plain Spark file source (JVM-side, split-parallel, predicate/pushdown
friendly) with an EXPLICIT schema — never schema inference, which at 100 TB
means a second full pass over the data and silently drifting types across
shards.  Missing optional columns are normalized in; doc_id is synthesized
deterministically (content-hash based) when the corpus has none, so re-runs
and resumes label rows identically regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"
_INGEST_FIELDS = "doc_id bigint, text string, lang string, source string"


def _normalize(df: DataFrame, default_source: str) -> DataFrame:
    """Fill optional columns and synthesize a deterministic doc_id when the
    corpus has none: top-63-bits of xxhash64(text, source) — content-based,
    so the id survives repartitioning, resumes and shard reordering (the
    same determinism stance as Config's pinned seeds)."""
    cols = set(df.columns)
    if "text" not in cols:
        raise ValueError("documents source requires a `text` column")
    for name, default in (("lang", F.lit("")), ("source", F.lit(default_source)),
                          ("doc_id", F.lit(None).cast("bigint"))):
        if name not in cols:
            df = df.withColumn(name, default)
    # missing/null ids and optionals are normalized per ROW (an explicit
    # ingest schema always materializes the column; absence shows as null)
    df = (
        df.withColumn("lang", F.coalesce(F.col("lang").cast("string"), F.lit("")))
        .withColumn("source", F.coalesce(F.col("source").cast("string"), F.lit(default_source)))
        .withColumn(
            "doc_id",
            F.coalesce(
                F.col("doc_id").cast("bigint"),
                F.abs(F.xxhash64(F.col("text"), F.col("source"))).cast("bigint"),
            ),
        )
    )
    return df.select(
        "doc_id",
        F.col("text").cast("string").alias("text"),
        "lang",
        "source",
        F.length("text").cast("int").alias("n_chars"),
    )


def read_documents_jsonl(spark: SparkSession, path: str, source: str = "jsonl") -> DataFrame:
    """`*.jsonl` / `*.json` lines under ``path`` -> documents DataFrame.
    Corrupt lines land in a `_corrupt_record`-free PERMISSIVE null row and
    are dropped with a count available via the caller's metrics, never a
    task failure (same stance as audio decode_ok)."""
    df = (
        spark.read.schema(_INGEST_FIELDS)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    return _normalize(df.filter(F.col("text").isNotNull()), source)


def read_documents_csv(spark: SparkSession, path: str, source: str = "csv",
                       header: bool = True, sep: str = ",") -> DataFrame:
    df = (
        spark.read.schema(_INGEST_FIELDS)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    return _normalize(df.filter(F.col("text").isNotNull()), source)


def read_documents_parquet(spark: SparkSession, path: str, source: str = "parquet") -> DataFrame:
    return _normalize(spark.read.parquet(path), source)
