"""Metrics + per-partition lineage tables.

CONSULT reports per-file (lines_read, reads_matched) under an OpenMP
critical section (main_search.cpp:1058-1061) and per-table kept/dropped
counters at build time (main_map.cpp:903-905).  The distributed analog is a
pair of append-only tables:

  metrics(run_id, stage, key, value double, ts)        — stage-level scalars
  lineage(run_id, stage, partition_id, rows, ts)       — per-partition counts

Lineage rows come from a ``spark_partition_id()`` groupBy on the stage
output — observability of partition balance (skew!) at every stage boundary.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRICS_SCHEMA = "run_id string, stage string, key string, value double, ts double"
LINEAGE_SCHEMA = "run_id string, stage string, partition_id int, rows bigint, ts double"


class MetricsSink:
    def __init__(self, warehouse) -> None:
        self.wh = warehouse
        self._metrics: list[tuple] = []

    def add(self, stage: str, key: str, value: float) -> None:
        self._metrics.append((self.wh.run_id, stage, key, float(value), time.time()))

    def lineage_df(self, df: DataFrame, stage: str) -> DataFrame:
        """Per-partition row counts of a stage output."""
        return (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .select(
                F.lit(self.wh.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.col("partition_id"),
                F.col("rows"),
                F.lit(time.time()).alias("ts"),
            )
        )

    def record_stage(self, df: DataFrame, stage: str, extra: dict | None = None) -> None:
        """Append lineage rows for df and optional scalar metrics."""
        ldf = self.lineage_df(df, stage)
        mode = "append"
        if self.wh.use_iceberg:
            ldf.writeTo("local.db.lineage").append()
        else:
            ldf.write.mode(mode).parquet(self.wh._path("lineage"))
        for k, v in (extra or {}).items():
            self.add(stage, k, v)

    def flush(self) -> None:
        if not self._metrics:
            return
        df = self.wh.spark.createDataFrame(self._metrics, METRICS_SCHEMA)
        if self.wh.use_iceberg:
            df.writeTo("local.db.metrics").append()
        else:
            df.write.mode("append").parquet(self.wh._path("metrics"))
        self._metrics = []
