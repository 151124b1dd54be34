"""SparkSession factory.

Local mode for tests/bench; the same builder works on a real cluster via
``spark-submit --py-files dist/consult_spark.zip`` (all settings are plain
Spark conf, nothing local-mode specific except the master default).

Iceberg: the runtime jar is not present in this image, so the session falls
back to a plain-Parquet warehouse (see io.py).  When
``CONSULT_SPARK_ICEBERG_JAR`` is set (real cluster), the Iceberg catalog is
configured and io.py routes table reads/writes through it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def iceberg_available() -> bool:
    return bool(os.environ.get("CONSULT_SPARK_ICEBERG_JAR"))


def iceberg_confs(jar: str, warehouse: str) -> dict[str, str]:
    """The Iceberg catalog configuration (pure data, unit-testable without a
    JVM holding the runtime jar): hadoop-type catalog named `local`, tables
    under local.db.* — the mapping io.Warehouse routes through."""
    return {
        "spark.jars": jar,
        "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.local.type": "hadoop",
        "spark.sql.catalog.local.warehouse": warehouse,
    }


def get_spark(
    app_name: str = "consult_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("CONSULT_SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 2 * cpus

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # audio payloads are fat rows (~60 KB binary each) — the default
        # 4096-row reader/Arrow batches would mean ~240 MB column buffers per
        # batch and GC thrash (measured: 37 MB/s scans).  Size batches for
        # payload bytes, not row counts (analog of CONSULT pre-sizing arrays,
        # main_map.cpp:236-357).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("CONSULT_SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # local mode funnels every shuffle through ONE scratch disk — an
    # artifact real clusters don't have (executors spread over many
    # disks/NVMe).  Use tmpfs when present so shuffle write bandwidth scales
    # with cores the way a cluster's aggregate disk bandwidth does.
    if os.path.isdir("/dev/shm") and master.startswith("local"):
        scratch = os.environ.get("CONSULT_SPARK_LOCAL_DIR", "/dev/shm/spark_scratch")
        os.makedirs(scratch, exist_ok=True)
        b = b.config("spark.local.dir", scratch)
    if iceberg_available():
        warehouse = os.environ.get("CONSULT_SPARK_WAREHOUSE", "/tmp/consult_warehouse")
        for k, v in iceberg_confs(os.environ["CONSULT_SPARK_ICEBERG_JAR"], warehouse).items():
            b = b.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
