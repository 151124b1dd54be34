"""Contract tests for the Iceberg branch (io.py / session.py).

The runtime jar is not in this image, so every integration test runs the
Parquet fallback; these tests pin the Iceberg code path anyway — the
catalog conf assembly and the exact writeTo/read.table call sequence the
Warehouse makes — via stubs, so the branch is not dead untested code.
README documents the fallback decision."""

from __future__ import annotations

from consult_spark.config import Config
from consult_spark.io import Warehouse
from consult_spark.session import iceberg_confs


def test_iceberg_conf_assembly():
    confs = iceberg_confs("/opt/jars/iceberg-runtime.jar", "/data/warehouse")
    assert confs["spark.jars"] == "/opt/jars/iceberg-runtime.jar"
    assert confs["spark.sql.catalog.local"] == "org.apache.iceberg.spark.SparkCatalog"
    assert confs["spark.sql.catalog.local.type"] == "hadoop"
    assert confs["spark.sql.catalog.local.warehouse"] == "/data/warehouse"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]


class _Calls:
    def __init__(self):
        self.log: list[tuple] = []


class _FakeWriteTo:
    def __init__(self, calls, table):
        self.calls, self.table = calls, table

    def createOrReplace(self):
        self.calls.log.append(("createOrReplace", self.table))

    def append(self):
        self.calls.log.append(("append", self.table))

    def create(self):
        self.calls.log.append(("create", self.table))


class _FakeDF:
    def __init__(self, calls):
        self.calls = calls

    def writeTo(self, table):
        self.calls.log.append(("writeTo", table))
        return _FakeWriteTo(self.calls, table)


class _FakeRead:
    def __init__(self, calls):
        self.calls = calls

    def table(self, name):
        self.calls.log.append(("read.table", name))

        class _T:
            def count(self_inner):
                return 7

        return _T()


class _FakeCatalog:
    def __init__(self, existing):
        self.existing = existing

    def tableExists(self, name):
        return name in self.existing


class _FakeSpark:
    def __init__(self, calls, existing_tables=()):
        self.read = _FakeRead(calls)
        self.catalog = _FakeCatalog(set(existing_tables))


def test_warehouse_routes_through_iceberg_tables(tmp_path, monkeypatch):
    """With the jar env set, Warehouse.write must go through
    writeTo(local.db.<name>).createOrReplace() and read through
    spark.read.table — never the parquet path."""
    monkeypatch.setenv("CONSULT_SPARK_ICEBERG_JAR", "/opt/jars/iceberg-runtime.jar")
    calls = _Calls()
    wh = Warehouse(_FakeSpark(calls), str(tmp_path / "wh"), Config())
    assert wh.use_iceberg

    n = wh.write(_FakeDF(calls), "features")
    assert n == 7
    wh.read("features")
    assert calls.log == [
        ("writeTo", "local.db.features"),
        ("createOrReplace", "local.db.features"),
        ("read.table", "local.db.features"),  # manifest row count
        ("read.table", "local.db.features"),
    ]
    # the manifest contract (resumability) is written in both modes
    m = wh.manifest("features")
    assert m["rows"] == 7 and m["params_hash"] == Config().params_hash


def test_warehouse_iceberg_append_honors_mode(tmp_path, monkeypatch):
    """mode='append' must APPEND to an existing Iceberg table — the
    previous unconditional createOrReplace() would have replaced the whole
    history table with just the delta on every fold_delta/grow_index append
    (ADVICE r7 #1, data loss with no parquet-mode snapshot guard to catch
    it).  First write under append (no table yet) creates instead."""
    monkeypatch.setenv("CONSULT_SPARK_ICEBERG_JAR", "/opt/jars/iceberg-runtime.jar")
    calls = _Calls()
    wh = Warehouse(
        _FakeSpark(calls, existing_tables=("local.db.features",)),
        str(tmp_path / "wh"), Config(),
    )
    wh.write(_FakeDF(calls), "features", mode="append")
    assert ("append", "local.db.features") in calls.log
    assert ("createOrReplace", "local.db.features") not in calls.log

    calls2 = _Calls()
    wh2 = Warehouse(_FakeSpark(calls2), str(tmp_path / "wh2"), Config())
    wh2.write(_FakeDF(calls2), "features", mode="append")
    assert ("create", "local.db.features") in calls2.log
    assert ("append", "local.db.features") not in calls2.log


def test_warehouse_parquet_fallback_without_jar(monkeypatch):
    monkeypatch.delenv("CONSULT_SPARK_ICEBERG_JAR", raising=False)
    calls = _Calls()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        wh = Warehouse(_FakeSpark(calls), d, Config())
        assert not wh.use_iceberg


def test_real_hadoop_catalog_roundtrip(tmp_path, monkeypatch):
    """END-TO-END Iceberg: write features through a real hadoop-catalog
    commit, read back, and resume.  Requires the runtime jar — point
    CONSULT_SPARK_ICEBERG_JAR at iceberg-spark-runtime-<spark>_<scala>.jar;
    auto-skipped when absent (this sandbox has no network route to Maven
    Central — README 'Correctness gates' records the attempt)."""
    import os

    import pytest

    jar = os.environ.get("CONSULT_SPARK_ICEBERG_JAR")
    if not jar or not os.path.exists(jar):
        pytest.skip("iceberg runtime jar not available in this environment")

    from pyspark.sql import SparkSession

    from consult_spark.session import iceberg_confs

    # a dedicated session: the catalog confs must be set before the JVM starts
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    b = SparkSession.builder.master("local[2]").appName("iceberg_real")
    for k, v in iceberg_confs(jar, str(tmp_path / "iceberg_wh")).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    try:
        wh = Warehouse(spark, str(tmp_path / "manifests"), Config())
        assert wh.use_iceberg
        df = spark.range(100).selectExpr("cast(id as string) clip_id", "id % 3 kind")
        n = wh.write(df, "features")
        assert n == 100
        assert wh.read("features").count() == 100
        # resume contract: manifest written with the config fingerprint
        assert wh.manifest("features")["params_hash"] == Config().params_hash
        # a real Iceberg table has snapshot metadata
        snaps = spark.sql("SELECT * FROM local.db.features.snapshots").count()
        assert snaps >= 1
    finally:
        spark.stop()
