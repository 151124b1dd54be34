"""The docs/SCALE.md co-location claim, made checkable: a features table
written bucketBy(clip_id) joins on clip_id WITHOUT an exchange on its side
(the bucketed scan satisfies the join's required distribution), while the
same data as plain parquet shuffles.  This is the plan property the verify
joins rely on at 100 TB, where the feature payload exceeds broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consult_spark.operators import shingle as SH


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _exchanges_in(plan: str) -> int:
    import re

    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_bucketed_features_join_avoids_exchange(spark, clips_xs, cfg, tmp_path, no_broadcast):
    feats = SH.featurize(clips_xs, cfg)
    pairs = spark.createDataFrame(
        [(f"clip_{i:08d}_v0",) for i in range(50)], "clip_a string"
    )

    def join_plan(features_df):
        j = pairs.join(
            features_df.withColumnsRenamed({"clip_id": "clip_a"}).select(
                "clip_a", "simhash", "n_shingles"
            ),
            "clip_a",
        )
        return j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    # plain parquet: both join sides exchange
    plain_path = str(tmp_path / "plain")
    feats.write.parquet(plain_path)
    plain_plan = join_plan(spark.read.parquet(plain_path))

    # bucketed table: the features side needs NO exchange (+ the scan
    # advertises its bucketing)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path / 'db'}'")
    feats.write.bucketBy(8, "clip_id").sortBy("clip_id").saveAsTable(
        "buckdb.features_bucketed"
    )
    bucketed_plan = join_plan(spark.table("buckdb.features_bucketed"))

    assert "Bucketed: true" in bucketed_plan
    assert _exchanges_in(bucketed_plan) == _exchanges_in(plain_plan) - 1
    spark.sql("DROP TABLE buckdb.features_bucketed")
