from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from consult_spark.config import Config
from consult_spark.datagen import generate_corpus_pandas


@pytest.fixture(scope="session")
def spark():
    from consult_spark.session import get_spark

    s = get_spark("consult_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> Config:
    return Config()


@pytest.fixture(scope="session")
def corpus_xs() -> dict:
    """200-row corpus with planted dups + hot clique (FIXTURES.md xs tier)."""
    return generate_corpus_pandas(200, 42)


@pytest.fixture(scope="session")
def clips_xs(spark, corpus_xs):
    return spark.createDataFrame(corpus_xs["clips"]).cache()


@pytest.fixture(scope="session")
def oracle_xs(corpus_xs, cfg):
    from tests.oracle import run_oracle

    return run_oracle(corpus_xs["clips"], cfg)
