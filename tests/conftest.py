from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flagembedding_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fes-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    from flagembedding_spark.schemas import synth_corpus

    return synth_corpus(spark, 200, seed=42).cache()


@pytest.fixture(scope="session")
def tiny_queries(spark):
    from flagembedding_spark.schemas import synth_queries

    return synth_queries(spark, 50, seed=43).cache()
