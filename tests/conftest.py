"""Shared pytest fixtures: one SparkSession per run, one small corpus."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.session import get_spark  # noqa: E402
from crawler_spark.sources.synth import corpus_to_spark, gen_corpus  # noqa: E402
from crawler_spark.storage import SnapshotCatalog  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="crawler_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def corpus_pd():
    return gen_corpus(n_pages=400, n_hosts=6, urlset_size=50)


@pytest.fixture(scope="session")
def corpus(spark, corpus_pd):
    return corpus_to_spark(spark, corpus_pd)


@pytest.fixture()
def catalog(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "warehouse"))


TESTDATA_SF = os.environ.get("SPARK_GRAFT_SF_TEST", "/root/testdata/sf0.001")
