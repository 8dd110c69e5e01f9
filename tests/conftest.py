from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_web_scrapper_and_crawler_spark.config import CorpusSpec
from distributed_web_scrapper_and_crawler_spark.session import get_spark
from distributed_web_scrapper_and_crawler_spark.sources.corpus import (
    CORPUS_SPARK_SCHEMA,
    generate_corpus,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dwsc-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_spec() -> CorpusSpec:
    return CorpusSpec(seed=42, n_hosts=4, docs_per_host=12, links_per_doc=5)


@pytest.fixture(scope="session")
def small_corpus_pdf(small_spec):
    return generate_corpus(small_spec)


@pytest.fixture(scope="session")
def small_corpus(spark, small_corpus_pdf):
    df = spark.createDataFrame(small_corpus_pdf, schema=CORPUS_SPARK_SCHEMA)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def seeds(small_spec) -> list[str]:
    return [f"http://{small_spec.hosts[0]}/page/0", f"http://{small_spec.hosts[1]}/page/3"]
