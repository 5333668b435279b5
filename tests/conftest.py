from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("lucene_solr_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """1,000-doc deterministic pages corpus (sf0.001)."""
    from lucene_solr_spark.fixtures import write_pages

    out = str(tmp_path_factory.mktemp("pages") / "pages_sf0.001.parquet")
    write_pages(0.001, out)
    return out


@pytest.fixture(scope="session")
def index_small(spark, pages_small, tmp_path_factory):
    """English-profile index over the 1,000-doc corpus."""
    from lucene_solr_spark.indexer import build_index, read_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    pages = spark.read.parquet(pages_small)
    build_index(spark, pages, out, profile="en", num_buckets=8)
    return read_index(spark, out)
