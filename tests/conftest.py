from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kafka_merge_purge_spark.session import get_spark

    spark = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def records(spark):
    from kafka_merge_purge_spark.model import load_records

    return load_records(spark, SF_DIR).cache()


@pytest.fixture(scope="session")
def tables(spark):
    from kafka_merge_purge_spark.sources.batch import load_tables

    return load_tables(spark, SF_DIR, ("events", "documents", "embeddings", "orders", "customer"))
