from __future__ import annotations

from pyspark.sql import functions as F

from kafka_merge_purge_spark.model import RECORD_COLUMNS, SNAPSHOT_COLUMNS


def test_records_schema(records):
    # batch snapshots carry every canonical column except opaque headers
    assert records.columns == SNAPSHOT_COLUMNS
    assert RECORD_COLUMNS == SNAPSHOT_COLUMNS + ["headers"]


def test_tombstone_rate_matches_pinned_rule(records):
    # tombstone iff event_id % 13 == 0
    n = records.count()
    tombs = records.filter(F.col("value").isNull()).count()
    assert tombs == len([i for i in range(n) if i % 13 == 0])


def test_null_keys_match_pinned_rule(records):
    nulls = records.filter(F.col("key").isNull()).count()
    assert nulls == records.filter(F.col("offset").isNotNull()).filter(
        F.expr("CAST(key AS LONG) IS NULL AND key IS NULL")
    ).count()
    assert nulls > 0


def test_partitions_in_range(records):
    parts = [r["partition"] for r in records.select("partition").distinct().collect()]
    assert set(parts) <= set(range(8))
