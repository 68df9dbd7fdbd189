"""Bucketed co-located join: the write-once-join-many scale path must
produce an exchange-free plan and the same rows as the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_merge_purge_spark.operators.colocate import bucketed_join, write_bucketed
from kafka_merge_purge_spark.plans.introspect import node_count, shuffle_count


@pytest.fixture(scope="module")
def bucketed_tables(spark, tables):
    orders = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    customer = tables["customer"].select("c_custkey", "c_name")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey", 8
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"), "b_customer", "custkey", 8
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast so the test exercises the bucket path, not a
    # small-table broadcast that would hide a missing co-location
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "custkey")
        assert shuffle_count(joined) == 0  # co-located: no Exchange at all
        assert node_count(joined, "SortMergeJoin") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, tables, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = bucketed_join(spark, lt, rt, "custkey")
    plain = (
        tables["orders"]
        .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
    )
    assert bucketed.count() == plain.count()
    b = bucketed.agg(F.sum("o_totalprice").cast("decimal(28,2)").alias("s")).collect()[0]["s"]
    p = plain.agg(F.sum("o_totalprice").cast("decimal(28,2)").alias("s")).collect()[0]["s"]
    assert b == p
