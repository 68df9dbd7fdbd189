"""interval_overlap_join: closed-interval intersection bounded by equi keys."""

from __future__ import annotations

from kafka_merge_purge_spark.operators.rangejoin import interval_overlap_join


def _iv(spark, name, rows):
    return spark.createDataFrame(rows, f"k string, {name}_id long, s long, e long")


def test_overlap_semantics(spark):
    left = _iv(spark, "l", [("a", 1, 0, 10), ("a", 2, 20, 30), ("b", 3, 0, 10)])
    right = _iv(
        spark,
        "r",
        [
            ("a", 10, 5, 15),    # overlaps l1 ([0,10] ∩ [5,15])
            ("a", 11, 10, 12),   # touches l1 at the closed endpoint 10
            ("a", 12, 31, 40),   # disjoint from l2
            ("b", 13, 5, 15),    # overlaps l3 — but only under key b
        ],
    )
    right = right.withColumnRenamed("s", "rs").withColumnRenamed("e", "re").withColumnRenamed("k", "rk")
    out = interval_overlap_join(left, right, [("k", "rk")], "s", "e", "rs", "re")
    pairs = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (3, 13)]


def test_overlap_join_extracts_the_equi_key(spark):
    left = _iv(spark, "l", [("a", 1, 0, 10)])
    right = (
        _iv(spark, "r", [("a", 10, 5, 15)])
        .withColumnRenamed("s", "rs")
        .withColumnRenamed("e", "re")
        .withColumnRenamed("k", "rk")
    )
    plan = (
        interval_overlap_join(left, right, [("k", "rk")], "s", "e", "rs", "re")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the equi key must become a hash/merge join key, NOT degrade to a
    # nested-loop join with the overlap predicate doing all the work
    assert "NestedLoop" not in plan
