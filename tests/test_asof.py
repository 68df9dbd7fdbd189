from __future__ import annotations

from pyspark.sql import functions as F

from kafka_merge_purge_spark.operators.asof import asof_join


def _mk(spark):
    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:00:00"),
         (2, 100, "2024-01-01 12:00:00"),
         (3, 200, "2024-01-01 10:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(100, "2024-01-01 09:00:00", 11),
         (100, "2024-01-01 10:00:00", 12),   # equal ts → inclusive
         (100, "2024-01-01 11:30:00", 13),
         (300, "2024-01-01 09:00:00", 99)],  # other key only
        "user_id long, ts string, click_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_asof_inclusive_latest_and_null_when_missing(spark):
    left, right = _mk(spark)
    out = {
        r["event_id"]: r["asof_click_id"]
        for r in asof_join(left, right, "user_id", "ts", "ts", ("click_id",)).collect()
    }
    assert out[1] == 12      # equal-timestamp right row wins (inclusive)
    assert out[2] == 13      # latest at-or-before 12:00
    assert out[3] is None    # no right rows for user 200


def test_asof_tie_break_picks_max_tie(spark):
    left = spark.createDataFrame(
        [(1, 5, "2024-01-01 10:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(5, "2024-01-01 09:00:00", 7), (5, "2024-01-01 09:00:00", 9)],
        "user_id long, ts string, click_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, "user_id", "ts", "ts", ("click_id",)).collect()
    assert out[0]["asof_click_id"] == 9


def test_asof_single_shuffle(spark):
    from kafka_merge_purge_spark.plans.introspect import shuffle_count

    left, right = _mk(spark)
    plan_df = asof_join(left, right, "user_id", "ts", "ts", ("click_id",))
    # one exchange for the window partition (plus AQE reads); the point is
    # the pair-explosion-free shape — no join node at all
    assert "Join" not in plan_df._jdf.queryExecution().executedPlan().toString()
    assert shuffle_count(plan_df) <= 2
