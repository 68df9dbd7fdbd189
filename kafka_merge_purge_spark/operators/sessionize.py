"""Batch sessionization (the batch analog of streaming session windows).

A session = consecutive events of one user with gaps < ``gap``.  The lag /
cumulative-sum formulation is the SQL-expressible twin of Spark's
``session_window`` streaming aggregate (streaming/pipeline.py uses the
built-in at stream time):

    new_session = (ts - lag(ts))  > gap
    session_id  = running sum of new_session over (user, ts)

One shuffle on user_id (the window partition); both window passes share
it.  Ties broken by event_id so the result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Tag each event with its session index per user."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gap_sec = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_sec),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new")


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup: event count + span in seconds."""
    tagged = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return tagged.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias("span_sec"),
    )
