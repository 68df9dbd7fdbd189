"""Streaming deployment of the routing verbs.

The reference's poll loop (Pipeline.kt:28-76) maps to Structured
Streaming:

- poll-until-empty            → ``Trigger.AvailableNow`` (drain then stop)
- per-batch offset commit     → checkpoint WAL commit per micro-batch
- ``--no-commit`` replayable  → fresh/absent checkpointLocation
- max.poll.records bound      → ``maxOffsetsPerTrigger`` / ``maxFilesPerTrigger``
- running counters (R11)      → ``observe()`` metrics on the stream

Local tests use a file source over the events parquet (no broker in the
container); the same transform graph binds to sources/kafka.py readers on
a real deployment — that interchangeability is the point of the canonical
record schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka_merge_purge_spark.model import records_from_events
from kafka_merge_purge_spark.operators.routing import merge_all

#: ts declared long: events.parquet stores nanosecond INT64.  Unlike the
#: batch reader (nanosAsLong → true nanos), a readStream with this
#: user-declared schema receives ts pre-scaled to MICROS — so the scale
#: normalization must be magnitude-based, not a fixed DIV 1000 (which
#: compressed every event into January 1970 and broke the stream-stream
#: join's time bounds).  EPOCH_TO_MICROS handles both.
EVENTS_SCHEMA = "event_id long, ts long, user_id long, event_type string, value double, props string"


def stream_records_from_dir(spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stand-in for the Kafka stream: events parquet → the
    canonical record stream (same frame shape as the Kafka reader path)."""
    from kafka_merge_purge_spark.sources.batch import EPOCH_TO_MICROS

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = reader.parquet(events_dir).withColumn(
        "ts", F.expr(EPOCH_TO_MICROS.format(c="ts"))
    )
    return records_from_events(events)


def drain_events_stream(
    records: DataFrame,
    batch_fn,
    checkpoint_dir: str | None,
    query_name: str = "drain",
) -> StreamingQuery:
    """Run a bounded drain (AvailableNow) through ``foreachBatch``.

    ``batch_fn(batch_df, batch_id)`` is the sink; with a transactional/
    idempotent sink (streaming/sink.py) + checkpointing this is the R12
    exactly-once path; without a checkpoint it is the ``--no-commit``
    replayable read (CLI.kt:109-116).
    """
    writer = (
        records.writeStream.foreachBatch(batch_fn)
        .trigger(availableNow=True)
        .queryName(query_name)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_merge_all(
    records: DataFrame,
    dest_topic: str,
    sink_fn,
    checkpoint_dir: str | None,
    merge_tombstones: bool = False,
) -> StreamingQuery:
    """merge-all as a stream: the SAME merge_all transform, wrapped.

    Counters (R11) ride as observed metrics: each micro-batch reports
    merged/purged leg counts on the StreamingQueryProgress without a
    second pass over the data.  ``merge_tombstones`` mirrors the batch
    verb's reference ``-T`` semantics.
    """
    routed = merge_all(records, dest_topic, merge_tombstones=merge_tombstones)
    observed = routed.observe(
        "counters",
        F.count(F.when(F.col("leg") == "merge", 1)).alias("merged"),
        F.count(F.when(F.col("leg") == "purge", 1)).alias("purged"),
    )
    return drain_events_stream(observed, sink_fn, checkpoint_dir, query_name="merge_all")


def windowed_counts(
    records: DataFrame,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time window counts with a watermark for
    late data — the streaming aggregation surface (EXT rows, SURVEY §2.2)."""
    win = (
        F.window("timestamp", window_duration, slide)
        if slide
        else F.window("timestamp", window_duration)
    )
    return (
        records.withWatermark("timestamp", watermark)
        .groupBy(win, "topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("topic", F.col("window.start").alias("win_start"), F.col("window.end").alias("win_end"), "n")
    )


def streaming_dedup(records: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on (key, offset) within the watermark — state TTL
    bounds memory at scale (dropDuplicatesWithinWatermark, Spark ≥3.5)."""
    return records.withWatermark("timestamp", watermark).dropDuplicatesWithinWatermark(
        ["key", "offset"]
    )


def purge_lag_audit(
    records: DataFrame,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream join: pair every live record with a
    tombstone for the same key arriving within ``within`` after it — the
    audit view "which records were purged, and how fast".

    Both sides carry watermarks and the join condition is time-bounded,
    so state for each side is GC'd past the watermark — the requirement
    for unbounded-stream joins to run in bounded memory.
    """
    live = (
        records.filter(F.col("value").isNotNull())
        .select("key", F.col("offset").alias("live_offset"), F.col("timestamp").alias("live_ts"))
        .withWatermark("live_ts", watermark)
    )
    # Both sides derive from the same frame, so a live["key"] ==
    # tombs["key"] condition resolves to the SAME attribute (Spark warns
    # "trivially true equals predicate") and the join degrades to a
    # time-bounded cross join.  Rename the tombstone-side key to force a
    # real equi-condition.
    tombs = (
        records.filter(F.col("value").isNull())
        .select(
            F.col("key").alias("tomb_key"),
            F.col("offset").alias("tomb_offset"),
            F.col("timestamp").alias("tomb_ts"),
        )
        .withWatermark("tomb_ts", watermark)
    )
    return live.join(
        tombs,
        (F.col("key") == F.col("tomb_key"))
        & (F.col("tomb_ts") >= F.col("live_ts"))
        & (F.col("tomb_ts") <= F.col("live_ts") + F.expr(f"interval {within}")),
    ).select(
        "key",
        "live_offset",
        "tomb_offset",
        (F.unix_timestamp("tomb_ts") - F.unix_timestamp("live_ts")).alias("purge_lag_sec"),
    )


def streaming_session_counts(records: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session-window aggregation (built-in session_window) — streaming
    twin of operators/sessionize.py's batch formulation."""
    return (
        records.withWatermark("timestamp", watermark)
        .groupBy(F.session_window("timestamp", gap), "key")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "n_events",
        )
    )
