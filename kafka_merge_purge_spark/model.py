"""Canonical record model.

The reference's only data abstraction is the Kafka record stream
(``typealias Record = ConsumerRecord<MixedValue?, MixedValue?>``,
reference src/main/kotlin/com/flyeralarm/kafkamp/ConsumerRecord.kt:11).
Here a stream is a DataFrame with the canonical RECORD_SCHEMA below — a
subset of Spark's own Kafka source schema, so batch parquet snapshots and
``readStream.format("kafka")`` produce interchangeable frames.

MixedValue (raw bytes + decoded view, MixedValue.kt:13) maps to: keep the
payload column canonical/raw end-to-end, derive display columns
(``cast("string")``, ``from_json``) without ever re-encoding the payload —
the sink always writes the untouched original (MixedValue.kt:77-81).

Tombstone = ``value IS NULL`` (Pipeline.kt:93, Ask.kt:45, MergeAll.kt:38,
PurgeAll.kt:26).

The driver's ``events`` table stands in for a topic (FIXTURES.md §B).  The
mapping is pinned here once, with a byte-identical DuckDB twin
(RECORDS_ORACLE_SQL) so every reference-semantics query hashes against the
same rows:

- partition  = user_id % 8            (8-partition topic)
- offset     = event_id               (monotone per partition is not
                                       required by any operator; global
                                       monotone is stronger)
- key        = CAST(user_id AS STRING), NULL when user_id % 97 = 0
               (the reference allows null keys, ConsumerRecordTest.kt:22-32)
- value      = props, NULL when event_id % 13 = 0   <- pinned tombstone
               rule: the synthetic events table has no native NULL payloads,
               so ~7.7% of rows are designated tombstones deterministically
- timestamp  = ts
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Kafka record headers, carried opaquely end-to-end (MixedValue.kt:41-43
#: treats headers as pass-through bytes; Spark's Kafka source exposes the
#: same shape under ``includeHeaders=true``).
HEADERS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), True),
            T.StructField("value", T.BinaryType(), True),
        ]
    )
)

#: Canonical record schema — superset-compatible with Spark's Kafka source.
#: ``headers`` is nullable and optional on batch snapshots (the driver's
#: parquet tables carry none); every routing verb passes it through
#: untouched when present.
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("headers", HEADERS_TYPE, True),
    ]
)

RECORD_COLUMNS = [f.name for f in RECORD_SCHEMA.fields]

#: Columns a headerless batch snapshot emits (records_from_events).
SNAPSHOT_COLUMNS = [c for c in RECORD_COLUMNS if c != "headers"]

#: DuckDB twin of `records_from_events` — MUST stay expression-identical.
RECORDS_ORACLE_SQL = """
    SELECT
        'events'                                            AS topic,
        CAST(user_id % 8 AS INTEGER)                        AS "partition",
        event_id                                            AS "offset",
        CASE WHEN user_id % 97 = 0 THEN NULL
             ELSE CAST(user_id AS VARCHAR) END              AS "key",
        CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS "value",
        ts                                                  AS "timestamp"
    FROM events
"""


def records_from_events(
    events: DataFrame, topic: str = "events", extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Cast the synthetic ``events`` table to the canonical record stream.

    Narrow (no shuffle); Catalyst pushes any downstream filter on the
    source columns through these projections into the parquet scan.
    ``extra_cols`` carries source attributes (e.g. routing-rule inputs)
    alongside the canonical six.
    """
    return events.select(
        *[F.col(c) for c in extra_cols],
        F.lit(topic).alias("topic"),
        (F.col("user_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.when(F.col("user_id") % 97 == 0, F.lit(None))
        .otherwise(F.col("user_id").cast("string"))
        .alias("key"),
        F.when(F.col("event_id") % 13 == 0, F.lit(None))
        .otherwise(F.col("props"))
        .alias("value"),
        F.col("ts").alias("timestamp"),
    )


def is_tombstone(value_col: str = "value") -> Column:
    """The tombstone predicate (Pipeline.kt:93): NULL payload."""
    return F.col(value_col).isNull()


def load_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record stream for a scale-factor dir (events.parquet → records)."""
    from kafka_merge_purge_spark.sources.batch import load_table

    return records_from_events(load_table(spark, sf_dir, "events"))
