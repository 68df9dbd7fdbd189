"""Kafka source/sink builders (batch + streaming).

The runtime container has no broker and no spark-sql-kafka package, so
these builders only *construct* readers/writers; tests exercise the
option assembly, not a live connection.  On a real deployment:
``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.

Semantics preserved from the reference:
- ``startingOffsets=earliest``  (Factory.kt:48 auto.offset.reset=earliest)
- bounded drain of an unbounded topic = ``Trigger.AvailableNow`` — the
  declarative twin of "poll until first empty batch" (Pipeline.kt:36-37)
- client property passthrough with the ``kafka.`` prefix (Factory.kt's
  layered config, via sources/config.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_merge_purge_spark.sources.config import as_spark_kafka_options

#: Spark's Kafka source schema — the canonical record stream (model.py's
#: RECORD_SCHEMA) is a typed view over it.  ``headers`` requires
#: ``includeHeaders=true`` (set below), matching RECORD_SCHEMA's opaque
#: headers column (MixedValue.kt:41-43 passthrough).
KAFKA_SOURCE_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp", "headers")


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    client_config: dict[str, str] | None = None,
    bounded: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The full option map a Kafka reader gets — factored out pure so the
    no-broker test environment can pin it (reader objects hide their
    options).  ``bounded`` adds ``endingOffsets`` for batch reads."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": "earliest",  # Factory.kt:48 auto.offset.reset
        "includeHeaders": "true",  # headers column of RECORD_SCHEMA
    }
    if bounded:
        opts["endingOffsets"] = "latest"
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(as_spark_kafka_options(client_config or {}))
    return opts


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    client_config: dict[str, str] | None = None,
):
    return spark.read.format("kafka").options(
        **kafka_source_options(bootstrap_servers, topic, client_config, bounded=True)
    )


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    client_config: dict[str, str] | None = None,
    max_offsets_per_trigger: int | None = 500,
):
    """Streaming reader; ``maxOffsetsPerTrigger`` defaults to the
    reference's effective batch bound (Kafka client default
    max.poll.records=500, Factory.kt:46-81)."""
    return spark.readStream.format("kafka").options(
        **kafka_source_options(
            bootstrap_servers,
            topic,
            client_config,
            max_offsets_per_trigger=max_offsets_per_trigger,
        )
    )


def decode_for_display(kafka_df: DataFrame) -> DataFrame:
    """MixedValue pattern (MixedValue.kt:13,77-81): binary key/value stay
    canonical; string views are *derived* columns.  Sinks must select the
    binary originals — never the decoded views — for byte fidelity."""
    return kafka_df.withColumns(
        {
            "key_str": F.col("key").cast("string"),
            "value_str": F.col("value").cast("string"),
        }
    )


def to_kafka_sink_frame(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """Project to the Kafka sink contract: binary key/value (+ topic,
    + headers passthrough — the sink writes them when ``includeHeaders``
    is enabled on the producer options)."""
    cols = [
        F.col(key_col).cast("binary").alias("key"),
        F.col(value_col).cast("binary").alias("value"),
    ]
    if "topic" in df.columns:
        cols.append(F.col("topic"))
    if "headers" in df.columns:
        cols.append(F.col("headers"))
    return df.select(*cols)
