"""Broker-backed integration lane (opt-in: ``-m kafka``).

Runs the claims the default suite can only pin with fakes — the
AvailableNow drain, bounded batch reads, and the exactly-once
transactional sink — against a REAL single-node broker
(integration/docker-compose.kafka.yml).  Every test auto-skips unless
``KMP_KAFKA_BOOTSTRAP`` is set, and the whole module is deselected by
default (pytest.ini: ``-m "not kafka"``), so the sandbox run is
untouched.  See integration/README.md for the launch recipe.

Reference parity targets: Pipeline.kt:28-76 (poll-until-empty drain),
Factory.kt:48 (earliest offsets), Pipeline.kt:43-52 (offsets committed
inside the producer transaction).
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KMP_KAFKA_BOOTSTRAP")

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(
        not BOOTSTRAP,
        reason="set KMP_KAFKA_BOOTSTRAP=host:port (and the spark-sql-kafka "
        "package) to run the broker lane",
    ),
]


def _kafka_python():
    return pytest.importorskip(
        "kafka", reason="kafka-python needed to produce fixtures / verify sinks"
    )


@pytest.fixture()
def topic():
    return f"kmp-it-{uuid.uuid4().hex[:12]}"


def _produce(topic: str, records):
    kafka = _kafka_python()
    prod = kafka.KafkaProducer(bootstrap_servers=BOOTSTRAP)
    for key, value, headers in records:
        prod.send(topic, key=key, value=value, headers=headers or [])
    prod.flush()
    prod.close()


def test_available_now_drain_reads_everything_once(spark, topic, tmp_path):
    """Bounded drain of an unbounded topic: Trigger.AvailableNow reads
    every record produced before the start (the declarative twin of the
    reference's poll-until-first-empty-batch loop), headers intact; a
    second drain from the same checkpoint appends ZERO rows (offset
    bookkeeping carries across runs)."""
    from kafka_merge_purge_spark.sources.kafka import kafka_stream_reader
    from kafka_merge_purge_spark.streaming.pipeline import drain_events_stream

    n = 250
    _produce(
        topic,
        [
            (str(i).encode(), f"payload-{i}".encode(), [("trace", b"\x01")])
            for i in range(n)
        ],
    )
    out = str(tmp_path / "drained")
    ckpt = str(tmp_path / "ckpt")

    def to_parquet(df, batch_id):
        df.write.mode("append").parquet(out)

    records = kafka_stream_reader(spark, BOOTSTRAP, topic).load()
    drain_events_stream(records, to_parquet, ckpt).awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == n
    row = got.limit(1).collect()[0]
    assert [(h["key"], bytes(h["value"])) for h in row["headers"]] == [
        ("trace", b"\x01")
    ]
    # re-drain: the checkpoint remembers the committed offsets
    records2 = kafka_stream_reader(spark, BOOTSTRAP, topic).load()
    drain_events_stream(records2, to_parquet, ckpt).awaitTermination()
    assert spark.read.parquet(out).count() == n


def test_batch_bounded_read_snapshot(spark, topic):
    """earliest→latest bounded batch read sees exactly the pre-read
    records (Factory.kt:48 earliest semantics)."""
    from kafka_merge_purge_spark.sources.kafka import kafka_batch_reader

    _produce(topic, [(b"k", f"v{i}".encode(), None) for i in range(37)])
    df = kafka_batch_reader(spark, BOOTSTRAP, topic).load()
    assert df.count() == 37


def test_transactional_sink_commits_for_read_committed_consumer(spark, topic):
    """The exactly-once foreachBatch sink against the REAL transaction
    coordinator: begin → send → sendOffsetsToTransaction → commit, and
    a read_committed consumer sees exactly the committed records."""
    kafka = _kafka_python()
    from kafka_merge_purge_spark.streaming.sink import transactional_kafka_batch_fn

    src_topic, dst_topic = topic + "-src", topic + "-dst"
    _produce(src_topic, [(str(i).encode(), f"v{i}".encode(), None) for i in range(20)])
    src = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", src_topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
    frame = src.selectExpr(
        f"'{dst_topic}' AS topic",
        "CAST(NULL AS INT) AS partition",
        "topic AS src_topic",
        "partition AS src_partition",
        "offset AS src_offset",
        "CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
    )
    batch_fn = transactional_kafka_batch_fn(
        BOOTSTRAP,
        transactional_id=f"kmp-it-{uuid.uuid4().hex[:8]}",
        group_id=f"kmp-it-group-{uuid.uuid4().hex[:8]}",
    )
    batch_fn(frame, 0)

    consumer = kafka.KafkaConsumer(
        dst_topic,
        bootstrap_servers=BOOTSTRAP,
        isolation_level="read_committed",
        auto_offset_reset="earliest",
        consumer_timeout_ms=10_000,
    )
    seen = [m for m in consumer]
    consumer.close()
    assert len(seen) == 20
