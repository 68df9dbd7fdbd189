"""Config-precedence matrix (reference FactoryTest.kt:112-263)."""

from __future__ import annotations

import pytest

from kafka_merge_purge_spark.sources.config import (
    CONSUMER_FORCED,
    PRODUCER_FORCED,
    as_spark_kafka_options,
    assemble_client_config,
)


def test_layer_precedence(tmp_path):
    shared = tmp_path / "shared.properties"
    shared.write_text("a=shared-file\nb=shared-file\nc=shared-file\nd=shared-file\n")
    client = tmp_path / "client.properties"
    client.write_text("b=client-file\nc=client-file\n")
    cfg = assemble_client_config(
        "consumer",
        shared_file=str(shared),
        shared_overrides={"c": "shared-override", "d": "shared-override"},
        client_file=str(client),
        client_overrides={"c": "client-override"},
        defaults={"a": "default", "e": "default"},
    )
    assert cfg["a"] == "shared-file"        # file beats default
    assert cfg["b"] == "client-file"        # client file beats shared layers
    assert cfg["c"] == "client-override"    # explicit client override wins
    assert cfg["d"] == "shared-override"    # shared override beats shared file
    assert cfg["e"] == "default"


def test_forced_consumer_semantics_always_win():
    cfg = assemble_client_config(
        "consumer",
        client_overrides={"isolation.level": "read_uncommitted", "enable.auto.commit": "true"},
    )
    for k, v in CONSUMER_FORCED.items():
        assert cfg[k] == v


def test_forced_producer_semantics_always_win():
    cfg = assemble_client_config("producer", client_overrides={"acks": "0"})
    for k, v in PRODUCER_FORCED.items():
        assert cfg[k] == v


def test_spark_option_prefixing():
    opts = as_spark_kafka_options({"bootstrap.servers": "b:9092"})
    assert opts == {"kafka.bootstrap.servers": "b:9092"}


def test_invalid_kind_rejected():
    with pytest.raises(ValueError):
        assemble_client_config("admin")


def test_kafka_sink_frame_passes_headers_through(spark):
    from kafka_merge_purge_spark.model import RECORD_SCHEMA
    from kafka_merge_purge_spark.sources.kafka import to_kafka_sink_frame

    rows = [("t", 0, 1, "k", "v", None, [("h", b"\x01")])]
    frame = to_kafka_sink_frame(spark.createDataFrame(rows, RECORD_SCHEMA))
    assert frame.columns == ["key", "value", "topic", "headers"]
    (r,) = frame.collect()
    assert [(h["key"], bytes(h["value"])) for h in r["headers"]] == [("h", b"\x01")]


def test_kafka_source_options_carry_semantics_and_headers():
    from kafka_merge_purge_spark.sources.config import assemble_client_config
    from kafka_merge_purge_spark.sources.kafka import kafka_source_options

    client = assemble_client_config("consumer", client_overrides={"group.id": "g"})
    batch = kafka_source_options("b:9092", "events", client, bounded=True)
    assert batch["kafka.bootstrap.servers"] == "b:9092"
    assert batch["subscribe"] == "events"
    assert batch["startingOffsets"] == "earliest"      # Factory.kt:48
    assert batch["endingOffsets"] == "latest"          # bounded drain
    assert batch["includeHeaders"] == "true"           # RECORD_SCHEMA headers
    assert batch["kafka.isolation.level"] == "read_committed"  # forced layer
    assert batch["kafka.enable.auto.commit"] == "false"
    assert batch["kafka.group.id"] == "g"

    stream = kafka_source_options("b:9092", "events", client, max_offsets_per_trigger=500)
    assert "endingOffsets" not in stream
    assert stream["maxOffsetsPerTrigger"] == "500"     # max.poll.records parity


def test_epoch_scale_explicit_overrides_sniff(spark):
    """Pre-1973 nano epochs fall into the sniff's millis branch; an
    explicit scale must decode them correctly (r3 ADVICE)."""
    from pyspark.sql import functions as F

    from kafka_merge_purge_spark.sources.batch import epoch_to_micros_expr

    ns_1971 = 31_536_000_000_000_000  # 1971-01-01 in nanos — sniff misreads
    df = spark.createDataFrame([(ns_1971,)], "ts long")
    fixed = df.select(F.expr(epoch_to_micros_expr("ts", "ns")).alias("t")).first()["t"]
    assert fixed.year == 1971
    sniffed = df.select(F.expr(epoch_to_micros_expr("ts")).alias("t")).first()["t"]
    assert sniffed.year != 1971  # documents WHY the explicit scale exists
    # in-window instants agree across all three declared scales
    us_2024 = 1_704_067_200_000_000
    df24 = spark.createDataFrame(
        [(us_2024 * 1000, us_2024, us_2024 // 1000)], "ns long, us long, ms long"
    )
    row = df24.select(
        F.expr(epoch_to_micros_expr("ns", "ns")).alias("a"),
        F.expr(epoch_to_micros_expr("us", "us")).alias("b"),
        F.expr(epoch_to_micros_expr("ms", "ms")).alias("c"),
        F.expr(epoch_to_micros_expr("us")).alias("d"),
    ).first()
    assert row["a"] == row["b"] == row["c"] == row["d"]
