"""Decoder surface (R2): string/JSON/CSV delegates always-on; Avro
gated on spark-avro availability (absent in this container — the wire
format parsing is testable regardless)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_merge_purge_spark.functions import decode


def test_string_json_csv_decodes(spark):
    df = spark.createDataFrame(
        [(1, b'{"k": 7}'), (2, b"9,abc")], "id long, payload binary"
    )
    out = df.select(
        "id",
        decode.decode_string(F.col("payload")).alias("s"),
        decode.decode_json(F.col("payload"), "k INT").getField("k").alias("k"),
        decode.decode_csv(F.col("payload"), "a INT, b STRING").alias("c"),
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[1]["s"] == '{"k": 7}' and rows[1]["k"] == 7
    assert rows[2]["c"]["a"] == 9 and rows[2]["c"]["b"] == "abc"


def test_confluent_wire_format_parsing(spark):
    # magic 0x00 | schema id 0x00000315 (=789) | body b"avro-body"
    payload = bytes([0x00, 0x00, 0x00, 0x03, 0x15]) + b"avro-body"
    df = spark.createDataFrame([(1, payload)], "id long, payload binary")
    row = df.select(
        decode.confluent_avro_body(F.col("payload")).alias("body"),
        decode.confluent_schema_id(F.col("payload")).alias("sid"),
    ).collect()[0]
    assert bytes(row["body"]) == b"avro-body"
    assert row["sid"] == 789


def test_avro_decode_gated(spark):
    if decode.avro_available(spark):
        pytest.skip("spark-avro present; gate test is for its absence")
    df = spark.createDataFrame([(1, b"\x00\x00\x00\x00\x01xx")], "id long, payload binary")
    schema = '{"type": "record", "name": "r", "fields": [{"name": "f", "type": "int"}]}'
    with pytest.raises(Exception):
        # from_avro constructs but fails at analysis/execution without the
        # AvroDataToCatalyst class — either way the surface is gated
        df.select(decode.decode_avro(F.col("payload"), schema)).collect()
