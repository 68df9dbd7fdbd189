"""Round-trip tests for the dependency-free Avro binary decoder.

The encoder lives here in the test (zigzag varints + length prefixes,
straight from the public spec) so the decoder is checked against
independently-constructed bytes, not against itself.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import functions as F

from kafka_merge_purge_spark.functions.avro_py import (
    avro_to_json_udf,
    decode_binary,
)


def zz(n: int) -> bytes:
    """Avro zigzag-varint encode."""
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_str(s: str) -> bytes:
    b = s.encode()
    return zz(len(b)) + b


RECORD_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "maybe", "type": ["null", "int"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
            {"name": "color", "type": {"type": "enum", "name": "Color", "symbols": ["RED", "GREEN"]}},
        ],
    }
)


def encode_event(id_, name, score, flag, maybe, tags, attrs, color_idx) -> bytes:
    out = bytearray()
    out += zz(id_)
    out += enc_str(name)
    out += struct.pack("<d", score)
    out += b"\x01" if flag else b"\x00"
    if maybe is None:
        out += zz(0)
    else:
        out += zz(1) + zz(maybe)
    if tags:
        out += zz(len(tags))
        for t in tags:
            out += enc_str(t)
    out += zz(0)  # array terminator (empty array = single 0 block)
    if attrs:
        out += zz(len(attrs))
        for k, v in attrs.items():
            out += enc_str(k) + zz(v)
    out += zz(0)  # map terminator
    out += zz(color_idx)
    return bytes(out)


def test_decode_record_all_types():
    buf = encode_event(42, "héllo", 2.5, True, 7, ["a", "bb"], {"k": 9}, 1)
    got = decode_binary(buf, RECORD_SCHEMA)
    assert got == {
        "id": 42,
        "name": "héllo",
        "score": 2.5,
        "flag": True,
        "maybe": 7,
        "tags": ["a", "bb"],
        "attrs": {"k": 9},
        "color": "GREEN",
    }


def test_decode_union_null_and_negative_varint():
    buf = encode_event(-3, "", -1.0, False, None, [], {}, 0)
    got = decode_binary(buf, RECORD_SCHEMA)
    assert got["id"] == -3 and got["maybe"] is None and got["tags"] == []
    assert got["attrs"] == {} and got["color"] == "RED"


def test_decode_primitives_and_fixed():
    assert decode_binary(zz(123456789), "long") == 123456789
    assert decode_binary(struct.pack("<f", 1.5), "float") == 1.5
    assert decode_binary(enc_str("x"), "string") == "x"
    assert decode_binary(b"\x04\xff\x00", "bytes") == b"\xff\x00"
    fixed = json.dumps({"type": "fixed", "name": "F4", "size": 4})
    assert decode_binary(b"\x01\x02\x03\x04", fixed) == b"\x01\x02\x03\x04"


def test_truncated_input_raises():
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        decode_binary(b"", "double")


def test_avro_udf_with_confluent_prefix(spark):
    payloads = [
        b"\x00\x00\x00\x00\x07" + encode_event(1, "a", 0.5, True, None, ["t"], {}, 0),
        b"\x00\x00\x00\x00\x07" + encode_event(2, "b", 1.5, False, 3, [], {"z": 1}, 1),
        None,  # tombstone stays NULL
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "value binary")
    udf = avro_to_json_udf(RECORD_SCHEMA, confluent=True)
    typed = df.select(
        F.from_json(udf(F.col("value")), "id long, name string, color string").alias("d")
    ).select("d.*")
    rows = typed.collect()
    assert [(r["id"], r["name"], r["color"]) for r in rows[:2]] == [
        (1, "a", "RED"),
        (2, "b", "GREEN"),
    ]
    assert rows[2]["id"] is None


def test_malformed_varint_rejected():
    import pytest

    with pytest.raises(ValueError, match="varint too long"):
        decode_binary(b"\xff" * 11, "long")


def test_negative_length_rejected():
    # zigzag(-3) = 0x05: a negative bytes/string length would slice
    # backwards and decode garbage — must raise instead
    import pytest

    with pytest.raises(ValueError, match="negative length"):
        decode_binary(b"\x05abc", "string")
    with pytest.raises(ValueError, match="negative length"):
        decode_binary(b"\x05abc", "bytes")
    with pytest.raises(ValueError, match="negative length|out of range"):
        decode_binary(b"\x05", json.dumps(["null", "long"]))
    with pytest.raises(ValueError, match="out of range"):
        decode_binary(b"\x04", json.dumps(["null", "long"]))  # branch 2 of 2
