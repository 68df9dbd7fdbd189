"""Dependency-free Avro binary decoder (fallback delegate for R2).

The container bundles neither the spark-avro datasource nor any Python
Avro library, but the Avro *binary encoding* itself is a small public
spec (zigzag-varint ints/longs, little-endian IEEE floats,
length-prefixed bytes/strings, records as field concatenation, blocked
arrays/maps, unions as a branch-index prefix).  This module implements
the decoder for that spec so the reference's Avro deserializer path
(Factory.kt:59-65, CLI.kt:118-138) is *executable* here, not just
gated:

- ``decode_binary(buf, schema)`` — one datum from Avro binary.
- ``avro_to_json_udf(schema_json, confluent=True)`` — an Arrow-batched
  pandas UDF decoding a binary payload column to a JSON string view
  (compose with ``F.from_json`` for a typed struct), stripping the
  Confluent 5-byte wire prefix when asked.

Production posture unchanged: with spark-avro on the classpath,
``decode.decode_avro`` (JVM ``from_avro``) is the fast path; this
decoder is the correctness twin that keeps the feature testable in
minimal environments.  Supported: null, boolean, int, long, float,
double, bytes, string, record, enum, array, map, union, fixed.
Schema resolution/evolution (reader≠writer schema) is out of scope.
"""

from __future__ import annotations

import json
import struct
from typing import Any

import pandas as pd

__all__ = ["decode_binary", "avro_to_json_udf", "parse_schema"]


def parse_schema(schema: str | dict | list) -> dict | list | str:
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith(("{", "[")):
            return json.loads(s)
        return json.loads(f'"{s}"') if not s.startswith('"') else json.loads(s)
    return schema


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise ValueError("avro: truncated input")
        self.pos += n
        return b

    def read_long(self) -> int:
        # zigzag varint (spec: int and long share the encoding); a long
        # needs at most 10 bytes — reject longer runs as malformed input
        shift, acc = 0, 0
        while True:
            (byte,) = self.read(1)
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("avro: varint too long (malformed input)")
        return (acc >> 1) ^ -(acc & 1)

    def read_len(self) -> int:
        # lengths (bytes/string/map-key) and union branch indexes must be
        # non-negative: buf[pos:pos+n] with n<0 silently returns empty
        # data and moves pos BACKWARD, decoding garbage instead of failing
        n = self.read_long()
        if n < 0:
            raise ValueError(f"avro: negative length/index {n} (malformed input)")
        return n


def _decode(r: _Reader, schema: Any, names: dict[str, Any]) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read(r.read_len())
        if t == "string":
            return r.read(r.read_len()).decode("utf-8")
        if t in names:  # named-type reference
            return _decode(r, names[t], names)
        raise ValueError(f"avro: unknown type {t!r}")
    if isinstance(schema, list):  # union: branch index then datum
        branch = r.read_len()
        if branch >= len(schema):
            raise ValueError(f"avro: union branch {branch} out of range (malformed input)")
        return _decode(r, schema[branch], names)
    t = schema["type"]
    if t in ("record", "error"):
        names[schema["name"]] = schema
        return {f["name"]: _decode(r, f["type"], names) for f in schema["fields"]}
    if t == "enum":
        names[schema["name"]] = schema
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        names[schema["name"]] = schema
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_len()).decode("utf-8")
                out[k] = _decode(r, schema["values"], names)
        return out
    # schemas like {"type": "string"} wrap a primitive
    return _decode(r, t, names)


def decode_binary(buf: bytes, schema: str | dict | list) -> Any:
    """Decode one Avro-binary datum against its writer schema."""
    return _decode(_Reader(bytes(buf)), parse_schema(schema), {})


def _jsonable(v: Any) -> Any:
    if isinstance(v, bytes):
        return v.decode("latin-1")  # byte-preserving textual view
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def avro_to_json_udf(schema_json: str, confluent: bool = True):
    """Arrow-batched pandas UDF: binary Avro payload → JSON string view.

    Tombstones (NULL payloads) stay NULL.  Compose with ``from_json``
    for a typed struct; raw bytes are never mutated (R2 invariant).
    """
    from pyspark.sql.functions import pandas_udf

    schema = parse_schema(schema_json)
    skip = 5 if confluent else 0  # magic 0x00 + 4-byte schema id

    @pandas_udf("string")
    def _decode_series(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda b: None
            if b is None
            else json.dumps(
                _jsonable(decode_binary(bytes(b)[skip:], schema)),
                separators=(",", ":"),
                sort_keys=True,
            )
        )

    return _decode_series
