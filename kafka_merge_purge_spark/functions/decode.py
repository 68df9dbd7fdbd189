"""Payload decoders — the pluggable-deserializer surface (R2).

The reference decodes for display only and always sinks raw bytes
(MixedValue.kt:27-81); these helpers are the Spark expression twins:
each returns a *derived* column, never mutating the raw payload column.

- string/JSON/CSV decode: always available (built-in expressions).
- Avro decode (the reference's ``-A``/``-a`` flags, Factory.kt:59-65):
  two tiers.  The JVM fast path (``decode_avro`` → ``from_avro``) needs
  the ``spark-avro`` module, which this container's pyspark
  distribution does not bundle (only avro-core jars) — on a real
  deployment: ``spark-submit --packages
  org.apache.spark:spark-avro_2.13:<spark-version>``.  The
  dependency-free fallback (``decode_avro_py`` → functions/avro_py.py)
  decodes the Avro binary spec in an Arrow-batched pandas UDF and is
  always available, so the Avro delegate is executable and tested even
  in minimal environments.

Confluent wire format: a Schema-Registry-encoded payload is
``magic(1B=0x00) | schema_id(4B big-endian) | avro body`` — ``from_avro``
must see only the body, hence the 5-byte strip (SURVEY §7 hard parts).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

CONFLUENT_PREFIX_BYTES = 5


def decode_string(payload: Column) -> Column:
    """Default delegate: UTF-8 string view (Factory.kt:49-50)."""
    return payload.cast("string")


def decode_json(payload: Column, schema: str) -> Column:
    """JSON delegate: typed struct view."""
    return F.from_json(payload.cast("string"), schema)


def decode_csv(payload: Column, schema: str) -> Column:
    """CSV delegate: positional typed view."""
    return F.from_csv(payload.cast("string"), F.lit(schema))


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro module is on the classpath."""
    try:
        spark._jvm.org.apache.spark.sql.avro.functions  # type: ignore[union-attr]
        jvm_class = spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return jvm_class is not None
    except Exception:
        return False


def confluent_avro_body(payload: Column) -> Column:
    """Strip the 5-byte Confluent wire-format prefix → raw Avro body."""
    return F.substring(payload, CONFLUENT_PREFIX_BYTES + 1, 2_147_483_647)


def confluent_schema_id(payload: Column) -> Column:
    """The big-endian int32 schema id from bytes 2-5 of the wire format."""
    byte_at = lambda i: F.conv(F.hex(F.substring(payload, 2 + i, 1)), 16, 10).cast("long")  # noqa: E731
    out = F.lit(0).cast("long")
    for i in range(4):
        out = out + F.shiftleft(byte_at(i), 8 * (3 - i))
    return out.alias("schema_id")


def decode_avro(payload: Column, avro_schema_json: str, confluent: bool = True) -> Column:
    """Avro delegate (gated): decoded struct view of the payload.

    Raises RuntimeError with the deploy instruction when spark-avro is
    absent — the same opt-in boundary as the reference's ``-A`` flag.
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover - import is bundled with pyspark
        raise RuntimeError("pyspark.sql.avro not importable") from e
    body = confluent_avro_body(payload) if confluent else payload
    return from_avro(body, avro_schema_json)


def decode_avro_py(
    payload: Column, avro_schema_json: str, spark_schema: str, confluent: bool = True
) -> Column:
    """Avro delegate, dependency-free tier: pure-Python binary decode
    (functions/avro_py.py) to a JSON view, then ``from_json`` to the
    typed struct.  Slower than the JVM ``from_avro`` path but always
    available; use when spark-avro is not on the classpath."""
    from kafka_merge_purge_spark.functions.avro_py import avro_to_json_udf

    udf = avro_to_json_udf(avro_schema_json, confluent=confluent)
    return F.from_json(udf(payload), spark_schema)


def decode_avro_registry(
    payload: Column, registry, spark_schema: str, reader_schema: str | None = None
) -> Column:
    """Avro delegate with dynamic writer-schema resolution: each
    Confluent-wire payload's writer schema comes from the registry via
    its embedded id (Factory.kt:59-65 semantics), resolved to
    ``reader_schema`` when given so evolving writers still produce one
    stable typed view.  Dependency-free tier (functions/avro_py.py)."""
    from kafka_merge_purge_spark.functions.avro_py import avro_registry_to_json_udf

    udf = avro_registry_to_json_udf(registry, reader_schema)
    return F.from_json(udf(payload), spark_schema)
