"""Batch sources.

The reference's source is a bounded read of a Kafka topic — subscribe,
poll until the first empty batch (Pipeline.kt:28-76).  The batch analog is
a columnar snapshot scan; parquet is canonical here, with CSV/JSON readers
for parity of surface.  All reads go through ``spark.read`` so Catalyst
gets predicate pushdown + column pruning for free (check with
``plans.introspect.scan_info``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Normalize an epoch-integer column of unknown scale (ns/µs/ms) to a
#: µs timestamp.  The batch reader (nanosAsLong) surfaces true nanos,
#: but a readStream with a user-declared ``ts long`` schema gets the
#: column pre-scaled to micros by the parquet reader — so a fixed
#: ``DIV 1000`` silently lands in 1970 on one of the two paths.  The
#: magnitude cutoffs are unambiguous for any instant between 1973 and
#: 5138 CE, so one expression serves both.
EPOCH_TO_MICROS = (
    "timestamp_micros(CAST(CASE"
    " WHEN {c} >= 100000000000000000 THEN {c} DIV 1000"  # nanos
    " WHEN {c} >= 100000000000000 THEN {c}"  # micros
    " ELSE {c} * 1000 END AS LONG))"  # millis
)

#: fixed-scale conversions for when the source scale is KNOWN.  The
#: magnitude sniff above misclassifies nano/micro epochs before ~1973 and
#: treats all pre-1970 (negative) values as millis; callers with real
#: historical data should thread the scale explicitly (r3 ADVICE).
EPOCH_FIXED_SCALES = {
    "ns": "timestamp_micros(CAST({c} DIV 1000 AS LONG))",
    "us": "timestamp_micros(CAST({c} AS LONG))",
    "ms": "timestamp_micros(CAST({c} * 1000 AS LONG))",
}


def epoch_to_micros_expr(col: str, scale: str | None = None) -> str:
    """SQL expression converting an epoch-integer column to a µs
    timestamp: fixed conversion when ``scale`` ∈ {ns, us, ms} is known,
    magnitude sniffing (1973–5138 CE window) when ``None``."""
    if scale is None:
        return EPOCH_TO_MICROS.format(c=col)
    return EPOCH_FIXED_SCALES[scale].format(c=col)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, ts_scale: str | None = None
) -> DataFrame:
    """Load one synthetic table (TESTDATA.md) as a DataFrame.

    ``events.ts`` is nanosecond-precision parquet, which Spark 4 rejects
    by default; read it as long nanos (legacy conf, safe to set at
    runtime) and truncate to a microsecond timestamp — the same µs
    truncation DuckDB applies, so both engines see identical instants.
    ``ts_scale`` pins the epoch scale ("ns"/"us"/"ms") for sources whose
    instants may fall outside the magnitude sniff's 1973–5138 window.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(epoch_to_micros_expr("ts", ts_scale)))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options) -> DataFrame:
    reader = spark.read.options(header="true", **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    """ORC batch scan (native Spark datasource — no extra jar): same
    pushdown posture as the parquet path (predicate + column pruning
    reach the ORC reader; plan-pinned in tests/test_sources.py)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
