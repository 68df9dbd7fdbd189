"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata — the raw⊕decoded pattern of the reference's
MixedValue (MixedValue.kt:13: raw bytes canonical, decoded view derived,
sink writes raw — see model.py).

The decode/feature-extract kernels are STUBBED (image/audio libraries are
not in this container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature so
the Spark-side plumbing — schema, Arrow batching via mapInPandas,
partition flow — is real and testable.

At 100 TB: binary payloads ride in parquet with large row groups; the
mapInPandas decode is the canonical pattern (per-partition Arrow batches
into Python, vectorized library calls, typed struct/array output), and
``spark.sql.files.maxPartitionBytes`` bounds the per-task batch footprint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata sidecar: media kind + container format + declared dimensions
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),     # image|audio|video
        T.StructField("format", T.StringType(), True),    # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),   # raw bytes, canonical
        T.StructField("meta", MEDIA_META_SCHEMA, True),   # decoded view, derived
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, payload_md5 string, feature array<float>"
)


def attach_meta(df: DataFrame, kind: str, fmt: str | None = None) -> DataFrame:
    """Wrap a (media_id, payload) frame with the typed metadata struct."""
    return df.select(
        "media_id",
        "payload",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes → dim floats."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 1000
    return [v / 1000.0 for v in acc]


def extract_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    ``fake=False`` marks where a real decoder (PIL/librosa/ffmpeg) plugs
    in; this container has none, so it raises — the STUB boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not present "
                    "in this environment; run with fake=True for the plumbing path"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)),
                    "payload_md5": payloads.map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda p: _fake_feature(p, dim)),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp,
    computed from declared duration (decode itself is the stub above).
    Demonstrates the explode-based fan-out shape a real sampler uses."""
    # floor, not cast: DuckDB's CAST(x AS INT) rounds while Spark's
    # truncates — floor() agrees everywhere for the oracle twin
    n_frames = F.greatest(
        F.floor(F.col("meta.duration_ms") / every_ms).cast("long"), F.lit(1).cast("long")
    )
    return df.filter(F.col("meta.kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("sample_at_ms", F.col("frame_idx") * every_ms)
