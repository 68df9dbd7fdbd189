"""Vector math over ``array<float>`` embedding columns — JVM-side only.

All three helpers compose ``zip_with`` / ``aggregate`` higher-order
functions, so the arithmetic stays inside whole-stage codegen: no Python,
no Arrow transfer, per-element double math with a deterministic
left-to-right fold (which also makes results reproducible across engines
— DuckDB's list_dot_product folds the same way on DOUBLE[]).

At 100 TB: these are narrow per-row expressions; the expensive part of
similarity search is the pairing strategy (see operators/similarity.py),
never this math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right double fold (deterministic)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); NULL-safe on zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def drop_null_vectors(df, vec_col: str = "embedding"):
    """Drop rows whose vector is NULL — the entry contract of every
    vector operator (a missing embedding has no geometry: under SQL null
    semantics any distance to it is NULL, i.e. never a candidate).  The
    filter pushes into the parquet scan (IsNotNull)."""
    from pyspark.sql import functions as F

    return df.filter(F.col(vec_col).isNotNull())


def dimension_stats(
    df,
    vec_col: str = "embedding",
):
    """Per-dimension corpus statistics of an embedding column — the
    embedding-QA primitive (dead/saturated dimensions, scale drift
    between ingest batches): for each vector position (1-based), count,
    mean and sample variance plus min/max.

    Engine-portable: moments derive from the repo's decimal-stable
    Σx / Σx² sums (the q_stats_agg convention — order-independent, so
    the one float division per output is bit-identical in the oracle);
    min/max are pure selections rounded to 6.  The moment sums use the
    FINE decimal scale (DECIMAL(28,12), stable.dsum_fine): unit-norm
    embedding components are ~1e-2 and their squares ~1e-4, which the
    coarse 1e-4 grid of dsum would quantize to zero — inverting the
    dead/drifting-dimension signal this function exists to surface.
    Sample variance is an explicit NULL when n <= 1 (no silent
    DIVIDE_BY_ZERO under Spark 4's ANSI default, no engine-dependent
    NULL-vs-error divergence).

    Scale shape: posexplode → ONE map-side-combined aggregate keyed by
    the (tiny) dimension index; the exchange carries dim × partials,
    never the corpus."""
    from pyspark.sql import functions as F

    from kafka_merge_purge_spark.functions.stable import dsum_fine

    exploded = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos0", "_x")
        )
        .select((F.col("pos0") + 1).alias("pos"), "_x")
    )
    g = exploded.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        dsum_fine("_x", "s"),
        dsum_fine(F.col("_x") * F.col("_x"), "s2"),
        F.round(F.min("_x"), 6).alias("min_value"),
        F.round(F.max("_x"), 6).alias("max_value"),
    )
    n, sx, sxx = F.col("n"), F.col("s"), F.col("s2")
    return g.select(
        "pos",
        "n",
        F.round(sx / n, 6).alias("mean"),
        F.when(
            n > 1, F.round((sxx - sx * sx / n) / (n - F.lit(1)), 6)
        ).alias("variance"),
        "min_value",
        "max_value",
    )
