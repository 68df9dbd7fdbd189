"""As-of (merge-asof) join: for each left row, the most recent right row
with ``right.ts <= left.ts`` within the same key.

Spark has no built-in as-of join.  The naive formulations both fail at
scale: a range join explodes to O(|L|·|R|) pairs, and a per-key
``applyInPandas`` ships whole keys through Python.  The union+window
formulation used here stays JVM-side with exactly ONE shuffle (on the
key) and linear state:

    1. tag right rows 0, left rows 1;
    2. union on (key, ts, tag, payload-side columns);
    3. ``last(right_value, ignorenulls=True)`` over
       (partition by key order by ts, tag, tie) ROWS UNBOUNDED PRECEDING;
    4. keep tag=1 rows — each now carries the latest right value at-or-
       before its timestamp (tag order makes right rows at equal ts
       visible to left rows, i.e. inclusive semantics).

Skewed keys degrade like any window (AQE can't split a window
partition); salt the key upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEFT, _RIGHT = 1, 0


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: tuple[str, ...],
    tie_col: str | None = None,
) -> DataFrame:
    """Return ``left`` with ``value_cols`` from the latest ``right`` row
    at-or-before each left timestamp (NULLs where no such row exists).

    ``tie_col`` breaks ordering ties among right rows with equal
    timestamps deterministically (defaults to the first value column).
    """
    tie = tie_col or value_cols[0]
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(_LEFT).alias("_tag"),
        F.lit(None).cast(right.schema[tie].dataType).alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.struct(*left.columns).alias("_row"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(_RIGHT).alias("_tag"),
        F.col(tie).alias("_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(left.select(F.struct(*left.columns)).schema[0].dataType).alias("_row"),
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "_tag",
        "_row",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    out = filled.filter(F.col("_tag") == _LEFT).select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in value_cols],
    )
    return out
