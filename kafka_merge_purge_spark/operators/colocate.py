"""Co-located (bucketed) joins — the repeated-join scale path.

A join between two tables bucketed on the join key with the same bucket
count needs NO exchange: each task reads matching bucket files from
both sides (hash-partitioned at write time) and joins locally.  At
100 TB this converts every recurring fact⋈fact or fact⋈big-dim join
from a full shuffle of both sides into a metadata operation — the
write-once-join-many trade the reference's single-pass loop can never
make.

``write_bucketed`` persists a frame as a bucketed+sorted managed table;
``bucketed_join`` joins two such tables and (with
``spark.sql.sources.bucketing.enabled``, on by default) produces a
SortMergeJoin whose both sides scan bucket files directly —
``tests/test_colocate.py`` asserts the plan has zero Exchange nodes.

Sizing guidance at scale: choose ``n_buckets`` so a single bucket of
the larger table fits one task comfortably (e.g. ~128-512 MB of
parquet); both sides MUST use the same count or Spark falls back to a
shuffle on the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on ``key``.

    Sorting within buckets lets the downstream SortMergeJoin skip its
    sort stage entirely — the on-disk order IS the join order.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — exchange-free."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
