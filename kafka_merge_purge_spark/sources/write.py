"""Batch sinks (SURVEY §2.2 sinks row): parquet/CSV/JSON writers with the
file-layout controls that matter at 100 TB.

Partitioned parquet is the canonical lake sink: ``partitionBy`` gives
partition pruning to every downstream scan; ``maxRecordsPerFile`` bounds
file sizes without a repartition; ``sortWithinPartitions`` clusters rows
for min/max page skipping (the parquet analog of the reference's
partition-preserving purge writes, Pipeline.kt:97).

Kafka/console/memory sinks live in streaming/ (foreachBatch, observe) and
sources/kafka.py (``to_kafka_sink_frame`` for the binary sink contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    sort_within: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a partitioned, optionally clustered parquet dataset.

    ``partition_by`` columns become directory partitions (prunable);
    ``sort_within`` clusters rows inside each task's files so column
    min/max statistics actually skip pages; ``max_records_per_file``
    caps file size in lieu of a shuffle.
    """
    out = df.sortWithinPartitions(*sort_within) if sort_within else df
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(header="true", **options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    sort_within: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """ORC sink with the same layout controls as ``write_parquet``
    (directory partitions prune; in-task sort clusters rows for ORC's
    min/max stripe skipping)."""
    out = df.sortWithinPartitions(*sort_within) if sort_within else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
