"""Exactly-once-style sinks for ``foreachBatch``.

The reference's transactional path (R12, Pipeline.kt:54-59) is:
begin → send all → sendOffsetsToTransaction → commit, abort on error —
i.e. *output and progress commit atomically*.  Structured Streaming's
checkpoint already makes progress durable per batch; what remains is an
idempotent/atomic batch write so replays of a failed batch can't double-
produce.  Two implementations:

- ``exactly_once_parquet_sink``: stage batch output to a temp dir, then
  atomically rename to ``batch_id=N``; a replayed batch sees the final
  dir and skips.  (File-system twin of the producer transaction.)
- ``transactional_kafka_batch_fn``: the shape of the real Kafka version —
  transactional producer keyed by (group, batchId); requires a broker +
  kafka-python, so it is a documented stub here.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame


def exactly_once_parquet_sink(out_dir: str):
    """Return a ``batch_fn(df, batch_id)`` writing each micro-batch to
    ``{out_dir}/batch_id=N`` idempotently (skip if committed), so a
    checkpoint replay cannot double-write — the R12 guarantee on files."""
    out = Path(out_dir)

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        final = out / f"batch_id={batch_id}"
        if final.exists():  # replay of a committed batch → no-op
            return
        staging = out / f"_staging_batch_{batch_id}"
        if staging.exists():
            shutil.rmtree(staging)  # leftover from an aborted attempt
        df.write.mode("overwrite").parquet(str(staging))
        staging.rename(final)  # atomic commit point

    return batch_fn


def transactional_kafka_batch_fn(bootstrap_servers: str, transactional_id: str):
    """Kafka twin of the reference's R12 path (Pipeline.kt:22-26,54-59):
    one producer transaction per micro-batch, ``transactional.id`` =
    ``{id}-{batchId}`` for zombie fencing, abort on error.  Needs a broker
    and a Kafka client lib — not available in this container."""

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        raise NotImplementedError(
            "transactional Kafka sink requires a broker + client library; "
            "deploy with spark-sql-kafka and a foreachPartition producer "
            f"(transactional.id={transactional_id!r}-{{batch_id}}, acks=all, "
            "enable.idempotence=true per reference Factory.kt:85-86)"
        )

    return batch_fn
