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
- ``transactional_kafka_batch_fn``: the real Kafka version — one fenced
  producer transaction per micro-batch (begin → send →
  sendOffsetsToTransaction → commit, abort on error), with the wire
  client injectable; only the client library/broker is environment-gated.
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


class TransactionAborted(RuntimeError):
    """Raised after a failed batch was aborted (original error chained)."""


def _kafka_python_producer_factory(bootstrap_servers: str, extra_config: dict | None = None):
    """Producer factory backed by kafka-python, gated at construction:
    the transaction *logic* below is real and unit-tested against a fake;
    only the wire client needs the library + a broker
    (acks=all + enable.idempotence=true per reference Factory.kt:85-86).
    """
    try:
        from kafka import KafkaProducer  # type: ignore[import-not-found]
    except ImportError as exc:  # container has no client lib
        raise NotImplementedError(
            "transactional Kafka sink needs a Kafka client library on the "
            "driver (pip install kafka-python) and a reachable broker; the "
            "transaction protocol itself is implemented and tested against "
            "a fake producer (tests/test_sink_transactions.py)"
        ) from exc

    def factory(transactional_id: str):
        return _KafkaPythonTxAdapter(
            KafkaProducer(
                bootstrap_servers=bootstrap_servers,
                transactional_id=transactional_id,
                acks="all",
                enable_idempotence=True,
                **(extra_config or {}),
            )
        )

    return factory


class _KafkaPythonTxAdapter:
    """Adapts kafka-python's ``KafkaProducer`` to the protocol
    ``_run_transaction`` speaks.  The one semantic conversion:
    ``send_offsets_to_transaction`` takes ``{TopicPartition:
    OffsetAndMetadata}`` (Pipeline.kt:43,49-52), not the plain
    ``{(topic, partition): offset}`` map the transaction loop builds."""

    def __init__(self, producer):
        self._p = producer

    def init_transactions(self):
        self._p.init_transactions()

    def begin_transaction(self):
        self._p.begin_transaction()

    def send(self, topic, partition=None, key=None, value=None, headers=None):
        return self._p.send(
            topic, partition=partition, key=key, value=value, headers=headers
        )

    def send_offsets_to_transaction(self, offsets, group_id):
        from kafka import TopicPartition
        from kafka.structs import OffsetAndMetadata

        converted = {}
        for (topic, partition), off in offsets.items():
            try:  # kafka-python >= 2.1 adds leader_epoch
                meta = OffsetAndMetadata(off, "", -1)
            except TypeError:
                meta = OffsetAndMetadata(off, "")
            converted[TopicPartition(topic, partition)] = meta
        self._p.send_offsets_to_transaction(converted, group_id)

    def commit_transaction(self):
        self._p.commit_transaction()

    def abort_transaction(self):
        self._p.abort_transaction()


def transactional_kafka_batch_fn(
    bootstrap_servers: str,
    transactional_id: str,
    producer_factory=None,
    group_id: str = "kafka-merge-purge-spark",
    no_commit: bool = False,
):
    """Kafka twin of the reference's R12 path (Pipeline.kt:22-26,54-74):
    one producer transaction per micro-batch —

        init_transactions → begin_transaction → send every record →
        send_offsets_to_transaction(max offset per source partition) →
        commit_transaction, abort_transaction on ANY error (re-raised)

    ``transactional.id`` is ``{transactional_id}-{batch_id}``: a replayed
    batch re-uses the id, so the broker fences the zombie attempt — the
    Kafka-native analog of ``exactly_once_parquet_sink``'s rename commit.
    ``no_commit`` mirrors the reference's ``--no-commit`` (Pipeline.kt:
    55-57 guard): produce transactionally but never advance the source
    offsets.

    Expects routed frames (operators/routing.py): columns ``topic,
    partition, key, value`` (+ optional ``headers``, ``src_offset``).
    Rows stream through ``toLocalIterator`` — bounded driver memory, one
    producer, one transaction per batch, exactly the reference's unit of
    atomicity.  A transaction cannot span processes in Kafka's model, so
    the *distributed* variant is transaction-per-partition via
    ``foreachPartition`` (same protocol, one fenced producer per task,
    exactly-once per partition); this driver-side form is wire-compatible
    with the reference's single-producer semantics.

    ``producer_factory(transactional_id) -> producer`` is injectable for
    tests and alternative clients; it defaults to kafka-python (gated on
    the library's presence).
    """
    if producer_factory is None:
        producer_factory = _kafka_python_producer_factory(bootstrap_servers)

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        producer = producer_factory(f"{transactional_id}-{batch_id}")
        _run_transaction(producer, df.toLocalIterator(), df.columns, offsets_group=None if no_commit else group_id, batch_id=batch_id)

    return batch_fn


def _run_transaction(producer, rows, cols, offsets_group, batch_id) -> tuple[int, dict]:
    """One full producer transaction over an iterator of routed rows:
    init → begin → send each → sendOffsets(max per src partition) →
    commit; abort + TransactionAborted on any error.  Shared by the
    driver-side batch form and the per-partition distributed form."""
    producer.init_transactions()
    producer.begin_transaction()
    offsets: dict[tuple[str, int], int] = {}
    n = 0
    has_src = "src_topic" in cols and "src_partition" in cols
    try:
        for row in rows:
            producer.send(
                topic=row["topic"],
                partition=row["partition"],
                key=row["key"],
                value=row["value"],
                headers=row["headers"] if "headers" in cols else None,
            )
            n += 1
            if "src_offset" in cols:
                # offsets are committed for the CONSUMED topic/partition
                # (Pipeline.kt:49-52) — a merge leg re-topiced to the
                # destination still advances its *source* partition
                tp = (
                    (row["src_topic"], row["src_partition"])
                    if has_src
                    else (row["topic"], row["partition"])
                )
                off = row["src_offset"]
                if off is not None:
                    offsets[tp] = max(offsets.get(tp, -1), off)
        if offsets_group is not None:
            producer.send_offsets_to_transaction(offsets, offsets_group)
        producer.commit_transaction()
        return n, offsets
    except Exception as exc:
        producer.abort_transaction()
        raise TransactionAborted(f"batch {batch_id} aborted: {exc}") from exc


def transactional_kafka_partition_fn(
    bootstrap_servers: str,
    transactional_id: str,
    producer_factory=None,
    group_id: str = "kafka-merge-purge-spark",
    no_commit: bool = False,
):
    """Distributed variant of ``transactional_kafka_batch_fn``: one fenced
    producer transaction PER PARTITION per micro-batch, executed on the
    executors (``mapPartitionsWithIndex`` — the rare case that genuinely
    needs per-partition imperative logic).

    Kafka transactions cannot span producers, so a cross-executor batch
    cannot be one atomic unit; exactly-once *per partition* is the
    strongest distributed guarantee the broker model offers.  Fencing id
    is ``{transactional_id}-{batch_id}-p{partition_index}`` — a replayed
    batch reuses every partition's id, so each zombie task is fenced
    independently.  The returned ``batch_fn`` yields per-partition
    summaries ``(partition_index, records_sent, committed)`` collected to
    the driver — rows, not payloads, so the driver never sees the data.
    """
    if producer_factory is None:
        producer_factory = _kafka_python_producer_factory(bootstrap_servers)

    def batch_fn(df: DataFrame, batch_id: int):
        cols = df.columns
        factory = producer_factory
        gid = None if no_commit else group_id

        def run_partition(idx: int, rows):
            it = iter(rows)
            try:
                first = next(it)
            except StopIteration:
                return  # empty partition: no producer, no transaction
            import itertools

            producer = factory(f"{transactional_id}-{batch_id}-p{idx}")
            n, _ = _run_transaction(
                producer, itertools.chain([first], it), cols, gid, batch_id
            )
            yield (idx, n, True)

        return (
            df.rdd.mapPartitionsWithIndex(run_partition, preservesPartitioning=True)
            .collect()
        )

    return batch_fn
