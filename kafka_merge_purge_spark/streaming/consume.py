"""Driver-side consume loop — the wire-protocol twin of the reference's
``Pipeline.processTopic`` (Pipeline.kt:28-76).

The DataFrame path (sources/kafka.py readers + streaming/pipeline.py)
is the *scalable* form of the read side; what it cannot show is the
client protocol order — subscribe → poll-until-empty → per batch:
begin transaction → process each record → offsets keyed by the
consumed (topic, partition) → sendOffsetsToTransaction → commit, abort
and re-raise on any error, consumer closed on the way out (``use`` in
Pipeline.kt:32).  This module is that loop verbatim over injectable
consumer/producer protocols, so the read path has the same
protocol-order evidence the write path gets from
tests/test_sink_transactions.py.

Record shape: plain dicts ``{topic, partition, offset, key, value}``
(+ optional ``headers``) — the same columns the routed frames carry.
``process(record) -> list[output dict]`` returns the records to
produce; ``merge_all_record_fn``/``purge_all_record_fn`` are the
per-record twins of operators/routing.py's frame transforms and are
equivalence-tested against them.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable


def merge_all_record_fn(
    dest_topic: str, merge_tombstones: bool = False
) -> Callable[[dict], list[dict]]:
    """Per-record twin of ``routing.merge_all`` (MergeAll.kt:31-61):
    live records produce a merge output to ``dest_topic`` (partition
    left to the partitioner) plus a purge tombstone back to the source
    partition; tombstones are dropped unless ``merge_tombstones``
    forwards them on the merge leg; the purge leg never re-tombstones
    (Pipeline.kt:93-95)."""

    def process(rec: dict) -> list[dict]:
        is_tomb = rec["value"] is None
        out = []
        if not is_tomb or merge_tombstones:
            out.append(
                {
                    "topic": dest_topic,
                    "partition": None,
                    "key": rec["key"],
                    "value": rec["value"],
                }
            )
        if not is_tomb:
            out.append(
                {
                    "topic": rec["topic"],
                    "partition": rec["partition"],
                    "key": rec["key"],
                    "value": None,
                }
            )
        return out

    return process


def purge_all_record_fn() -> Callable[[dict], list[dict]]:
    """Per-record twin of ``routing.purge_all`` (PurgeAll.kt:19-48)."""

    def process(rec: dict) -> list[dict]:
        if rec["value"] is None:  # never double-tombstone
            return []
        return [
            {
                "topic": rec["topic"],
                "partition": rec["partition"],
                "key": rec["key"],
                "value": None,
            }
        ]

    return process


def consume_process_loop(
    consumer,
    producer,
    topic: str,
    process: Callable[[dict], Iterable[dict]],
    group_id: str = "kafka-merge-purge-spark",
    transactions: bool = True,
    no_commit: bool = False,
    poll_timeout: float = 1.0,
) -> dict:
    """Run the reference pipeline loop to completion over a consumer.

    Protocol (Pipeline.kt:28-76): init transactions up front (:24-26),
    subscribe (:34), poll until an empty batch (:37-38), and per batch
    begin → process/produce → offsets[(consumed topic, partition)] =
    offset (:43-52) → sendOffsetsToTransaction unless ``no_commit``
    (:55-57) → commitTransaction (:60); without transactions, flush +
    commitSync (:62-66).  Any error aborts the open transaction and
    re-raises (:70-74); the consumer is always closed (:32 ``use``).

    Returns ``{"batches": n, "consumed": n, "produced": n}``.
    """
    if transactions:
        producer.init_transactions()
    consumer.subscribe([topic])
    batches = consumed = produced = 0
    try:
        while True:
            records = consumer.poll(poll_timeout)
            if not records:
                break
            batches += 1
            if transactions:
                producer.begin_transaction()
            offsets: dict[tuple[str, int], int] = {}
            for rec in records:
                for out in process(rec):
                    producer.send(
                        topic=out["topic"],
                        partition=out.get("partition"),
                        key=out.get("key"),
                        value=out.get("value"),
                        headers=out.get("headers"),
                    )
                    produced += 1
                consumed += 1
                offsets[(rec["topic"], rec["partition"])] = rec["offset"]
            if transactions:
                if not no_commit:
                    producer.send_offsets_to_transaction(offsets, group_id)
                producer.commit_transaction()
            else:
                producer.flush()
                if not no_commit:
                    consumer.commit_sync(offsets)
    except Exception:
        if transactions:
            producer.abort_transaction()
        raise
    finally:
        consumer.close()
    return {"batches": batches, "consumed": consumed, "produced": produced}
