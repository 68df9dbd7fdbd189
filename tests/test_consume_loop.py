"""Consumer-side protocol tests against fake clients — the read-path
mirror of tests/test_sink_transactions.py, pinning the call order the
reference specs with mocked Kafka clients (test/PipelineTest.kt:24-50
loop semantics, 98-141 commit path, 194-217 abort path)."""

from __future__ import annotations

import pytest

from kafka_merge_purge_spark.streaming.consume import (
    consume_process_loop,
    merge_all_record_fn,
    purge_all_record_fn,
)


def rec(topic, partition, offset, key, value):
    return {"topic": topic, "partition": partition, "offset": offset, "key": key, "value": value}


class FakeConsumer:
    """Replays pre-seeded poll batches, then empties — the loop must
    terminate on the first empty poll (Pipeline.kt:37-38)."""

    def __init__(self, batches):
        self._batches = list(batches)
        self.calls: list = []
        self.closed = False

    def subscribe(self, topics):
        self.calls.append(("subscribe", tuple(topics)))

    def poll(self, timeout):
        self.calls.append("poll")
        return self._batches.pop(0) if self._batches else []

    def commit_sync(self, offsets):
        self.calls.append(("commit_sync", dict(offsets)))

    def close(self):
        self.closed = True
        self.calls.append("close")


class FakeProducer:
    def __init__(self, fail_on_send_no=None):
        self.calls: list = []
        self.sent: list = []
        self._sends = 0
        self._fail_on = fail_on_send_no

    def init_transactions(self):
        self.calls.append("init_transactions")

    def begin_transaction(self):
        self.calls.append("begin_transaction")

    def send(self, topic, partition=None, key=None, value=None, headers=None):
        self._sends += 1
        if self._fail_on is not None and self._sends == self._fail_on:
            raise RuntimeError("broker went away")
        self.calls.append("send")
        self.sent.append((topic, partition, key, value))

    def send_offsets_to_transaction(self, offsets, group_id):
        self.calls.append(("send_offsets_to_transaction", dict(offsets), group_id))

    def commit_transaction(self):
        self.calls.append("commit_transaction")

    def abort_transaction(self):
        self.calls.append("abort_transaction")

    def flush(self):
        self.calls.append("flush")


BATCH_1 = [
    rec("src", 0, 0, "k1", "v1"),
    rec("src", 1, 2, "k2", None),  # tombstone
]
BATCH_2 = [rec("src", 0, 5, "k3", "v3")]


def test_transactional_loop_protocol_order():
    consumer = FakeConsumer([BATCH_1, BATCH_2])
    producer = FakeProducer()
    stats = consume_process_loop(
        consumer, producer, "src", merge_all_record_fn("dst"), group_id="g1"
    )
    assert stats == {"batches": 2, "consumed": 3, "produced": 4}
    assert consumer.calls[0] == ("subscribe", ("src",))
    # 3 polls: two batches + the terminating empty one; close at the end
    assert consumer.calls.count("poll") == 3
    assert consumer.calls[-1] == "close" and consumer.closed
    # producer: init once, then per batch begin → sends → offsets → commit
    assert producer.calls[0] == "init_transactions"
    tx_starts = [i for i, c in enumerate(producer.calls) if c == "begin_transaction"]
    assert len(tx_starts) == 2
    b1 = producer.calls[tx_starts[0] : tx_starts[1]]
    assert b1[0] == "begin_transaction" and b1[-1] == "commit_transaction"
    op, offsets, group = b1[-2]
    assert op == "send_offsets_to_transaction" and group == "g1"
    # offsets keyed by the CONSUMED (topic, partition) — tombstone rows
    # advance their partition too (Pipeline.kt:43-52 records every offset)
    assert offsets == {("src", 0): 0, ("src", 1): 2}
    op2, offsets2, _ = producer.calls[-1 - 1]
    assert op2 == "send_offsets_to_transaction" and offsets2 == {("src", 0): 5}


def test_merge_all_routing_through_loop():
    consumer = FakeConsumer([BATCH_1])
    producer = FakeProducer()
    consume_process_loop(consumer, producer, "src", merge_all_record_fn("dst"))
    # live record: merge to dst + purge back to source partition;
    # tombstone: dropped entirely (no merge, never re-purged)
    assert producer.sent == [
        ("dst", None, "k1", "v1"),
        ("src", 0, "k1", None),
    ]


def test_merge_tombstones_forwards_delete_markers():
    consumer = FakeConsumer([BATCH_1])
    producer = FakeProducer()
    consume_process_loop(
        consumer, producer, "src", merge_all_record_fn("dst", merge_tombstones=True)
    )
    assert ("dst", None, "k2", None) in producer.sent  # forwarded marker
    assert ("src", 1, "k2", None) not in producer.sent  # still no re-purge


def test_abort_on_error_closes_consumer_and_reraises():
    consumer = FakeConsumer([BATCH_1, BATCH_2])
    producer = FakeProducer(fail_on_send_no=2)
    with pytest.raises(RuntimeError, match="broker went away"):
        consume_process_loop(consumer, producer, "src", merge_all_record_fn("dst"))
    assert producer.calls[-1] == "abort_transaction"
    assert "commit_transaction" not in producer.calls
    assert consumer.closed  # Pipeline.kt:32 `use` semantics


def test_non_transactional_flush_and_commit_sync():
    consumer = FakeConsumer([BATCH_1])
    producer = FakeProducer()
    consume_process_loop(
        consumer, producer, "src", purge_all_record_fn(), transactions=False
    )
    assert "init_transactions" not in producer.calls
    assert "flush" in producer.calls
    (commit,) = [c for c in consumer.calls if isinstance(c, tuple) and c[0] == "commit_sync"]
    assert commit[1] == {("src", 0): 0, ("src", 1): 2}


def test_no_commit_never_advances_offsets():
    for transactions in (True, False):
        consumer = FakeConsumer([BATCH_1])
        producer = FakeProducer()
        consume_process_loop(
            consumer, producer, "src", merge_all_record_fn("dst"),
            transactions=transactions, no_commit=True,
        )
        assert not any(
            isinstance(c, tuple) and c[0] == "send_offsets_to_transaction"
            for c in producer.calls
        )
        assert not any(
            isinstance(c, tuple) and c[0] == "commit_sync" for c in consumer.calls
        )


def test_record_fn_matches_dataframe_merge_all(spark):
    """The per-record twin and the DataFrame transform route identically:
    same multiset of (topic, partition, key, value) outputs."""
    from kafka_merge_purge_spark.model import load_records
    from kafka_merge_purge_spark.operators import routing

    from collections import Counter

    records = load_records(spark, "/root/testdata/sf0.001")
    frame_out = Counter(
        (r["topic"], r["partition"], r["key"], r["value"])
        for r in routing.merge_all(records, "dst").collect()
    )
    fn = merge_all_record_fn("dst")
    loop_out = Counter(
        (o["topic"], o["partition"], o["key"], o["value"])
        for rec_row in records.collect()
        for o in fn(rec_row.asDict())
    )
    assert loop_out == frame_out and sum(frame_out.values()) > 0
