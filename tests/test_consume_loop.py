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


class FakeBroker:
    """Minimal in-memory broker: topic logs + consumer-group offsets.
    Transactional produces/offsets become visible only at commit and are
    discarded on abort — read_committed visibility."""

    def __init__(self):
        self.topics: dict[str, list] = {}
        self.committed: dict[tuple[str, int], int] = {}


class BrokerProducer(FakeProducer):
    """FakeProducer that lands its buffered sends/offsets on a FakeBroker
    at commit_transaction — nothing is visible before commit."""

    def __init__(self, broker):
        super().__init__()
        self._broker = broker
        self._buf: list = []
        self._pending_offsets: dict = {}

    def send(self, topic, partition=None, key=None, value=None, headers=None):
        super().send(topic, partition, key, value, headers)
        self._buf.append((topic, partition, key, value))

    def send_offsets_to_transaction(self, offsets, group_id):
        super().send_offsets_to_transaction(offsets, group_id)
        self._pending_offsets = dict(offsets)

    def commit_transaction(self):
        super().commit_transaction()
        for topic, partition, key, value in self._buf:
            self._broker.topics.setdefault(topic, []).append((partition, key, value))
        self._broker.committed.update(self._pending_offsets)
        self._buf, self._pending_offsets = [], {}

    def abort_transaction(self):
        super().abort_transaction()
        self._buf, self._pending_offsets = [], {}


def test_end_to_end_transaction_flow_matches_frame_path(spark):
    """The full reference flow as ONE test (Pipeline.kt:28-76 +
    MergeAll.kt:31-61): subscribe → poll → route per record → produce →
    sendOffsets(keyed by CONSUMED partition) → commit, against a fake
    broker with read_committed visibility — then the SAME records through
    the DataFrame routing + _run_transaction write path, asserting both
    halves land identical topic contents and identical committed offsets.
    """
    from collections import Counter

    from kafka_merge_purge_spark.operators import routing
    from kafka_merge_purge_spark.streaming.sink import _run_transaction

    # --- consume-loop half over the fake broker ---------------------------
    # merge_tombstones=True so EVERY consumed record produces at least one
    # routed row: the loop records offsets at consumption (Pipeline.kt:
    # 43-52) while the frame sink derives them from routed rows, so only
    # then can the two halves commit identical offset maps (the default
    # mode's difference is asserted at the end).
    broker = FakeBroker()
    consumer = FakeConsumer([BATCH_1, BATCH_2])
    producer = BrokerProducer(broker)
    stats = consume_process_loop(
        consumer,
        producer,
        "src",
        merge_all_record_fn("dst", merge_tombstones=True),
        group_id="g1",
    )
    assert stats["batches"] == 2 and stats["consumed"] == len(BATCH_1) + len(BATCH_2)

    # protocol order per batch: begin precedes sends, offsets precede commit
    assert consumer.calls[0] == ("subscribe", ("src",))
    order = [c if isinstance(c, str) else c[0] for c in producer.calls]
    assert order[0] == "init_transactions"
    first_commit = order.index("commit_transaction")
    assert order.index("begin_transaction") < order.index("send") < order.index(
        "send_offsets_to_transaction"
    ) < first_commit
    assert order.count("begin_transaction") == order.count("commit_transaction") == 2
    assert "abort_transaction" not in order and consumer.closed

    # offsets keyed by the CONSUMED (topic, partition), max offset wins
    all_recs = BATCH_1 + BATCH_2
    want_offsets = {}
    for r in all_recs:
        k = (r["topic"], r["partition"])
        want_offsets[k] = max(want_offsets.get(k, -1), r["offset"])
    assert broker.committed == want_offsets

    # --- frame half: routing.merge_all → _run_transaction -----------------
    records = spark.createDataFrame(
        [(r["topic"], r["partition"], r["offset"], r["key"], r["value"]) for r in all_recs],
        "topic string, partition int, offset long, key string, value string",
    )
    routed = routing.merge_all(records, "dst", merge_tombstones=True)
    broker2 = FakeBroker()
    producer2 = BrokerProducer(broker2)
    n, offsets = _run_transaction(
        producer2, iter(routed.collect()), routed.columns, offsets_group="g1", batch_id=0
    )
    assert offsets == want_offsets and broker2.committed == want_offsets

    # identical topic contents (multisets — the two paths interleave legs
    # differently but must produce the same records)
    got_loop = {t: Counter(v) for t, v in broker.topics.items()}
    got_frame = {t: Counter(v) for t, v in broker2.topics.items()}
    assert got_loop == got_frame
    assert set(got_loop) == {"dst", "src"}  # merge leg + purge tombstones
    assert all(v is None for _, _, v in broker2.topics["src"])  # purge leg tombstones only

    # default mode (tombstones dropped): the frame sink can only advance
    # partitions that produced routed rows — partition 1's sole record is
    # a tombstone, so its offset stays unadvanced on the sink path while
    # the consume loop (which owns consumption) does advance it
    routed_def = routing.merge_all(records, "dst")
    _, offsets_def = _run_transaction(
        BrokerProducer(FakeBroker()), iter(routed_def.collect()), routed_def.columns,
        offsets_group="g1", batch_id=1,
    )
    assert offsets_def == {("src", 0): 5}
