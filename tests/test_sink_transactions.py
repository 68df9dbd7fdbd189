"""Transactional-sink protocol tests against a fake producer — the same
strategy the reference uses to spec its pipeline with mocked Kafka
clients (test/PipelineTest.kt:98-141 commit path, 194-217 abort path).
No broker needed: what's pinned is the *call order* and the fencing id.
"""

from __future__ import annotations

import pytest

from kafka_merge_purge_spark.model import RECORD_SCHEMA
from kafka_merge_purge_spark.operators import routing
from kafka_merge_purge_spark.streaming.sink import (
    TransactionAborted,
    transactional_kafka_batch_fn,
)


class FakeProducer:
    def __init__(self, transactional_id: str, fail_on_send_no: int | None = None):
        self.transactional_id = transactional_id
        self.calls: list = []
        self.sent: list = []
        self._sends = 0
        self._fail_on = fail_on_send_no

    def init_transactions(self):
        self.calls.append("init_transactions")

    def begin_transaction(self):
        self.calls.append("begin_transaction")

    def send(self, topic, partition, key, value, headers=None):
        self._sends += 1
        if self._fail_on is not None and self._sends == self._fail_on:
            raise RuntimeError("broker went away")
        self.calls.append("send")
        self.sent.append((topic, partition, key, value, headers))

    def send_offsets_to_transaction(self, offsets, group_id):
        self.calls.append(("send_offsets_to_transaction", dict(offsets), group_id))

    def commit_transaction(self):
        self.calls.append("commit_transaction")

    def abort_transaction(self):
        self.calls.append("abort_transaction")


class Factory:
    """Records every producer it built, keyed by transactional id."""

    def __init__(self, **producer_kwargs):
        self.producers: list[FakeProducer] = []
        self.kwargs = producer_kwargs

    def __call__(self, transactional_id: str) -> FakeProducer:
        p = FakeProducer(transactional_id, **self.kwargs)
        self.producers.append(p)
        return p


@pytest.fixture(scope="module")
def routed(spark):
    rows = [
        ("src", 0, 0, "k1", "v1", None, None),
        ("src", 0, 5, "k1", "v2", None, None),
        ("src", 1, 2, "k2", None, None, None),  # tombstone
        ("src", 1, 3, "k3", "v3", None, None),
    ]
    records = spark.createDataFrame(rows, RECORD_SCHEMA)
    return routing.merge_all(records, "dst").cache()


def test_commit_path_call_order(routed):
    # PipelineTest.kt:98-141 — begin, sends, sendOffsets, commit, in order
    factory = Factory()
    fn = transactional_kafka_batch_fn("b:9092", "kmp", producer_factory=factory, group_id="g1")
    fn(routed, batch_id=7)

    (p,) = factory.producers
    assert p.transactional_id == "kmp-7"  # fencing id carries the batch
    assert p.calls[0] == "init_transactions"
    assert p.calls[1] == "begin_transaction"
    n_rows = routed.count()
    assert p.calls[2 : 2 + n_rows] == ["send"] * n_rows
    op, offsets, group = p.calls[2 + n_rows]
    assert op == "send_offsets_to_transaction" and group == "g1"
    assert p.calls[-1] == "commit_transaction"
    assert "abort_transaction" not in p.calls


def test_offsets_are_max_per_source_partition(routed):
    # the offsets map mirrors Pipeline.kt:43-52: keyed by the CONSUMED
    # record's (topic, partition) — merge legs re-topiced to "dst" still
    # advance their source partition, and no destination key ever appears
    factory = Factory()
    fn = transactional_kafka_batch_fn("b:9092", "kmp", producer_factory=factory)
    fn(routed, batch_id=0)
    (_, offsets, _), = [c for c in factory.producers[0].calls if isinstance(c, tuple)]
    assert offsets == {("src", 0): 5, ("src", 1): 3}


def test_abort_on_send_error_reraises(routed):
    # PipelineTest.kt:194-217 — any produce error aborts the transaction
    # and the error propagates; neither offsets nor commit are sent
    factory = Factory(fail_on_send_no=2)
    fn = transactional_kafka_batch_fn("b:9092", "kmp", producer_factory=factory)
    with pytest.raises(TransactionAborted, match="broker went away"):
        fn(routed, batch_id=1)
    (p,) = factory.producers
    assert p.calls[-1] == "abort_transaction"
    assert "commit_transaction" not in p.calls
    assert not any(isinstance(c, tuple) for c in p.calls)  # no offsets sent


def test_no_commit_skips_offsets_but_still_commits(routed):
    # reference --no-commit (Pipeline.kt:55-57): transactional produce
    # without advancing the consumer group
    factory = Factory()
    fn = transactional_kafka_batch_fn("b:9092", "kmp", producer_factory=factory, no_commit=True)
    fn(routed, batch_id=2)
    (p,) = factory.producers
    assert "commit_transaction" in p.calls
    assert not any(isinstance(c, tuple) for c in p.calls)


def test_replayed_batch_reuses_fencing_id(routed):
    # same batch id → same transactional.id → the broker fences zombies
    factory = Factory()
    fn = transactional_kafka_batch_fn("b:9092", "kmp", producer_factory=factory)
    fn(routed, batch_id=3)
    fn(routed, batch_id=3)
    assert [p.transactional_id for p in factory.producers] == ["kmp-3", "kmp-3"]


def test_tombstones_send_null_payload_bytes(routed):
    factory = Factory()
    fn = transactional_kafka_batch_fn("b:9092", "kmp", producer_factory=factory)
    fn(routed, batch_id=4)
    (p,) = factory.producers
    purge_sends = [s for s in p.sent if s[0] == "src"]
    assert purge_sends and all(s[3] is None for s in purge_sends)
    merge_sends = [s for s in p.sent if s[0] == "dst"]
    assert {s[3] for s in merge_sends} == {"v1", "v2", "v3"}


def test_default_factory_is_gated_on_client_lib():
    # without kafka-python installed, the gate raises at *construction*,
    # before any stream starts — the protocol itself needs no broker
    try:
        import kafka  # noqa: F401

        pytest.skip("kafka-python installed; gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="client library"):
        transactional_kafka_batch_fn("b:9092", "kmp")


def test_partition_fn_runs_one_transaction_per_partition(routed):
    """Distributed form: each partition commits its own fenced transaction
    on the executor; summaries come back instead of payloads."""
    from kafka_merge_purge_spark.streaming.sink import transactional_kafka_partition_fn

    class WorkerFakeProducer:
        # defined in-test: cloudpickle ships it to executors by value
        def __init__(self, tid):
            self.tid = tid
            self.order = []

        def init_transactions(self):
            self.order.append("init")

        def begin_transaction(self):
            self.order.append("begin")

        def send(self, topic, partition, key, value, headers=None):
            self.order.append("send")

        def send_offsets_to_transaction(self, offsets, group_id):
            assert self.order[0] == "init" and self.order[1] == "begin"
            assert all(c == "send" for c in self.order[2:])
            self.order.append("offsets")

        def commit_transaction(self):
            assert self.order[-1] == "offsets"  # protocol order on the worker
            self.order.append("commit")

        def abort_transaction(self):
            raise AssertionError("abort on happy path")

    fn = transactional_kafka_partition_fn(
        "b:9092", "kmp-dist", producer_factory=WorkerFakeProducer
    )
    four_parts = routed.repartition(4)
    summaries = fn(four_parts, batch_id=9)
    assert sum(n for _, n, _ in summaries) == routed.count()
    assert all(committed for _, _, committed in summaries)
    assert len({idx for idx, _, _ in summaries}) == len(summaries)  # one tx per partition
