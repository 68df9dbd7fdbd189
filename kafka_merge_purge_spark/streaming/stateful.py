"""Arbitrary stateful streaming: per-key state machines via
``applyInPandasWithState`` (SURVEY §2.2 "streaming: arbitrary state").

The concrete operator is the DLQ **retry budget** the reference's
merge/purge workflow implies (a dead-letter record is reprocessed until
an operator gives up): every record of a key increments the key's
attempt counter; records beyond ``budget`` attempts are routed DEAD
(stop retrying → purge leg), the rest RETRY (→ merge leg back into the
work topic).

Scale posture: state lives in the state store, partitioned by key —
memory is bounded by (distinct keys in state) × a few bytes, and the
``GroupStateTimeout.ProcessingTimeTimeout`` eviction below bounds even
that for keys that go quiet.  Arrow-batched per key-group; no row-wise
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output: one row per input record with its attempt number and routing
RETRY_OUTPUT_SCHEMA = "key string, offset long, attempt long, decision string"
#: state: cumulative attempt count per key
RETRY_STATE_SCHEMA = "attempts long"


def make_retry_fn(budget: int, state_ttl_ms: int):
    """The per-key-group handler for ``retry_budget_decisions``, exposed
    at module level so the timeout protocol is unit-testable against a
    fake GroupState (the real state store only exists in a stream)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: the key went quiet for state_ttl_ms — drop its
            # counter and do NOT re-arm the timer, or idle keys would hold
            # state forever and wake every TTL (round-2 advice).  Timeout
            # invocations carry no data, so there is nothing to emit.
            state.remove()
            return
        (attempts,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values("offset")
            n = len(pdf)
            attempt_nos = range(attempts + 1, attempts + n + 1)
            out = pd.DataFrame(
                {
                    "key": pdf["key"].astype(object),
                    "offset": pdf["offset"],
                    "attempt": list(attempt_nos),
                    "decision": ["RETRY" if a <= budget else "DEAD" for a in attempt_nos],
                }
            )
            attempts += n
            yield out
        state.update((attempts,))
        state.setTimeoutDuration(state_ttl_ms)

    return fn


def retry_budget_decisions(
    records: DataFrame,
    budget: int = 3,
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Per-key retry budget over the canonical record stream.

    Streaming-only (requires the state store).  Emits
    (key, offset, attempt, decision) with decision ∈ {RETRY, DEAD}:
    attempts 1..budget are RETRY, later ones DEAD — the stateful analog
    of the rule-based ask router (R8) whose decision depends on history,
    which no stateless expression can express.
    """
    fn = make_retry_fn(budget, state_ttl_ms)
    return (
        records.filter(records["key"].isNotNull())
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=RETRY_OUTPUT_SCHEMA,
            stateStructType=RETRY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


#: streaming compaction output: the current latest live record per key
COMPACT_OUTPUT_SCHEMA = "key string, offset long, value string"


def _compaction_order_key(offset: int, value: str | None) -> tuple:
    """The TOTAL order compaction resolves by: (offset, value) with NULL
    (tombstone) as the minimum value — the pandas twin of batch
    compaction's ``ORDER BY offset DESC, value DESC NULLS LAST``."""
    return (offset, value is not None, value if value is not None else "")


def fold_latest(
    state: tuple[int, str | None] | None, pdfs: Iterator[pd.DataFrame]
) -> tuple[int, str | None]:
    """Pure upsert fold for streaming compaction: fold record batches of
    ONE key into the (max_offset, value) state tuple.

    Exposed at module level so the exact state transition the
    transformWithStateInPandas processor runs is batch-equivalence-
    testable without the state store (whose protobuf serializer is not
    installed in this container).  Associative over ANY batch split
    because only the argmax by the total order ``_compaction_order_key``
    survives — duplicate offsets within a key (possible when a key spans
    source partitions) tie-break on the value itself, identically to
    batch compaction's window order (r4 advice), so no arrival-order
    dependence remains."""
    max_offset, value = state if state is not None else (-1, None)
    cur = None if state is None else _compaction_order_key(max_offset, value)
    for pdf in pdfs:
        for _, r in pdf.iterrows():
            v = r["value"] if pd.notna(r["value"]) else None
            k = _compaction_order_key(int(r["offset"]), v)
            if cur is None or k > cur:
                cur = k
                max_offset, value = int(r["offset"]), v
    return (max_offset, value)


def emit_latest(key: str, state: tuple[int, str | None]) -> pd.DataFrame | None:
    """Pure emit step: the key's current latest live record, or ``None``
    when the head record is a tombstone (key deleted — matches batch
    operators/routing.compaction and Kafka log compaction)."""
    max_offset, value = state
    if value is None:
        return None
    return pd.DataFrame({"key": [key], "offset": [max_offset], "value": [value]})


def streaming_compaction(records: DataFrame) -> DataFrame:
    """Streaming log compaction via ``transformWithStateInPandas`` (the
    Spark 4 stateful-processor API): ValueState holds each key's
    (max_offset, value); every micro-batch folds its records in and emits
    the key's current latest — **tombstone-aware**: a tombstone at the
    head deletes the key (emits nothing), exactly the batch semantics of
    operators/routing.compaction and Kafka log compaction.

    State is one tuple per key — the minimal upsert-view state; at scale
    the state store shards by key alongside the shuffle.

    NOTE: this API serializes state via protobuf, which is not installed
    in the test container.  The state transition is therefore factored
    into the pure ``fold_latest``/``emit_latest`` above, and the test
    suite proves batch equivalence against operators/routing.compaction
    through those functions under randomized micro-batch splits (running
    the live stream instead when protobuf is importable).  On a real
    deployment: ``pip install protobuf``.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LatestPerKey(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._latest = handle.getValueState("latest", "max_offset long, value string")

        def handleInputRows(self, key, rows, timerValues):
            prior = self._latest.get() if self._latest.exists() else None
            state = fold_latest(prior, rows)
            self._latest.update(state)
            out = emit_latest(key[0], state)
            if out is not None:  # head tombstone ⇒ key is deleted
                yield out

        def close(self) -> None:
            pass

    return (
        records.filter(records["key"].isNotNull())
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=LatestPerKey(),
            outputStructType=COMPACT_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


#: streaming funnel output: each key's current stage after the batch
FUNNEL_OUTPUT_SCHEMA = "user_id long, funnel_stage int"
FUNNEL_STEPS = ("view", "click", "purchase")


def fold_funnel(
    state: int | None,
    pdfs: Iterator[pd.DataFrame],
    steps: tuple[str, ...] = FUNNEL_STEPS,
) -> int:
    """Pure stage-machine fold for the streaming funnel: advance one
    user's stage through record batches.

    Matches operators/analytics.funnel_stages' greedy fold EXACTLY when
    the per-key record order across batches follows the batch query's
    (ts, event_id) total order — the guarantee a Kafka source gives
    per partition (offset order) when producers emit in event order.
    Within a batch, rows are re-sorted by (ts, event_id) so intra-batch
    arrival jitter cannot reorder the machine; across batches the fold
    is sequential by construction, so chopping one ordered stream into
    ANY sequence of batches folds to the same stage (pinned under
    randomized splits in pytest)."""
    stage = state or 0
    # Concatenate the batch's Arrow chunks BEFORE sorting: handleInputRows
    # hands one key's micro-batch as an iterator of chunked frames, and
    # jitter can land a later event in an earlier chunk — sorting chunks
    # independently would replay them out of order (review finding).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return stage
    batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    batch = batch.sort_values(["ts", "event_id"])
    for t in batch["event_type"]:
        if stage < len(steps) and t == steps[stage]:
            stage += 1
    return stage


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming funnel via ``transformWithStateInPandas``: ValueState
    holds each user's stage; every micro-batch folds its events in and
    emits the user's current stage — the stream twin of
    operators/analytics.funnel_stages (same protobuf note as
    streaming_compaction; the transition is the pure ``fold_funnel``)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FunnelPerUser(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stage = handle.getValueState("stage", "stage int")

        def handleInputRows(self, key, rows, timerValues):
            prior = self._stage.get()[0] if self._stage.exists() else None
            stage = fold_funnel(prior, rows)
            self._stage.update((stage,))
            yield pd.DataFrame({"user_id": [key[0]], "funnel_stage": [stage]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelPerUser(),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


#: running-moment anomaly output: each event tagged with the pre-update z
ANOMALY_OUTPUT_SCHEMA = (
    "event_id long, event_type string, value double, n_seen long, zscore double"
)


def fold_moments(
    state: tuple[int, float, float] | None,
    pdfs: Iterator[pd.DataFrame],
) -> tuple[tuple[int, float, float], pd.DataFrame]:
    """Pure Welford fold for streaming anomaly scoring: thread one key's
    (n, mean, M2) running moments through its record batches, emitting
    each event's z-score against the moments BEFORE that event updates
    them (so the score never sees its own value — the standard online
    form; the first two events of a key emit NULL, variance undefined).

    Chunks are concatenated then sorted by (ts, event_id) before the
    walk, exactly like fold_funnel — arrival jitter inside a micro-batch
    cannot reorder the moment updates; across batches the fold is
    sequential, so any chop of one ordered stream yields identical
    scores (pinned under randomized splits in pytest, batch-equivalent
    to the ordered-prefix computation a window query would produce).
    """
    import math

    n, mean, m2 = state if state is not None else (0, 0.0, 0.0)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return (n, mean, m2), pd.DataFrame(
            {"event_id": [], "value": [], "n_seen": [], "zscore": []}
        )
    batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    out_id, out_val, out_n, out_z = [], [], [], []
    for eid, val in zip(batch["event_id"], batch["value"]):
        v = float(val)
        if n >= 2:
            var = m2 / (n - 1)
            z = round((v - mean) / math.sqrt(var), 4) if var > 0 else None
        else:
            z = None
        out_id.append(int(eid))
        out_val.append(v)
        out_n.append(n)
        out_z.append(z)
        # Welford update
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
    return (n, mean, m2), pd.DataFrame(
        {"event_id": out_id, "value": out_val, "n_seen": out_n, "zscore": out_z}
    )


def streaming_anomaly_scores(events: DataFrame) -> DataFrame:
    """Streaming per-key anomaly scoring via ``transformWithStateInPandas``:
    ValueState holds each event_type's Welford moments; every micro-batch
    folds its events in and emits each event's online z-score — the
    stream twin of the batch x_zscore (which uses the FINAL moments; the
    online form scores against history only, the deployable shape for
    live outlier flagging).  Same protobuf note as streaming_compaction;
    the transition is the pure ``fold_moments``."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MomentsPerKey(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._m = handle.getValueState("m", "n long, mean double, m2 double")

        def handleInputRows(self, key, rows, timerValues):
            prior = tuple(self._m.get()) if self._m.exists() else None
            state, out = fold_moments(prior, rows)
            self._m.update(state)
            if len(out):
                out = out.assign(event_type=key[0])
                yield out[["event_id", "event_type", "value", "n_seen", "zscore"]]

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=MomentsPerKey(),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
