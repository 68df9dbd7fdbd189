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

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


class _TtlProcessorBase:
    """Shared TTL plumbing for the transformWithStateInPandas processors
    (r5 verdict item 3: streaming compaction/funnel/anomaly state used to
    grow with key cardinality forever).

    With ``ttl_ms`` set, every input batch re-arms a single processing-
    time timer at ``now + ttl_ms`` (a sliding idle timeout: the timer
    tracks the key's LAST activity, so only keys quiet for a full TTL
    expire).  ``handleExpiredTimer`` drops the key's state and does not
    re-arm — an evicted key costs nothing until its next record, which
    rebuilds state from scratch exactly like a first-seen key (pinned in
    pytest via fake handle/state/timers; the fold functions all accept
    ``state=None``).  Without ``ttl_ms`` the operator keeps the old
    unbounded-state posture (documented: bounded by distinct keys ever
    seen — fine for bounded key domains, not for e.g. per-user keys on
    an open site).
    """

    #: state variable names to clear on expiry, set by subclasses
    _STATE_ATTRS: tuple[str, ...] = ()

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms
        self._handle = None

    def _keep_handle(self, handle) -> None:
        self._handle = handle

    def _arm_ttl(self, timerValues) -> None:
        if self._ttl_ms is None:
            return
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._ttl_ms
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        for name in self._STATE_ATTRS:
            getattr(self, name).clear()
        return iter([])

    def close(self) -> None:
        pass


# the class import is protobuf-free (only RUNNING a stream needs the
# protobuf serializer) — safe at module level in the test container
from pyspark.sql.streaming.stateful_processor import StatefulProcessor as _StatefulProcessor  # noqa: E402


class LatestPerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming log-compaction processor: ValueState holds each key's
    (max_offset, value); the transition is the pure ``fold_latest``."""

    _STATE_ATTRS = ("_latest",)

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._latest = handle.getValueState("latest", "max_offset long, value string")

    def handleInputRows(self, key, rows, timerValues):
        prior = self._latest.get() if self._latest.exists() else None
        state = fold_latest(prior, rows)
        self._latest.update(state)
        self._arm_ttl(timerValues)
        out = emit_latest(key[0], state)
        if out is not None:  # head tombstone ⇒ key is deleted
            yield out


def streaming_compaction(
    records: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Streaming log compaction via ``transformWithStateInPandas`` (the
    Spark 4 stateful-processor API): ValueState holds each key's
    (max_offset, value); every micro-batch folds its records in and emits
    the key's current latest — **tombstone-aware**: a tombstone at the
    head deletes the key (emits nothing), exactly the batch semantics of
    operators/routing.compaction and Kafka log compaction.

    State is one tuple per key — the minimal upsert-view state; at scale
    the state store shards by key alongside the shuffle.
    ``state_ttl_ms`` bounds it further: keys idle for a full TTL are
    evicted (see ``_TtlProcessorBase``) and rebuild from their next
    record — for compaction that means the compacted view FORGETS an
    idle key's head record, the deliberate trade every TTL'd
    materialized view makes.

    NOTE: this API serializes state via protobuf, which is not installed
    in the test container.  The state transition is therefore factored
    into the pure ``fold_latest``/``emit_latest`` above, and the test
    suite proves batch equivalence against operators/routing.compaction
    through those functions under randomized micro-batch splits (running
    the live stream instead when protobuf is importable).  On a real
    deployment: ``pip install protobuf``.
    """
    return (
        records.filter(records["key"].isNotNull())
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=LatestPerKey(state_ttl_ms),
            outputStructType=COMPACT_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None" if state_ttl_ms is None else "ProcessingTime",
        )
    )


#: streaming funnel output: each key's current stage after the batch
FUNNEL_OUTPUT_SCHEMA = "user_id long, funnel_stage int"
FUNNEL_STEPS = ("view", "click", "purchase")


def fold_funnel(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    steps: tuple[str, ...] = FUNNEL_STEPS,
) -> tuple:
    """Pure stage-machine fold for the streaming funnel: advance one
    user's stage through record batches.  State is ``(stage, last_ts,
    last_event_id)`` — the stage plus a high-water mark of the last
    event APPLIED.

    Matches operators/analytics.funnel_stages' greedy fold EXACTLY when
    the per-key record order across batches follows the batch query's
    (ts, event_id) total order — the guarantee a Kafka source gives
    per partition (offset order) when producers emit in event order.
    Within a batch, rows are re-sorted by (ts, event_id) so intra-batch
    arrival jitter cannot reorder the machine; across batches the fold
    is sequential by construction, so chopping one ordered stream into
    ANY sequence of batches folds to the same stage (pinned under
    randomized splits in pytest).

    Events at or below the high-water mark — late arrivals that REGRESS
    the cross-batch order — are dropped deterministically instead of
    being applied out of order (r5 advice: the ordering assumption used
    to be documented but unenforced, so a late event silently produced a
    different stage than the batch twin).  The result is prefix-
    consistency: the stage always equals the batch query's answer over
    the events actually applied, and a dropped regressor can only be
    recovered by reprocessing — the same contract a watermark gives."""
    stage, last_ts, last_eid = state if state is not None else (0, None, None)
    # Concatenate the batch's Arrow chunks BEFORE sorting: handleInputRows
    # hands one key's micro-batch as an iterator of chunked frames, and
    # jitter can land a later event in an earlier chunk — sorting chunks
    # independently would replay them out of order (review finding).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return (stage, last_ts, last_eid)
    batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    batch = batch.sort_values(["ts", "event_id"])
    for ts, eid, t in zip(batch["ts"], batch["event_id"], batch["event_type"]):
        if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
            continue  # cross-batch regressor: drop, never apply out of order
        if stage < len(steps) and t == steps[stage]:
            stage += 1
        last_ts, last_eid = ts, int(eid)
    return (stage, last_ts, last_eid)


class FunnelPerUser(_TtlProcessorBase, _StatefulProcessor):
    """Streaming funnel processor: ValueState holds each user's
    (stage, high-water mark); the transition is the pure ``fold_funnel``."""

    _STATE_ATTRS = ("_stage",)

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._stage = handle.getValueState(
            "stage", "stage int, last_ts timestamp, last_eid long"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._stage.get()) if self._stage.exists() else None
        state = fold_funnel(prior, rows)
        self._stage.update(state)
        self._arm_ttl(timerValues)
        yield pd.DataFrame({"user_id": [key[0]], "funnel_stage": [state[0]]})


def streaming_funnel(events: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """Streaming funnel via ``transformWithStateInPandas``: ValueState
    holds each user's stage; every micro-batch folds its events in and
    emits the user's current stage — the stream twin of
    operators/analytics.funnel_stages (same protobuf note as
    streaming_compaction; the transition is the pure ``fold_funnel``).
    ``state_ttl_ms`` evicts users idle for a full TTL (their funnel
    restarts at stage 0 on the next event — see ``_TtlProcessorBase``)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelPerUser(state_ttl_ms),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


#: running-moment anomaly output: each event tagged with the pre-update z
ANOMALY_OUTPUT_SCHEMA = (
    "event_id long, event_type string, value double, n_seen long, zscore double"
)


def fold_moments(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
) -> tuple[tuple, pd.DataFrame]:
    """Pure Welford fold for streaming anomaly scoring: thread one key's
    (n, mean, M2) running moments through its record batches, emitting
    each event's z-score against the moments BEFORE that event updates
    them (so the score never sees its own value — the standard online
    form; the first two events of a key emit NULL, variance undefined).
    State is ``(n, mean, m2, last_ts, last_event_id)`` — the moments
    plus a high-water mark of the last event applied.

    Chunks are concatenated then sorted by (ts, event_id) before the
    walk, exactly like fold_funnel — arrival jitter inside a micro-batch
    cannot reorder the moment updates; across batches the fold is
    sequential, so any chop of one ordered stream yields identical
    scores (pinned under randomized splits in pytest, batch-equivalent
    to the ordered-prefix computation a window query would produce).
    Cross-batch regressors (events at or below the high-water mark) are
    dropped — not scored, not folded into the moments — the same
    enforced prefix-consistency contract as ``fold_funnel`` (r5 advice).
    """
    import math

    n, mean, m2, last_ts, last_eid = (
        state if state is not None else (0, 0.0, 0.0, None, None)
    )
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return (n, mean, m2, last_ts, last_eid), pd.DataFrame(
            {"event_id": [], "value": [], "n_seen": [], "zscore": []}
        )
    batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    out_id, out_val, out_n, out_z = [], [], [], []
    for ts, eid, val in zip(batch["ts"], batch["event_id"], batch["value"]):
        if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
            continue  # cross-batch regressor: drop, never fold out of order
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
        last_ts, last_eid = ts, int(eid)
    return (n, mean, m2, last_ts, last_eid), pd.DataFrame(
        {"event_id": out_id, "value": out_val, "n_seen": out_n, "zscore": out_z}
    )


class MomentsPerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming anomaly processor: ValueState holds each key's Welford
    moments + high-water mark; the transition is the pure ``fold_moments``."""

    _STATE_ATTRS = ("_m",)

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._m = handle.getValueState(
            "m", "n long, mean double, m2 double, last_ts timestamp, last_eid long"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._m.get()) if self._m.exists() else None
        state, out = fold_moments(prior, rows)
        self._m.update(state)
        self._arm_ttl(timerValues)
        if len(out):
            out = out.assign(event_type=key[0])
            yield out[["event_id", "event_type", "value", "n_seen", "zscore"]]


def streaming_anomaly_scores(
    events: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Streaming per-key anomaly scoring via ``transformWithStateInPandas``:
    ValueState holds each event_type's Welford moments; every micro-batch
    folds its events in and emits each event's online z-score — the
    stream twin of the batch x_zscore (which uses the FINAL moments; the
    online form scores against history only, the deployable shape for
    live outlier flagging).  Same protobuf note as streaming_compaction;
    the transition is the pure ``fold_moments``.  ``state_ttl_ms``
    evicts keys idle for a full TTL (their moments restart from n=0 on
    the next event — see ``_TtlProcessorBase``)."""
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=MomentsPerKey(state_ttl_ms),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


#: streaming CUSUM drift output: each event tagged with the post-update
#: detector statistics and the alarm flag
CUSUM_OUTPUT_SCHEMA = (
    "event_id long, event_type string, value_q long, "
    "s_plus long, s_minus long, alarm boolean"
)


def fold_cusum(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    *,
    mu0_q: int,
    slack_q: int,
    h_q: int,
) -> tuple[tuple, pd.DataFrame]:
    """Pure Page-CUSUM fold — the STREAMING twin of the batch
    ``stats.cusum_changepoint`` (which scans a closed series for the
    single best split; the online form watches a live stream against a
    reference level and alarms as soon as the mean drifts):

        S⁺ ← max(0, S⁺ + (x − μ₀ − k));  S⁻ ← max(0, S⁻ + (μ₀ − x − k))

    alarm when either side exceeds ``h_q``, then both sides reset (the
    repeated-detection form — Page 1954).  All inputs are QUANTIZED
    int64 (``value_q``; the wrapper quantizes), so the state is pure
    integer arithmetic: chop-invariance is EXACT, not
    float-rounding-exact.  Each event emits its post-update statistics
    (the detector's current evidence including that observation —
    unlike fold_moments' score-before-update, an alarm must reflect the
    triggering event).

    Ordering contract mirrors fold_moments: chunks concatenate, sort by
    (ts, event_id); cross-batch regressors (at or below the high-water
    mark) drop without folding.  State: (s_plus, s_minus, last_ts,
    last_eid)."""
    sp, sm, last_ts, last_eid = (
        state if state is not None else (0, 0, None, None)
    )
    chunks = [pdf for pdf in pdfs if len(pdf)]
    empty = pd.DataFrame(
        {"event_id": [], "value_q": [], "s_plus": [], "s_minus": [],
         "alarm": []}
    )
    if not chunks:
        return (sp, sm, last_ts, last_eid), empty
    batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    out_id, out_v, out_sp, out_sm, out_al = [], [], [], [], []
    for ts, eid, v in zip(batch["ts"], batch["event_id"], batch["value_q"]):
        if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
            continue  # cross-batch regressor: drop, never fold out of order
        v = int(v)
        sp = max(0, sp + (v - mu0_q - slack_q))
        sm = max(0, sm + (mu0_q - v - slack_q))
        alarm = sp > h_q or sm > h_q
        out_id.append(int(eid))
        out_v.append(v)
        out_sp.append(sp)
        out_sm.append(sm)
        out_al.append(alarm)
        if alarm:
            sp = sm = 0
        last_ts, last_eid = ts, int(eid)
    return (sp, sm, last_ts, last_eid), pd.DataFrame(
        {"event_id": out_id, "value_q": out_v, "s_plus": out_sp,
         "s_minus": out_sm, "alarm": out_al}
    )


class CusumPerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming drift processor: ValueState holds each key's CUSUM
    sides + high-water mark; the transition is the pure ``fold_cusum``."""

    _STATE_ATTRS = ("_c",)

    def __init__(
        self,
        mu0_q: int,
        slack_q: int,
        h_q: int,
        ttl_ms: int | None = None,
    ):
        super().__init__(ttl_ms)
        self._params = (int(mu0_q), int(slack_q), int(h_q))

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._c = handle.getValueState(
            "c", "sp long, sm long, last_ts timestamp, last_eid long"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._c.get()) if self._c.exists() else None
        mu0_q, slack_q, h_q = self._params
        state, out = fold_cusum(
            prior, rows, mu0_q=mu0_q, slack_q=slack_q, h_q=h_q
        )
        self._c.update(state)
        self._arm_ttl(timerValues)
        if len(out):
            out = out.assign(event_type=key[0])
            yield out[
                ["event_id", "event_type", "value_q", "s_plus", "s_minus",
                 "alarm"]
            ]


def streaming_cusum(
    events: DataFrame,
    mu0: float,
    h: float,
    slack: float = 0.0,
    value_scale: int = 1_000_000,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key CUSUM drift detection via
    ``transformWithStateInPandas`` — the live twin of the batch
    ``x_cusum`` changepoint scan: every event_type's value stream runs
    the two-sided Page detector against reference level ``mu0`` with
    slack ``slack`` and alarm threshold ``h`` (all quantized to int64
    at ``value_scale``, so the per-key state is two integers and
    replays exactly under any micro-batch chop).  Same protobuf note as
    streaming_compaction; the transition is the pure ``fold_cusum``."""
    q = F.floor(F.col("value") * F.lit(float(value_scale)) + F.lit(0.5)).cast(
        "long"
    )
    prepared = events.select(
        "event_id", "ts", "event_type", q.alias("value_q")
    )
    return prepared.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=CusumPerKey(
            int(round(mu0 * value_scale)),
            int(round(slack * value_scale)),
            int(round(h * value_scale)),
            state_ttl_ms,
        ),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


#: streaming heavy-hitters output: the key's current top items after the batch
HH_OUTPUT_SCHEMA = "group_key string, item string, weight long, rank int"


def fold_heavy_hitters(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    capacity: int = 64,
) -> tuple:
    """Pure sequential Misra-Gries fold for streaming heavy hitters:
    thread one key's counter summary through its record batches.  State
    is ``(counters: dict, last_ts, last_event_id)`` — the ≤``capacity``
    bounded summary (operators/sketch.py semantics: weights are lower
    bounds; any item with frequency > n/capacity since the state was
    born is guaranteed present) plus the cross-batch high-water mark.

    Chop-invariant BY CONSTRUCTION: MG is a purely sequential algorithm,
    so folding one (ts, event_id)-ordered stream through any sequence of
    batches replays the identical update sequence (chunks concatenated
    and re-sorted per batch like fold_funnel; cross-batch regressors
    dropped at the high-water mark — pinned under randomized splits)."""
    counters, last_ts, last_eid = state if state is not None else ({}, None, None)
    counters = dict(counters)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return (counters, last_ts, last_eid)
    batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    from kafka_merge_purge_spark.operators.sketch import mg_update

    for ts, eid, item in zip(batch["ts"], batch["event_id"], batch["item"]):
        if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
            continue  # cross-batch regressor: drop, never fold out of order
        if item is not None:
            mg_update(counters, item, capacity)
        last_ts, last_eid = ts, int(eid)
    return (counters, last_ts, last_eid)


def emit_heavy_hitters(key: str, counters: dict, k: int) -> pd.DataFrame:
    """Current top-``k`` of a key's MG summary (weight desc, item asc —
    the deterministic tie-break shared with the batch sketch)."""
    top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        {
            "group_key": [key] * len(top),
            "item": [t for t, _ in top],
            "weight": [w for _, w in top],
            "rank": list(range(1, len(top) + 1)),
        }
    )


class HeavyHittersPerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming heavy-hitters processor: ValueState holds each key's
    bounded MG summary + high-water mark; every micro-batch folds its
    records in (pure ``fold_heavy_hitters``) and emits the key's
    current top-k — the stream twin of operators/sketch.py with the
    same guarantees, and state bounded by ``capacity`` entries per key
    no matter how many distinct items flow past."""

    _STATE_ATTRS = ("_hh",)

    def __init__(self, k: int = 5, capacity: int = 64, ttl_ms: int | None = None):
        super().__init__(ttl_ms)
        self._k = k
        self._capacity = capacity

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._hh = handle.getValueState(
            "hh", "counters map<string,bigint>, last_ts timestamp, last_eid long"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._hh.get()) if self._hh.exists() else None
        state = fold_heavy_hitters(prior, rows, self._capacity)
        self._hh.update(state)
        self._arm_ttl(timerValues)
        out = emit_heavy_hitters(key[0], state[0], self._k)
        if len(out):
            yield out


def streaming_heavy_hitters(
    events: DataFrame,
    k: int = 5,
    capacity: int = 64,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming heavy hitters via ``transformWithStateInPandas``
    — e.g. the top user_ids per event_type over an unbounded stream with
    ≤``capacity`` state entries per key.  Input needs (ts, event_id)
    for the ordering guard and an ``item`` string column; same protobuf
    note as streaming_compaction (the transition is the pure
    ``fold_heavy_hitters``, batch-equivalence fake-tested)."""
    return events.groupBy("group_key").transformWithStateInPandas(
        statefulProcessor=HeavyHittersPerKey(k, capacity, state_ttl_ms),
        outputStructType=HH_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )

# --------------------------------------------------------------------------
# Streaming MinHash near-dup dedup (r7 verdict item 7)
# --------------------------------------------------------------------------


def _unbox(v):
    """numpy scalar → native Python (ids must hash/sort/serialize the
    same whether they arrived via Arrow (numpy int64) or state replay
    (python int); strings pass through untouched)."""
    return v.item() if hasattr(v, "item") else v

#: streaming near-dup output: a candidate pair the moment the later doc
#: arrives, with the signature-estimated Jaccard that admitted it.
#: The ``long`` here is the long-id instance; ``streaming_minhash_pairs``
#: derives the actual pair schema from the caller's id dtype (string
#: doc_id corpora get ``id_a string, id_b string`` — same contract as
#: the batch ``_banded_minhash_keys``).
NEARDUP_OUTPUT_SCHEMA = "id_a long, id_b long, est_jaccard double"


def banded_signature_stream(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Stateless prefix of the streaming dedup: document → MinHash
    signature → one row per band ``(band, band_key, id, sig)``.

    All NARROW stages (shingle kernel, md5 expression, one mapInPandas
    signature pass), so it runs unchanged on a streaming frame; the
    signature arithmetic is the batch ``_banded_minhash_keys`` math
    bit-for-bit (same md5 base, same affine coeffs, same band-key
    string — bit-parity pinned against ``_banded_minhash_keys`` in
    tests/test_streaming.py), so streaming buckets agree with the batch
    band join and a replayed stream reproduces batch candidates exactly.
    The full signature rides along (``num_hashes`` int64s — bounded,
    unlike the shingle sets) because the stateful stage estimates
    Jaccard from signature agreement instead of re-reading document
    text.  The id column keeps the caller's dtype (string doc_ids work
    — same contract as the batch ``_banded_minhash_keys``)."""
    import numpy as np

    from kafka_merge_purge_spark.operators.dedup import (
        MERSENNE_61,
        _minhash_coeffs,
        md5_int,
        shingle_frame,
    )
    from pyspark.sql import functions as F

    rows_per_band = num_hashes // bands
    coeffs = _minhash_coeffs(num_hashes)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)
    id_type = dict(df.dtypes)[id_col]

    sh = shingle_frame(df, text_col, id_col, k)
    base = F.transform(F.col("sh"), lambda s: md5_int(s).bitwiseAND(F.lit((1 << 31) - 1)))
    hashed = sh.select("id", base.alias("_hs"))

    def keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_band, out_key, out_sig = [], [], [], []
            for rid, hs in zip(pdf["id"], pdf["_hs"]):
                import numpy as _np

                h = _np.asarray(hs, dtype=_np.int64)
                sig = ((h[:, None] * a_vec[None, :] + b_vec[None, :]) % MERSENNE_61).min(axis=0)
                for b in range(bands):
                    out_id.append(rid)
                    out_band.append(b)
                    out_key.append(
                        "_".join(str(int(x)) for x in sig[b * rows_per_band : (b + 1) * rows_per_band])
                    )
                    out_sig.append([int(x) for x in sig])
            yield pd.DataFrame(
                {"id": out_id, "band": out_band, "band_key": out_key, "sig": out_sig}
            )

    return hashed.mapInPandas(
        keys, schema=f"id {id_type}, band int, band_key string, sig array<long>"
    )


def fold_band_pairs(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    num_hashes: int = 16,
    est_threshold: float = 0.5,
    cap: int = 256,
) -> tuple:
    """Pure fold for ONE (band, band_key) bucket: new documents pair
    against every document already resident in the bucket's state, with
    estimated Jaccard = (matching signature components) / num_hashes —
    the standard MinHash estimator, so state is ``num_hashes`` int64s
    per resident doc and the heavy shingle sets never enter the state
    store.

    Returns ``(new_state, pairs)`` where state is ``(ids, flat_sigs)``
    (signatures concatenated at stride ``num_hashes``) and ``pairs`` is
    a list of ``(id_a, id_b, est_jaccard)`` with ``id_a < id_b``.

    Determinism: batch rows process in id order, redelivered ids are
    no-ops, and orientation normalizes to (min, max) so a pair is
    emitted exactly once, when the later-processed member arrives.
    The emitted PAIR SET is chop-invariant WHILE the bucket stays at or
    under ``cap`` residents — pinned under randomized chopped replays
    in tests/test_streaming.py.  ``cap`` bounds the bucket state to the
    ``cap`` LOWEST ids (a deterministic function of the ids seen, not
    arrival order); once a mega-bucket overflows, pairs against evicted
    residents are no longer emitted, and in THAT regime the set is
    chop-DEPENDENT: two above-cap ids in one micro-batch still pair
    (both are processed before the end-of-batch eviction), but split
    across batches the earlier one is evicted before the later arrives
    and the pair is dropped — the documented trade of bounded state
    (exercised in test_streaming_minhash_cap_semantics).  Ids keep the
    caller's dtype (ints or strings — anything hashable and totally
    ordered)."""
    ids: list = list(state[0]) if state is not None else []
    flat: list[int] = list(state[1]) if state is not None else []
    resident = {
        _unbox(i): flat[j * num_hashes : (j + 1) * num_hashes]
        for j, i in enumerate(ids)
    }
    pairs: list[tuple] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values("id")
        for rid, sig in zip(batch["id"], batch["sig"]):
            rid = _unbox(rid)
            if rid in resident:
                continue  # idempotent redelivery
            sig = [int(x) for x in sig]
            for oid, osig in resident.items():
                matches = sum(1 for x, y in zip(sig, osig) if x == y)
                est = round(matches / num_hashes, 6)
                if est >= est_threshold:
                    lo, hi = (rid, oid) if rid < oid else (oid, rid)
                    pairs.append((lo, hi, est))
            resident[rid] = sig
        if len(resident) > cap:
            keep = sorted(resident)[:cap]
            resident = {i: resident[i] for i in keep}
    new_ids = sorted(resident)
    new_flat = [x for i in new_ids for x in resident[i]]
    return ((new_ids, new_flat), pairs)


class BandNearDupPairs(_TtlProcessorBase, _StatefulProcessor):
    """Streaming near-dup processor: ValueState holds each band-bucket's
    resident (ids, signatures); the transition is the pure
    ``fold_band_pairs``.  TTL expiry drops the bucket — the processing-
    time analog of the watermark window the candidate match lives in."""

    _STATE_ATTRS = ("_bucket",)

    def __init__(
        self,
        num_hashes: int = 16,
        est_threshold: float = 0.5,
        cap: int = 256,
        ttl_ms: int | None = None,
        id_type: str = "long",
    ):
        super().__init__(ttl_ms)
        self._num_hashes = num_hashes
        self._est_threshold = est_threshold
        self._cap = cap
        self._id_type = id_type

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._bucket = handle.getValueState(
            "bucket", f"ids array<{self._id_type}>, sigs array<long>"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._bucket.get()) if self._bucket.exists() else None
        state, pairs = fold_band_pairs(
            prior, rows, self._num_hashes, self._est_threshold, self._cap
        )
        self._bucket.update(state)
        self._arm_ttl(timerValues)
        if pairs:
            yield pd.DataFrame(
                {
                    "id_a": [p[0] for p in pairs],
                    "id_b": [p[1] for p in pairs],
                    "est_jaccard": [p[2] for p in pairs],
                }
            )


def streaming_minhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    est_threshold: float = 0.5,
    state_cap: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash near-dup pairs — the stream twin of
    ``dedup.minhash_lsh_pairs`` (r7 verdict item 7): each arriving
    document is banded by the SAME signature arithmetic as the batch
    operator, then matched against the in-window residents of its band
    buckets via ``transformWithStateInPandas``; a candidate emits the
    moment its later member arrives, scored by the signature-estimated
    Jaccard (state holds ``num_hashes`` ints per resident, never
    shingle sets).

    A pair sharing several bands emits once per shared band —
    downstream, compose ``.withWatermark(...).dropDuplicates(
    ["id_a", "id_b"])`` (streaming-supported) for the distinct pair
    stream, mirroring the batch operator's cross-band dedup.

    State per bucket is ≤ ``state_cap`` signatures (lowest-id residents
    — deterministic), TTL-evicted after ``state_ttl_ms`` idle; same
    protobuf note as streaming_compaction (the transition is the pure
    ``fold_band_pairs``, batch-equivalence tested under randomized
    chopped replays in tests/test_streaming.py — invariant while
    buckets stay within ``state_cap``; see ``fold_band_pairs`` for the
    documented overflow divergence).  The pair schema follows the
    caller's id dtype, matching the batch operator."""
    id_type = dict(docs.dtypes)[id_col]
    banded = banded_signature_stream(docs, text_col, id_col, num_hashes, bands, k)
    return banded.groupBy("band", "band_key").transformWithStateInPandas(
        statefulProcessor=BandNearDupPairs(
            num_hashes, est_threshold, state_cap, state_ttl_ms, id_type
        ),
        outputStructType=f"id_a {id_type}, id_b {id_type}, est_jaccard double",
        outputMode="Append",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


# --------------------------------------------------------------------------
# Streaming Hamming near-dup (image/SimHash twin of the MinHash stream;
# r8 verdict item 6)
# --------------------------------------------------------------------------


def fold_hamming_pairs(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    max_hamming: int = 6,
    cap: int = 256,
) -> tuple:
    """Pure fold for ONE pigeonhole (band, band_key) bucket: new
    fingerprints pair against every resident at ``popcount(xor) ≤
    max_hamming`` — an EXACT verify, so unlike ``fold_band_pairs``'
    Jaccard estimate the emitted pair is final, not a candidate.  State
    is one int64 fingerprint per resident.

    Same determinism contract as ``fold_band_pairs``: id-ordered batch
    processing, idempotent redelivery, (min, max) orientation, pair set
    chop-invariant while the bucket stays within ``cap`` (the LOWEST
    ids are kept on overflow; above the cap the documented
    chop-divergence applies).  Ids keep the caller's dtype.

    Returns ``(new_state, pairs)``; state is ``(ids, fps)``, pairs is
    a list of ``(id_a, id_b, hamming)``."""
    ids: list = list(state[0]) if state is not None else []
    fps: list[int] = list(state[1]) if state is not None else []
    resident = {_unbox(i): int(f) for i, f in zip(ids, fps)}
    pairs: list[tuple] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values("id")
        for rid, fp in zip(batch["id"], batch["fp"]):
            rid = _unbox(rid)
            if rid in resident:
                continue  # idempotent redelivery
            fp = int(fp)
            for oid, ofp in resident.items():
                # Mask the xor to the 64-bit pattern before popcount:
                # Python ints are sign-extended, so a negative int64
                # fingerprint (bit 63 set) would otherwise count
                # magnitude bits and diverge from the batch
                # F.bit_count two's-complement popcount.
                h = ((fp ^ ofp) & 0xFFFFFFFFFFFFFFFF).bit_count()
                if h <= max_hamming:
                    lo, hi = (rid, oid) if rid < oid else (oid, rid)
                    pairs.append((lo, hi, h))
            resident[rid] = fp
        if len(resident) > cap:
            keep = sorted(resident)[:cap]
            resident = {i: resident[i] for i in keep}
    new_ids = sorted(resident)
    return ((new_ids, [resident[i] for i in new_ids]), pairs)


class HammingNearDupPairs(_TtlProcessorBase, _StatefulProcessor):
    """Streaming Hamming near-dup processor: ValueState holds each band
    bucket's resident (ids, fingerprints); the transition is the pure
    ``fold_hamming_pairs``.  TTL expiry drops the bucket."""

    _STATE_ATTRS = ("_bucket",)

    def __init__(
        self,
        max_hamming: int = 6,
        cap: int = 256,
        ttl_ms: int | None = None,
        id_type: str = "long",
    ):
        super().__init__(ttl_ms)
        self._max_hamming = max_hamming
        self._cap = cap
        self._id_type = id_type

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._bucket = handle.getValueState(
            "bucket", f"ids array<{self._id_type}>, fps array<long>"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._bucket.get()) if self._bucket.exists() else None
        state, pairs = fold_hamming_pairs(prior, rows, self._max_hamming, self._cap)
        self._bucket.update(state)
        self._arm_ttl(timerValues)
        if pairs:
            yield pd.DataFrame(
                {
                    "id_a": [p[0] for p in pairs],
                    "id_b": [p[1] for p in pairs],
                    "hamming": [p[2] for p in pairs],
                }
            )


def streaming_hamming_pairs(
    fp_df: DataFrame,
    id_col: str = "id",
    fp_col: str = "fp",
    bits: int = 32,
    max_hamming: int = 3,
    state_cap: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming near-dup pairs over ANY int64 fingerprint stream — the
    stream twin of ``dedup.hamming_banded_pairs``, sharing its band
    projection LITERALLY (``dedup.hamming_banded_frame`` runs unchanged
    on the streaming frame: filter + explode are narrow), so stream
    buckets equal batch buckets by construction.  Within a bucket the
    ``fold_hamming_pairs`` transition verifies exactly; by pigeonhole a
    qualifying pair shares ≥1 band, so the emitted distinct pair set
    equals the batch operator's (within ``state_cap``/TTL bounds —
    chopped-replay equivalence pinned in tests/test_streaming.py).  A
    pair sharing several bands emits once per shared band; compose
    ``.withWatermark(...).dropDuplicates(["id_a", "id_b"])`` downstream
    for the distinct stream, mirroring the batch cross-band dedup."""
    from kafka_merge_purge_spark.operators.dedup import hamming_banded_frame

    id_type = dict(fp_df.dtypes)[id_col]
    banded = hamming_banded_frame(fp_df, id_col, fp_col, bits, max_hamming)
    return banded.groupBy("band", "band_key").transformWithStateInPandas(
        statefulProcessor=HammingNearDupPairs(
            max_hamming, state_cap, state_ttl_ms, id_type
        ),
        outputStructType=f"id_a {id_type}, id_b {id_type}, hamming int",
        outputMode="Append",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


def streaming_image_neardup(
    images: DataFrame,
    max_hamming: int = 6,
    grid_rows: int = 7,
    grid_cols: int = 8,
    state_cap: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming image near-duplicate pairs — the multimodal flagship's
    streaming leg (r8 verdict item 6): each arriving (media_id, payload)
    is fingerprinted by the SAME narrow aHash kernel as the batch
    operator (``multimodal.decode_image_ahash`` is one mapInPandas
    pass — streaming-safe), pigeonhole-banded, and matched against the
    in-window residents of its band buckets.  Undecodable / sub-grid
    payloads carry NULL fingerprints and drop out at the banding.

    Equals ``multimodal.image_neardup_pairs`` on a replayed stream
    (distinct pairs, within state bounds) — the composition twin of
    streaming_minhash_pairs for text."""
    from kafka_merge_purge_spark.operators.multimodal import decode_image_ahash

    fps = decode_image_ahash(images, grid_rows, grid_cols)
    return streaming_hamming_pairs(
        fps,
        id_col="media_id",
        fp_col="ahash",
        bits=grid_rows * grid_cols,
        max_hamming=max_hamming,
        state_cap=state_cap,
        state_ttl_ms=state_ttl_ms,
    )


# --------------------------------------------------------------------------
# Streaming semantic (embedding cosine) near-dup — the vector twin of the
# MinHash and Hamming streams; completes the streaming dedup triad (r9)
# --------------------------------------------------------------------------


def quantized_cell_stream(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stateless prefix of the streaming semantic dedup: (id, vector) →
    ``(cell_id, id, qv)`` with the vector already quantized to the exact
    int64 grid the batch scorer uses (``dedup._quantize`` — floor(v·1e6
    + 0.5)), so the stateful stage's cosine is bit-identical to
    ``semantic_dedup``'s and state holds ints, never floats.

    Cell assignment runs against STORED centroids (a streaming job
    cannot fit; pass ``cluster.kmeans_fit`` output — the amortized
    x_kmeans pattern) as one narrow numpy pass: argmin of squared L2,
    first-min tie-break, matching ``cluster._assign_frame``'s GEMM
    regime.  NULL vectors drop (no cell — same contract as the batch
    operator)."""
    import numpy as np

    from kafka_merge_purge_spark.operators.dedup import _quantize

    c = np.asarray(centroids, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(c)
    id_type = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        cc = (cents * cents).sum(axis=1)
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cents.T) + cc[None, :]
            qv = _quantize(x)
            yield pd.DataFrame(
                {
                    "cell_id": (d2.argmin(axis=1) + 1).astype("int32"),
                    "id": pdf[id_col],
                    "qv": [row.tolist() for row in qv],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"cell_id int, id {id_type}, qv array<long>"
    )


def fold_cell_pairs(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    threshold: float = 0.95,
    cap: int = 256,
) -> tuple:
    """Pure fold for ONE k-means cell: each new quantized vector scores
    against every resident with the EXACT int64 dot + np.round cosine
    (bit-identical to ``dedup.score_candidate_pairs`` /
    ``semantic_dedup``'s GEMM prune), emitting ``(id_a, id_b, cos)``
    for pairs at ``cos ≥ threshold``.

    Same determinism contract as its MinHash/Hamming siblings:
    id-ordered batch processing, idempotent redelivery, (min, max)
    orientation, chop-invariant within ``cap`` (lowest ids kept on
    overflow; the documented divergence above it).  State is
    ``(ids, dim, flat_qvs)``."""
    import numpy as np

    ids: list = list(state[0]) if state is not None else []
    dim: int = int(state[1]) if state is not None else 0
    flat: list[int] = list(state[2]) if state is not None else []
    resident = {
        _unbox(i): flat[j * dim : (j + 1) * dim] for j, i in enumerate(ids)
    }
    pairs: list[tuple] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values("id")
        for rid, qv in zip(batch["id"], batch["qv"]):
            rid = _unbox(rid)
            if rid in resident:
                continue  # idempotent redelivery
            qv = [int(x) for x in qv]
            dim = len(qv)
            if resident:
                q = np.asarray(qv, dtype=np.int64)
                r_ids = list(resident)
                m = np.asarray([resident[i] for i in r_ids], dtype=np.int64)
                dots = m @ q
                aa = (m * m).sum(axis=1)
                bb = int((q * q).sum())
                cos = np.round(dots / (np.sqrt(aa) * np.sqrt(bb)), 6)
                for oid, cv in zip(r_ids, cos):
                    if cv >= threshold:
                        lo, hi = (rid, oid) if rid < oid else (oid, rid)
                        pairs.append((lo, hi, float(cv)))
            resident[rid] = qv
        if len(resident) > cap:
            keep = sorted(resident)[:cap]
            resident = {i: resident[i] for i in keep}
    new_ids = sorted(resident)
    new_flat = [x for i in new_ids for x in resident[i]]
    return ((new_ids, dim, new_flat), pairs)


class CellNearDupPairs(_TtlProcessorBase, _StatefulProcessor):
    """Streaming semantic near-dup processor: ValueState holds each
    cell's resident (ids, dim, quantized vectors); the transition is the
    pure ``fold_cell_pairs``.  TTL expiry drops the cell."""

    _STATE_ATTRS = ("_bucket",)

    def __init__(
        self,
        threshold: float = 0.95,
        cap: int = 256,
        ttl_ms: int | None = None,
        id_type: str = "long",
    ):
        super().__init__(ttl_ms)
        self._threshold = threshold
        self._cap = cap
        self._id_type = id_type

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._bucket = handle.getValueState(
            "bucket", f"ids array<{self._id_type}>, dim int, qvs array<long>"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._bucket.get()) if self._bucket.exists() else None
        state, pairs = fold_cell_pairs(prior, rows, self._threshold, self._cap)
        self._bucket.update(state)
        self._arm_ttl(timerValues)
        if pairs:
            yield pd.DataFrame(
                {
                    "id_a": [p[0] for p in pairs],
                    "id_b": [p[1] for p in pairs],
                    "cos": [p[2] for p in pairs],
                }
            )


def streaming_semantic_pairs(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    state_cap: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming semantic near-dup pairs — the embedding twin of
    ``streaming_minhash_pairs``/``streaming_hamming_pairs``, completing
    the streaming dedup triad (text shingles / image fingerprints /
    embedding cosine): each arriving vector is assigned to its stored
    k-means cell (narrow GEMM, ``quantized_cell_stream``), then scored
    against the cell's in-window residents with the exact quantized
    cosine via ``transformWithStateInPandas``; a pair emits the moment
    its later member arrives — batch-equivalence with ``semantic_dedup``
    pinned under randomized chopped replays in tests/test_streaming.py.

    Unlike the banded streams, a cell pair emits exactly ONCE (cells
    partition the space — no cross-band duplicate emission, no
    downstream dropDuplicates needed).  State per cell is ≤
    ``state_cap`` quantized vectors (lowest-id residents), TTL-evicted
    after ``state_ttl_ms`` idle."""
    id_type = dict(emb.dtypes)[id_col]
    tagged = quantized_cell_stream(emb, centroids, id_col, vec_col)
    return tagged.groupBy("cell_id").transformWithStateInPandas(
        statefulProcessor=CellNearDupPairs(
            threshold, state_cap, state_ttl_ms, id_type
        ),
        outputStructType=f"id_a {id_type}, id_b {id_type}, cos double",
        outputMode="Append",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


# --------------------------------------------------------------------------
# Streaming KMV distinct sketch (bottom-k) — the set-union fold
# --------------------------------------------------------------------------

KMV_OUTPUT_SCHEMA = "group_key string, distinct_est long, n_entries int, min_hash string"


def fold_kmv(
    state: dict | None,
    pdfs: Iterator[pd.DataFrame],
    k: int = 256,
) -> dict:
    """Pure KMV fold for streaming distinct counting: state is the
    ``value -> md5-hash`` dict of the ≤``k`` smallest-hash DISTINCT
    values seen so far (operators/sketch.py semantics, shared
    ``kmv_hash``/``_kmv_prune`` so the twins cannot drift).

    Stronger invariance class than the ordered folds: bottom-k of a set
    union is ORDER-INDEPENDENT and REDELIVERY-IDEMPOTENT outright —
    no (ts, event_id) high-water mark is needed, any chopping,
    reordering or duplication of the input multiset folds to the
    identical state (pinned under randomized replays incl. shuffles
    and redeliveries in tests/test_streaming.py)."""
    from kafka_merge_purge_spark.operators.sketch import _kmv_prune, kmv_hash

    entries = dict(state) if state is not None else {}
    for pdf in pdfs:
        for v in pdf["item"]:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                continue
            v = _unbox(v)
            if v not in entries:
                entries[v] = kmv_hash(v)
                if len(entries) > 4 * k:
                    _kmv_prune(entries, k)
    _kmv_prune(entries, k)
    return entries


def emit_kmv(key, entries: dict, k: int) -> pd.DataFrame:
    """Current distinct estimate of a key's KMV state — the same
    exact-below-capacity / ``(k-1)/U(h_k)``-at-capacity rule as the
    batch ``kmv_distinct_estimate``, computed on the driver-side ints."""
    n = len(entries)
    if n == 0:
        return pd.DataFrame(
            {"group_key": [], "distinct_est": [], "n_entries": [], "min_hash": []}
        )
    hashes = sorted(entries.values())
    if n < k:
        est = n
    else:
        frac = int(hashes[-1][:12], 16) / float(16**12)
        # floor(x + 0.5) = Spark F.round's HALF_UP, which the batch
        # kmv_distinct_estimate uses; Python round() is half-to-even
        # and would differ by 1 on exact-.5 ties.
        est = int(math.floor((k - 1) / frac + 0.5))
    return pd.DataFrame(
        {
            "group_key": [key],
            "distinct_est": [est],
            "n_entries": [n],
            "min_hash": [hashes[0]],
        }
    )


class KmvDistinctPerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming per-key approximate COUNT(DISTINCT) processor:
    ValueState holds each key's bounded bottom-k dict; every
    micro-batch set-unions its items in (pure ``fold_kmv``) and emits
    the key's current estimate — state ≤ ``k`` entries per key no
    matter how many distinct items flow past, and the state after any
    replay equals the batch ``grouped_kmv_sketch`` of the same rows."""

    _STATE_ATTRS = ("_kmv",)

    def __init__(self, k: int = 256, ttl_ms: int | None = None):
        super().__init__(ttl_ms)
        self._k = k

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._kmv = handle.getValueState("kmv", "entries map<string,string>")

    def handleInputRows(self, key, rows, timerValues):
        prior = self._kmv.get()[0] if self._kmv.exists() else None
        entries = fold_kmv(prior, rows, self._k)
        self._kmv.update((entries,))
        self._arm_ttl(timerValues)
        out = emit_kmv(key[0], entries, self._k)
        if len(out):
            yield out


def streaming_kmv_distinct(
    events: DataFrame,
    k: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming distinct counting via
    ``transformWithStateInPandas`` — e.g. live distinct visitors per
    event_type with ≤``k`` hashes of state per key.  Input needs
    (``group_key``, ``item`` string) columns; no ordering columns —
    the KMV fold is order-independent and redelivery-idempotent, so
    at-least-once upstream delivery needs no dedup stage at all."""
    return events.groupBy("group_key").transformWithStateInPandas(
        statefulProcessor=KmvDistinctPerKey(k, state_ttl_ms),
        outputStructType=KMV_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


# --------------------------------------------------------------------------
# Streaming Munro-Paterson quantiles — the sequential quantile fold
# --------------------------------------------------------------------------

MP_OUTPUT_SCHEMA = (
    "group_key string, n long, q_25 double, q_5 double, q_75 double, q_875 double"
)
MP_QS = (0.25, 0.5, 0.75, 0.875)


def fold_mp(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    k: int = 256,
) -> tuple:
    """Pure sequential Munro-Paterson fold for streaming quantiles:
    thread one key's digest through its record batches.  State is
    ``(digest, last_ts, last_event_id)`` — the bounded multi-level
    buffer summary (operators/sketch.py semantics via the shared
    ``mp_update``, so the twins cannot drift) plus the cross-batch
    high-water mark.

    Chop-invariant BY CONSTRUCTION like ``fold_heavy_hitters``: the
    digest transition is purely sequential, so folding one
    (ts, event_id)-ordered stream through any batch chop replays the
    identical update sequence (chunks concatenated and re-sorted per
    batch; cross-batch regressors dropped at the high-water mark —
    pinned under randomized splits incl. redeliveries)."""
    from kafka_merge_purge_spark.operators.sketch import mp_new, mp_update

    if state is None:
        digest, last_ts, last_eid = mp_new(), None, None
    else:
        digest = {
            "partial": list(state[0]["partial"]),
            "buffers": {int(lv): list(b) for lv, b in state[0]["buffers"].items()},
        }
        last_ts, last_eid = state[1], state[2]
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return (digest, last_ts, last_eid)
    batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    for ts, eid, v in zip(batch["ts"], batch["event_id"], batch["value"]):
        if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
            continue  # cross-batch regressor: drop, never fold out of order
        if v is not None and not pd.isna(v):
            mp_update(digest, float(v), k)
        last_ts, last_eid = ts, int(eid)
    return (digest, last_ts, last_eid)


def emit_mp(key, digest: dict) -> pd.DataFrame:
    """Current quantile estimates of a key's digest (the batch
    ``mp_quantiles`` selection rule — rank = ceil(q·n), exact rational
    arithmetic) plus the exact represented count."""
    from kafka_merge_purge_spark.operators.sketch import mp_count, mp_quantiles

    n = mp_count(digest)
    if n == 0:
        return pd.DataFrame(
            {"group_key": [], "n": [], "q_25": [], "q_5": [], "q_75": [], "q_875": []}
        )
    ests = mp_quantiles(digest, list(MP_QS))
    return pd.DataFrame(
        {
            "group_key": [key],
            "n": [n],
            "q_25": [ests[0]],
            "q_5": [ests[1]],
            "q_75": [ests[2]],
            "q_875": [ests[3]],
        }
    )


class MpQuantilesPerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming per-key quantiles processor: ValueState holds each
    key's bounded Munro-Paterson digest + high-water mark; every
    micro-batch folds its records in (pure ``fold_mp``) and emits the
    key's current quantiles — the stream twin of
    ``operators/sketch.grouped_mp_quantiles`` with the same error
    bound, state ≤ k·(levels+1) doubles per key forever."""

    _STATE_ATTRS = ("_mp",)

    def __init__(self, k: int = 256, ttl_ms: int | None = None):
        super().__init__(ttl_ms)
        self._k = k

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._mp = handle.getValueState(
            "mp",
            "partial array<double>, buffers map<string, array<double>>, "
            "last_ts timestamp, last_eid long",
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._mp.exists():
            partial, buffers, last_ts, last_eid = tuple(self._mp.get())
            prior = (
                {"partial": list(partial), "buffers": dict(buffers or {})},
                last_ts,
                last_eid,
            )
        else:
            prior = None
        digest, last_ts, last_eid = fold_mp(prior, rows, self._k)
        self._mp.update(
            (
                digest["partial"],
                {str(lv): buf for lv, buf in digest["buffers"].items()},
                last_ts,
                last_eid,
            )
        )
        self._arm_ttl(timerValues)
        out = emit_mp(key[0], digest)
        if len(out):
            yield out


def streaming_mp_quantiles(
    events: DataFrame,
    k: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming quantiles via ``transformWithStateInPandas``
    — e.g. live latency percentiles per endpoint with ≤ k·(levels+1)
    doubles of state per key.  Input needs (ts, event_id) for the
    ordering guard and a ``value`` double column; same protobuf note
    as streaming_compaction (the transition is the pure ``fold_mp``,
    batch-equivalence fake-tested)."""
    return events.groupBy("group_key").transformWithStateInPandas(
        statefulProcessor=MpQuantilesPerKey(k, state_ttl_ms),
        outputStructType=MP_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


# --------------------------------------------------------------------------
# Streaming SCD2 — the dataset-evolution family's streaming leg
# --------------------------------------------------------------------------


def fold_scd2(
    state: tuple | None,
    pdfs: Iterator[pd.DataFrame],
    attr_cols: tuple,
) -> tuple:
    """Pure sequential SCD-type-2 fold for one key: thread the OPEN
    version through record batches, emitting a CLOSED version row the
    moment any attribute changes (null-safe compare, matching the
    batch ``scd2_history``'s eqNullSafe lag).  State is ``(attrs
    tuple | None, valid_from, version, last_ts, last_event_id)`` — the
    open version plus the cross-batch high-water mark; returns
    ``(new_state, closed_rows)`` where each closed row is
    ``(attrs, valid_from, valid_to, version)``.

    Chop-invariant BY CONSTRUCTION like the other ordered folds
    (chunks concatenated + re-sorted per batch, cross-batch regressors
    dropped at the high-water mark): the closed-row STREAM and the
    final open version equal the single-pass replay under any batch
    chop — and the union of emitted closed rows + the open row equals
    the batch ``scd2_history`` of the same events (both pinned in
    tests/test_streaming.py)."""
    attrs, valid_from, version, last_ts, last_eid = (
        state if state is not None else (None, None, 0, None, None)
    )
    closed: list = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return (attrs, valid_from, version, last_ts, last_eid), closed
    batch = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    for _, r in batch.iterrows():
        ts, eid = r["ts"], int(r["event_id"])
        if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
            continue  # cross-batch regressor: drop, never fold out of order
        new_attrs = tuple(
            None if pd.isna(r[c]) else _unbox(r[c]) for c in attr_cols
        )
        if attrs is None:
            attrs, valid_from, version = new_attrs, ts, 1
        elif new_attrs != attrs:  # null-safe: None == None is NOT a change
            closed.append((attrs, valid_from, ts, version))
            attrs, valid_from, version = new_attrs, ts, version + 1
        last_ts, last_eid = ts, eid
    return (attrs, valid_from, version, last_ts, last_eid), closed


class Scd2PerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming SCD2 processor: ValueState holds each key's open
    version; every micro-batch folds its (ts, event_id)-ordered
    records in (pure ``fold_scd2``) and APPENDS the versions that
    closed this batch — the stream twin of
    ``operators/snapshot.scd2_history`` (closed rows match the batch
    build's non-NULL-valid_to rows exactly; the open version lives in
    state until its closing event arrives).  Attribute dtypes are
    derived from the caller's frame (string ids / typed attrs pass
    through — same contract as the near-dup processors)."""

    _STATE_ATTRS = ("_open",)

    def __init__(
        self,
        key_type: str,
        attr_cols: tuple,
        attr_types: tuple,
        ttl_ms: int | None = None,
    ):
        super().__init__(ttl_ms)
        self._attr_cols = tuple(attr_cols)
        self._attr_types = tuple(attr_types)
        self._key_type = key_type

    def init(self, handle) -> None:
        self._keep_handle(handle)
        attrs_schema = ", ".join(
            f"a{i} {t}" for i, t in enumerate(self._attr_types)
        )
        self._open = handle.getValueState(
            "open",
            f"{attrs_schema}, valid_from timestamp, version long, "
            "last_ts timestamp, last_eid long",
        )

    def handleInputRows(self, key, rows, timerValues):
        n_attr = len(self._attr_cols)
        if self._open.exists():
            row = tuple(self._open.get())
            prior = (tuple(row[:n_attr]), row[n_attr], row[n_attr + 1],
                     row[n_attr + 2], row[n_attr + 3])
        else:
            prior = None
        (attrs, valid_from, version, last_ts, last_eid), closed = fold_scd2(
            prior, rows, self._attr_cols
        )
        if attrs is not None:
            self._open.update(
                tuple(attrs) + (valid_from, version, last_ts, last_eid)
            )
        self._arm_ttl(timerValues)
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    **{
                        c: [row[0][i] for row in closed]
                        for i, c in enumerate(self._attr_cols)
                    },
                    "valid_from": [row[1] for row in closed],
                    "valid_to": [row[2] for row in closed],
                    "version": [row[3] for row in closed],
                }
            )


def streaming_scd2(
    events: DataFrame,
    key_col: str,
    attr_cols: list[str],
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming SCD2 history via ``transformWithStateInPandas``
    — closed version rows append as their closing events arrive; the
    open version per key is O(attrs) state.  Input needs (ts, event_id)
    for the ordering guard; output
    ``(key, *attr_cols, valid_from, valid_to, version)`` matches the
    batch ``scd2_history`` closed rows (same run-length semantics,
    fake-tested batch equivalence under randomized chops)."""
    dtypes = dict(events.dtypes)
    attr_schema = ", ".join(f"{c} {dtypes[c]}" for c in attr_cols)
    renamed = events.withColumnRenamed(key_col, "group_key")
    return renamed.groupBy("group_key").transformWithStateInPandas(
        statefulProcessor=Scd2PerKey(
            dtypes[key_col], tuple(attr_cols),
            tuple(dtypes[c] for c in attr_cols), state_ttl_ms,
        ),
        outputStructType=(
            f"key {dtypes[key_col]}, {attr_schema}, valid_from timestamp, "
            "valid_to timestamp, version long"
        ),
        outputMode="Append",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )


# --------------------------------------------------------------------------
# Streaming count-min — the additive frequency-sketch fold
# --------------------------------------------------------------------------

CM_OUTPUT_SCHEMA = "group_key string, item string, est long"


def cm_bucket_py(row: int, value: str, width: int) -> int:
    """Python twin of sketch._cm_bucket: ``int(md5(row ':' value)[:15],
    16) mod width`` — the identical 60-bit md5 cell, so a fold-built
    sketch equals the batch ``countmin_sketch`` cell-for-cell."""
    import hashlib

    return int(hashlib.md5(f"{row}:{value}".encode()).hexdigest()[:15], 16) % width


def fold_countmin(
    state: dict | None,
    pdfs: Iterator[pd.DataFrame],
    depth: int = 4,
    width: int = 256,
) -> dict:
    """Pure additive count-min fold: one key's ``(row, bucket) → cnt``
    dict updated with every item of the micro-batch.  Addition
    commutes, so the fold is chop/order-invariant BY CONSTRUCTION (no
    ordering columns needed) and the state after any replay equals the
    batch ``countmin_sketch`` of the same rows; state is ≤ depth·width
    counters per key regardless of stream length.  NOT redelivery-
    idempotent (counts are additive) — upstream must be exactly-once,
    the same contract as any counting aggregate."""
    counts: dict = dict(state) if state is not None else {}
    for pdf in pdfs:
        for v in pdf["item"]:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                continue
            s = str(_unbox(v))
            for i in range(depth):
                cell = (i, cm_bucket_py(i, s, width))
                counts[cell] = counts.get(cell, 0) + 1
    return counts


def emit_countmin(
    key, counts: dict, items: list[str], depth: int = 4, width: int = 256
) -> pd.DataFrame:
    """Frequency estimates for ``items`` from a fold-built sketch —
    ``min`` over the depth rows, the batch ``countmin_frequencies``
    rule on the same cells."""
    if not items:
        return pd.DataFrame({"group_key": [], "item": [], "est": []})
    ests = [
        min(counts.get((i, cm_bucket_py(i, s, width)), 0) for i in range(depth))
        for s in items
    ]
    return pd.DataFrame({"group_key": [key] * len(items), "item": items, "est": ests})


class CountMinPerKey(_TtlProcessorBase, _StatefulProcessor):
    """Streaming per-key count-min processor: ValueState holds each
    key's ``(row, bucket) → cnt`` cells (encoded ``"row:bucket"`` →
    long, ≤ depth·width entries per key forever); every micro-batch
    adds its items (pure ``fold_countmin``) and emits the CURRENT
    frequency estimate for each item that arrived in the batch — the
    batch ``countmin_frequencies`` min-rule on the same cells."""

    _STATE_ATTRS = ("_cm",)

    def __init__(self, depth: int = 4, width: int = 256, ttl_ms: int | None = None):
        super().__init__(ttl_ms)
        self._depth = depth
        self._width = width

    def init(self, handle) -> None:
        self._keep_handle(handle)
        self._cm = handle.getValueState("cm", "cells map<string,long>")

    def handleInputRows(self, key, rows, timerValues):
        prior = None
        if self._cm.exists():
            enc = self._cm.get()[0]
            prior = {
                (int(k.split(":")[0]), int(k.split(":")[1])): int(v)
                for k, v in enc.items()
            }
        pdfs = [pdf for pdf in rows if len(pdf)]
        items = sorted(
            {
                str(_unbox(v))
                for pdf in pdfs
                for v in pdf["item"]
                if v is not None and not (isinstance(v, float) and pd.isna(v))
            }
        )
        counts = fold_countmin(prior, iter(pdfs), self._depth, self._width)
        self._cm.update(({f"{i}:{b}": c for (i, b), c in counts.items()},))
        self._arm_ttl(timerValues)
        out = emit_countmin(key[0], counts, items, self._depth, self._width)
        if len(out):
            yield out


def streaming_countmin(
    events: DataFrame,
    depth: int = 4,
    width: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming count-min frequency estimates via
    ``transformWithStateInPandas`` — live per-item frequency with
    ≤ depth·width counters of state per key.  Input needs
    (``group_key``, ``item`` string) columns.  Addition commutes, so
    batch chops/orderings don't matter; upstream must be exactly-once
    (counting is NOT redelivery-idempotent — the fold_countmin
    contract)."""
    return events.groupBy("group_key").transformWithStateInPandas(
        statefulProcessor=CountMinPerKey(depth, width, state_ttl_ms),
        outputStructType=CM_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if state_ttl_ms is None else "ProcessingTime",
    )
