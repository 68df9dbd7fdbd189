"""The reference's record-routing verbs as declarative DataFrame transforms.

Reference semantics (all citations into /root/reference/src/..):

- tombstone filter: skip ``value IS NULL`` records unless explicitly
  merging tombstones (Ask.kt:45-48, MergeAll.kt:38-41, PurgeAll.kt:26-29)
- purge: for each *live* record emit ``(topic, partition, key, NULL)`` back
  to the SAME topic+partition — a log-compaction delete marker; never
  double-tombstone (Pipeline.kt:91-98, PipelineTest.kt:253-318)
- merge: emit ``(dest_topic, key, value)`` — partition left to the
  partitioner (2-arg ProducerRecord, MergeAll.kt:47) — then purge the
  source record (MergeAll.kt:48)
- ask: per-record 3-way router MERGE|PURGE|SKIP (Ask.kt:55-71); at scale
  the decision is a rule *expression* in the plan, with the interactive
  stdin path kept driver-side (cli.py)
- counters: merged/purged/skipped/printed totals (Ask.kt:38-40,75-80)

Every transform is narrow (select/filter/union) — no shuffle, no UDF, so
at 100 TB these are pure map stages that pipeline into the scan and the
sink with whole-stage codegen.  The only shuffles in this module are the
ones the semantics *require*: compaction (per-key argmax) and counters
(global aggregate), both with map-side partial aggregation.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_merge_purge_spark.model import is_tombstone


class Action(str, Enum):
    MERGE = "MERGE"
    PURGE = "PURGE"
    SKIP = "SKIP"


#: Output-leg tags, so a single routed frame can address multiple sinks.
MERGE_LEG = "merge"
PURGE_LEG = "purge"


def filter_tombstones(records: DataFrame, merge_tombstones: bool = False) -> DataFrame:
    """Drop tombstones unless --merge-tombstones (Ask.kt:45-48)."""
    if merge_tombstones:
        return records
    return records.filter(~is_tombstone())


def _value_null(records: DataFrame) -> Column:
    """A NULL literal typed as the frame's actual ``value`` dtype, so the
    purge leg unions cleanly with a binary, string, or struct payload and
    the SURVEY §1.4 "value stays its wire type" invariant holds without
    relying on union type-coercion."""
    return F.lit(None).cast(records.schema["value"].dataType)


def _headers_cols(records: DataFrame) -> list[Column]:
    """Opaque headers passthrough (MixedValue.kt:41-43): carried untouched
    when the frame has them, absent otherwise (batch snapshots)."""
    return [F.col("headers")] if "headers" in records.columns else []


def _src_cols() -> list[Column]:
    """Consumed-record provenance carried on every routed leg: the sink's
    transaction commits offsets for the SOURCE topic/partition it consumed
    (Pipeline.kt:43-52 keys the offsets map by ``record.topic()/
    partition()``), so a merge leg re-topiced to the destination must not
    lose where its row came from."""
    return [
        F.col("topic").alias("src_topic"),
        F.col("partition").alias("src_partition"),
        F.col("offset").alias("src_offset"),
    ]


def purge(records: DataFrame) -> DataFrame:
    """Tombstone projection: ``(topic, partition, key, NULL)`` for each
    live record, partition-preserving (Pipeline.kt:91-98).

    Records that are already tombstones are never re-purged
    (Pipeline.kt:93-95) — the filter keeps that invariant here rather than
    in the caller so composition can't violate it.
    """
    return records.filter(~is_tombstone()).select(
        F.col("topic"),
        F.col("partition"),
        *_src_cols(),
        F.col("key"),
        _value_null(records).alias("value"),
        *_headers_cols(records),
    )


def merge(records: DataFrame, dest_topic: str, merge_tombstones: bool = False) -> DataFrame:
    """Re-topic projection: live records addressed to ``dest_topic`` with
    partition NULL → chosen by the sink's partitioner (MergeAll.kt:47).

    ``merge_tombstones`` (reference ``-T``, MergeAll.kt:15-19) forwards
    tombstones to the destination as delete markers instead of dropping
    them."""
    src = records if merge_tombstones else records.filter(~is_tombstone())
    return src.select(
        F.lit(dest_topic).alias("topic"),
        F.lit(None).cast("int").alias("partition"),
        *_src_cols(),
        F.col("key"),
        F.col("value"),
        *_headers_cols(records),
    )


def merge_all(records: DataFrame, dest_topic: str, merge_tombstones: bool = False) -> DataFrame:
    """The flagship verb (MergeAll.kt:31-61): one scan, two routed output
    legs — merge to dest + purge back to source — as a single unioned
    frame tagged with ``leg`` so a partitioned sink can split it without
    rescanning.

    ``merge_tombstones`` (reference ``-T``, MergeAll.kt:15-19): tombstones
    are forwarded on the merge leg as delete markers; the purge leg still
    never re-tombstones them.

    Scale note: ``unionByName`` of two narrow projections over the same
    scan lets Spark reuse the exchange-free map stage; the sink (or a
    ``partitionBy("leg")`` write) splits the legs.
    """
    merge_src = records if merge_tombstones else records.filter(~is_tombstone())
    merge_leg = merge(merge_src, dest_topic, merge_tombstones).withColumn("leg", F.lit(MERGE_LEG))
    purge_leg = purge(records).withColumn("leg", F.lit(PURGE_LEG))
    return merge_leg.unionByName(purge_leg)


def purge_all(records: DataFrame) -> DataFrame:
    """purge-all = scan ∘ tombstone-filter ∘ purge (PurgeAll.kt:19-48)."""
    return purge(filter_tombstones(records))


def default_ask_rule() -> Column:
    """Deterministic stand-in for the interactive ActionSource
    (ActionSource.kt:9-27): error events merge, low-value clicks purge,
    the rest skip.  Expects ``event_type`` and ``evalue`` carried through
    ``records_from_events(extra_cols=...)``; callers supply their own
    Column for other policies."""
    return (
        F.when(F.col("event_type") == "error", F.lit(Action.MERGE.value))
        .when((F.col("event_type") == "click") & (F.col("evalue") < 10.0), F.lit(Action.PURGE.value))
        .otherwise(F.lit(Action.SKIP.value))
    )


def ask(
    records: DataFrame,
    dest_topic: str,
    action_rule: Column,
    merge_tombstones: bool = False,
) -> DataFrame:
    """Rule-routed ask (Ask.kt:35-83): tag each live record with an action,
    then produce the routed output legs:

    - MERGE → merge leg to ``dest_topic`` AND purge leg to source
      (Ask.kt:56-61: merge also purges)
    - PURGE → purge leg only (Ask.kt:62-66)
    - SKIP  → no output (Ask.kt:67-70)

    Returns a unioned frame with ``action`` and ``leg`` columns.  The
    blocking-stdin interactive mode lives in cli.py (driver-side), because
    a per-record stdin round-trip is antithetical to distributed execution
    — the rule expression is the scalable form.
    """
    live = filter_tombstones(records, merge_tombstones)
    decided = live.withColumn("action", action_rule)
    merge_leg = decided.filter(F.col("action") == Action.MERGE.value).select(
        F.lit(dest_topic).alias("topic"),
        F.lit(None).cast("int").alias("partition"),
        *_src_cols(),
        F.col("key"),
        F.col("value"),
        *_headers_cols(decided),
        F.col("action"),
        F.lit(MERGE_LEG).alias("leg"),
    )
    purge_leg = decided.filter(
        F.col("action").isin(Action.MERGE.value, Action.PURGE.value) & ~is_tombstone()
    ).select(
        F.col("topic"),
        F.col("partition"),
        *_src_cols(),
        F.col("key"),
        _value_null(decided).alias("value"),
        *_headers_cols(decided),
        F.col("action"),
        F.lit(PURGE_LEG).alias("leg"),
    )
    return merge_leg.unionByName(purge_leg, allowMissingColumns=False)


def ask_decisions(records: DataFrame, action_rule: Column, merge_tombstones: bool = False) -> DataFrame:
    """Just the per-record decisions (offset, action) — the auditable form
    of the routing switch, and the input to ``action_counts``."""
    live = filter_tombstones(records, merge_tombstones)
    return live.withColumn("action", action_rule)


def action_counts(decided: DataFrame) -> DataFrame:
    """Running counters (Ask.kt:38-40,75-80) as a grouped aggregate.

    Map-side partial aggregation makes this a near-free shuffle of ≤3
    rows per task at any scale.  Streaming: use ``observe()`` or a
    stateful agg (streaming/pipeline.py).
    """
    return decided.groupBy("action").agg(F.count(F.lit(1)).alias("n"))


def compaction(records: DataFrame) -> DataFrame:
    """Kafka log-compaction semantics: the last record per key wins; if the
    last record is a tombstone the key disappears; NULL keys are not
    compactable and are excluded (Kafka semantics the reference's purge
    verb targets, README.md:9-11).

    One shuffle on ``key`` (the window partition).  At 100 TB this is the
    canonical per-key argmax — AQE handles skewed keys; if a key set is
    known-skewed, pre-aggregating ``max(offset) per key`` and semi-joining
    back is the two-shuffle alternative with smaller sort state.

    Ordering is a TOTAL order — (offset desc, value desc NULLS LAST) —
    so duplicate offsets within a key (possible when a key spans source
    partitions) resolve deterministically: the max non-null value wins
    the tie, tombstones lose it.  The streaming twin
    (streaming/stateful.fold_latest) folds by the same order, which is
    what makes its batch-equivalence associativity claim hold on ties
    (r4 advice).
    """
    w = Window.partitionBy("key").orderBy(
        F.col("offset").desc(), F.col("value").desc()
    )
    return (
        records.filter(F.col("key").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .filter(~is_tombstone())
    )


def print_format(records: DataFrame) -> DataFrame:
    """Console-sink projection (Print.kt:25-59): the exact rendering of
    ConsumerRecord.kt:5-11 — ``Key:\\n{key}\\nValue:\\n{value}`` with
    ``<tombstone>`` for a NULL payload and ``<null>`` for a NULL key."""
    rendered = F.concat(
        F.lit("Key:\n"),
        F.coalesce(F.col("key"), F.lit("<null>")),
        F.lit("\nValue:\n"),
        F.coalesce(F.col("value"), F.lit("<tombstone>")),
    )
    return records.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        rendered.alias("rendered"),
    )
