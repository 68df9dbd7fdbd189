"""Invariants of the driver contract in __spark_entry__.py.

The correctness gate records only the first 50 queries alphabetically —
the q_*/x_* naming convention exists to control that window, and these
tests keep it from silently rotting when queries are added or renamed.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_gate_window_is_exactly_the_primaries():
    qs = sorted(entry.queries())
    primaries = [q for q in qs if q.startswith("q_")]
    secondaries = [q for q in qs if q.startswith("x_")]
    assert len(primaries) == 50, (
        f"{len(primaries)} q_* queries — the driver gates exactly the first "
        "50 alphabetically; keep primaries at 50 and add new queries as x_*"
    )
    assert primaries + secondaries == qs  # q_* sorts wholly before x_*
    assert qs[:50] == primaries


#: the EXACT gated set, pinned (r3 verdict): adding or renaming a q_*
#: query silently displaces the alphabetical 50th row at the driver, so
#: any change to this set must edit this list consciously.
GATED_PRIMARIES = [
    "q_action_counts", "q_agg_distinct", "q_agg_revenue", "q_array_hof",
    "q_ask_rules", "q_asof_join", "q_compaction", "q_decode_props", "q_dedup_docs_exact", "q_dedup_events", "q_dsir",
    "q_edit_distance", "q_embedding_neardup", "q_filter_tombstones",
    "q_fingerprint", "q_fuzzy_dedup", "q_global_topn", "q_grouping_sets",
    "q_join_orders_customer", "q_lang_id", "q_media_features",
    "q_merge_all", "q_ngram_jaccard", "q_outer_join",
    "q_percentiles", "q_pipeline_e2e", "q_pivot", "q_proj_arith", "q_purge_all", "q_range_frame", "q_range_join",
    "q_range_join_binned", "q_rolling_hash", "q_rollup",
    "q_scalar_subquery", "q_scan_events", "q_scc_pregel", "q_semi_join", "q_sessionize",
    "q_setops", "q_sgns_corpus", "q_simhash", "q_similarity_topk", "q_skew_agg_salted",
    "q_skew_join_salted", "q_stats_agg", "q_string_funcs", "q_text_stats",
    "q_topk_per_group", "q_udtf_tokens",
]


def test_gate_window_matches_pinned_list():
    assert sorted(entry.queries())[:50] == GATED_PRIMARIES, (
        "the driver-gated 50-query window changed — if intentional, update "
        "GATED_PRIMARIES; if not, a new query name displaced a gated row"
    )


def test_every_primary_has_a_full_oracle():
    oracles = entry.oracle_sql()
    missing = [q for q in sorted(entry.queries())[:50] if q not in oracles]
    assert not missing, f"gated queries without oracle (rows-only slot wasted): {missing}"


def test_no_orphan_oracles():
    orphans = set(entry.oracle_sql()) - set(entry.queries())
    assert not orphans


def test_web_pipeline_composes_and_is_plan_bounded(spark):
    """The round-10 capstone composes without re-evaluation hazards:
    bounded exchange count, and the result equals the staged
    computation of its three stages at sf0.001."""
    import __spark_entry__ as m
    from pyspark.sql import functions as F

    from kafka_merge_purge_spark.operators.curation import (
        url_dedup,
        weighted_reservoir,
    )
    from kafka_merge_purge_spark.operators import text as tx

    sf = "/root/testdata/sf0.001"
    out = m.queries()["x_web_pipeline"](spark, sf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 12
    got = sorted(map(tuple, out.collect()))

    docs = m._t(spark, sf, "documents")
    keep = {r["keep_id"] for r in url_dedup(
        docs.select("doc_id", m._synth_url(F.col("doc_id")).alias("url"))
    ).collect()}
    surv = docs.filter(F.col("doc_id").isin(list(keep)))
    ent = {r["doc_id"]: r["entropy_bits"] for r in tx.char_entropy(surv).collect()}
    tok = {r["doc_id"]: r["n_tokens"] for r in tx.token_count(surv).collect()}
    gated = surv.filter(
        F.col("doc_id").isin([d for d in ent
                              if ent[d] >= 3.0 and tok.get(d, 0) >= 10])
    ).select("doc_id", "source").withColumn(
        "n_tokens", F.udf(lambda d: tok[d], "long")("doc_id")
    )
    want = sorted(map(tuple, weighted_reservoir(
        gated, "source", "doc_id", "n_tokens", k=10).collect()))
    assert got == want and got
