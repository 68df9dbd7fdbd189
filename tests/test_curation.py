"""Corpus-curation tier: PII redaction, boilerplate line removal,
Gopher-rule filtering, importance sampling, domain-mixture weights.

Oracle parity (vs DuckDB) is checked by tools/parity.py; these tests pin
the SEMANTICS on hand-built frames where the expected answer is derivable
by hand, plus the plan shapes that make the tier scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_merge_purge_spark.operators.curation import (
    boilerplate_line_dedup,
    domain_mixture_weights,
    gopher_rules,
    importance_sample,
    redact_pii,
    synth_pii_text,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ---------------------------------------------------------------- PII


def test_redact_masks_every_injected_span(spark):
    df = _docs(spark, [(0, "plain words only", "en", "src0", 16),
                       (7, "more plain words", "en", "src1", 16)])
    out = redact_pii(synth_pii_text(df)).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 0 (≡0 mod 3) carries two e-mails; doc 7 one
    assert by_id[0]["n_email"] == 2 and by_id[7]["n_email"] == 1
    assert by_id[0]["n_ip"] == 1 and by_id[0]["n_phone"] == 1
    for r in out:
        t = r["text_redacted"]
        assert "@" not in t and "555" not in t
        assert "<EMAIL>" in t and "<IP>" in t and "<PHONE>" in t
        # original words untouched
        assert t.startswith(("plain words only", "more plain words"))


def test_redact_is_a_narrow_map(spark):
    df = _docs(spark, [(1, "a b", "en", "src0", 3)])
    plan = redact_pii(synth_pii_text(df))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection — no shuffle at any scale


def test_redact_leaves_pii_free_text_alone(spark):
    df = _docs(spark, [(2, "no pii here at all", "en", "src0", 18)])
    out = redact_pii(df.withColumn("pii_text", F.col("text"))).collect()[0]
    assert out["n_email"] == out["n_ip"] == out["n_phone"] == 0
    assert out["text_redacted"] == "no pii here at all"


# ------------------------------------------------- boilerplate lines


def test_line_dedup_removes_shared_lines_keeps_order(spark):
    # 8-token lines; docs 1 and 2 share their first line verbatim
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = _docs(
        spark,
        [
            (1, shared + " u1 u2 u3 u4 u5 u6 u7 u8", "en", "src0", 0),
            (2, shared + " v1 v2 v3 v4 v5 v6 v7 v8", "en", "src0", 0),
            (3, "x1 x2 x3 x4 x5 x6 x7 x8", "en", "src0", 0),
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_line_dedup(df).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_lines_removed"] == 1
    assert out[1]["text_clean"] == "u1 u2 u3 u4 u5 u6 u7 u8"
    assert out[2]["text_clean"] == "v1 v2 v3 v4 v5 v6 v7 v8"
    assert out[3]["n_lines_removed"] == 0
    assert out[3]["text_clean"] == "x1 x2 x3 x4 x5 x6 x7 x8"


def test_line_dedup_all_boilerplate_doc_survives_empty(spark):
    same = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = _docs(spark, [(1, same, "en", "s", 0), (2, same, "en", "s", 0)])
    out = {r["doc_id"]: r for r in boilerplate_line_dedup(df).collect()}
    for i in (1, 2):
        assert out[i]["n_lines_kept"] == 0 and out[i]["text_clean"] == ""


def test_line_dedup_never_broadcasts_the_boilerplate_set(spark):
    # the boilerplate set is UNBOUNDED (every duplicated doc pair
    # contributes all its lines) — membership must be a hash-keyed
    # window/join, never a broadcast that scales with corpus duplication
    df = _docs(spark, [(1, "a b c d e f g h", "en", "s", 0)])
    plan = boilerplate_line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "Window" in plan  # the min≠max membership pass


def test_line_dedup_higher_threshold_path(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [(i, shared + f" u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h", "en", "s", 0)
            for i in range(1, 4)]
    df = _docs(spark, rows)
    # min_docs=3: the shared line crosses 3 docs → removed on both paths
    out = {r["doc_id"]: r for r in boilerplate_line_dedup(df, min_docs=3).collect()}
    assert all(out[i]["n_lines_removed"] == 1 for i in (1, 2, 3))
    # min_docs=4: nothing crosses 4 docs → kept
    out4 = {r["doc_id"]: r for r in boilerplate_line_dedup(df, min_docs=4).collect()}
    assert all(out4[i]["n_lines_removed"] == 0 for i in (1, 2, 3))


# ------------------------------------------------------ Gopher rules


def test_gopher_rules_attribution(spark):
    good = " ".join(["the", "and"] + [f"word{i}" for i in range(18)])  # 20 toks
    short = "tiny text"                       # fails word-count rule
    repeated = " ".join(["dup"] * 30)         # fails top-word + stopword rules
    df = _docs(
        spark,
        [(1, good, "en", "s", len(good)),
         (2, short, "en", "s", len(short)),
         (3, repeated, "en", "s", len(repeated))],
    )
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["keep"] == 1 and all(
        out[1][c] == 1
        for c in ("rule_word_count", "rule_mean_len", "rule_stopwords", "rule_repetition")
    )
    assert out[2]["rule_word_count"] == 0 and out[2]["keep"] == 0
    assert out[3]["rule_repetition"] == 0 and out[3]["rule_stopwords"] == 0
    assert out[3]["top_word_frac"] == 1.0
    assert out[3]["keep"] == 0


def test_gopher_rules_is_a_narrow_map(spark):
    df = _docs(spark, [(1, "a b", "en", "s", 3)])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------ importance sampling


def test_importance_sample_weights_bound_acceptance(spark):
    # weight 1.0 rows (n_chars ≥ 200) are ALWAYS accepted: md5%1e6 < 1e6
    rows = [(i, "t", "en", "big", 500) for i in range(50)]
    rows += [(1000 + i, "t", "en", "small", 10) for i in range(50)]  # weight .05
    df = _docs(spark, rows)
    out = {r["source"]: r for r in importance_sample(df).collect()}
    assert out["big"]["n_accepted"] == 50
    assert out["big"]["chars_accepted"] == 50 * 500
    assert out["small"]["n_accepted"] < 50  # heavily downsampled


def test_importance_sample_is_deterministic(spark):
    df = _docs(spark, [(i, "t", "en", "s", i % 300) for i in range(100)])
    a = sorted(map(tuple, importance_sample(df).collect()))
    b = sorted(map(tuple, importance_sample(df).collect()))
    assert a == b


# ------------------------------------------------ domain mixture


def test_domain_mixture_weights_rebalance(spark):
    # src1 (target_raw 2) vs src3 (target_raw 4): equal token counts ⇒
    # mix_weight ratio equals target ratio
    rows = [(i, "a b c d", "en", "src1", 7) for i in range(10)]
    rows += [(100 + i, "a b c d", "en", "src3", 7) for i in range(10)]
    df = _docs(spark, rows)
    out = {r["source"]: r for r in domain_mixture_weights(df).collect()}
    assert out["src1"]["n_tokens"] == out["src3"]["n_tokens"] == 40
    assert abs(out["src3"]["mix_weight"] / out["src1"]["mix_weight"] - 2.0) < 1e-4
    # shares sum to 1 (up to rounding)
    assert abs(sum(r["actual_share"] for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r["target_share"] for r in out.values()) - 1.0) < 1e-5


def test_domain_mixture_totals_are_broadcast(spark):
    df = _docs(spark, [(1, "a b", "en", "src0", 3), (2, "c d", "en", "src1", 3)])
    plan = domain_mixture_weights(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------------ duplicate spans


def test_duplicate_spans_finds_maximal_shared_passage(spark):
    from kafka_merge_purge_spark.operators.dedup import duplicate_spans

    shared = "s1 s2 s3 s4 s5 s6 s7"          # 7 tokens → 5-grams at pos 1..3
    df = _docs(
        spark,
        [
            (1, shared + " a1 a2 a3 a4 a5", "en", "s", 0),
            (2, "b1 b2 " + shared + " b3", "en", "s", 0),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8", "en", "s", 0),  # no shared grams
        ],
    )
    out = {(r["doc_id"]): r for r in duplicate_spans(df, k=5, min_docs=2).collect()}
    # doc 1: shared passage is tokens 1..7 — ONE maximal span, not 3 gram hits
    assert out[1]["span_start"] == 1 and out[1]["span_end"] == 7
    assert out[1]["span_len"] == 7
    # doc 2: same passage shifted by its 2-token prefix
    assert out[2]["span_start"] == 3 and out[2]["span_end"] == 9
    assert 3 not in out


def test_duplicate_spans_shuffles_hashes_not_grams(spark):
    from kafka_merge_purge_spark.operators.dedup import duplicate_spans

    df = _docs(spark, [(1, "a b c d e f", "en", "s", 0)])
    plan = duplicate_spans(df)._jdf.queryExecution().executedPlan().toString()
    # FULL-CORPUS discipline: the gram kernel emits (id, pos, h) only —
    # gram strings structurally cannot ride the corpus-wide candidate
    # exchange (keyed on the 60-bit h).  The r11 exact-verify tier DOES
    # shuffle gram strings, but only for CANDIDATES (post-dup-filter,
    # duplicated-mass-bound), re-cut from per-doc token arrays.
    assert "MapInPandas" in plan
    kernel_lines = [ln for ln in plan.splitlines() if "MapInPandas" in ln]
    assert all("gram" not in ln for ln in kernel_lines)
    # the corpus candidate stage still exchanges on h
    assert any(
        "Exchange hashpartitioning(h#" in ln for ln in plan.splitlines()
    )


def test_duplicate_spans_exact_verify_kills_hash_collisions(spark, monkeypatch):
    """The r10 verdict's one correctness-at-scale hole: a 60-bit gram-hash
    collision between DIFFERENT grams must NOT fabricate a span (which
    scrub would then cut from a legitimate document).  Planted collision:
    force EVERY gram onto one hash value — membership must still be
    decided by token-level gram equality."""
    import kafka_merge_purge_spark.operators.dedup as dd

    orig = dd.positional_gram_hashes

    def total_collision(df, **kw):
        from pyspark.sql import functions as F

        return orig(df, **kw).withColumn("h", F.lit(0).cast("long"))

    monkeypatch.setattr(dd, "positional_gram_hashes", total_collision)

    # no shared 5-gram anywhere → zero spans even though every hash collides
    disjoint = _docs(
        spark,
        [
            (1, "a1 a2 a3 a4 a5 a6 a7 a8", "en", "s", 0),
            (2, "b1 b2 b3 b4 b5 b6 b7 b8", "en", "s", 0),
        ],
    )
    assert dd.duplicate_spans(disjoint, k=5, min_docs=2).collect() == []
    # ...and the cleaner removes nothing
    scrubbed = {
        r["doc_id"]: r
        for r in dd.scrub_duplicate_spans(disjoint, k=5, min_docs=2).collect()
    }
    assert all(r["n_dup_tokens"] == 0 for r in scrubbed.values())
    assert scrubbed[1]["text_scrubbed"] == "a1 a2 a3 a4 a5 a6 a7 a8"

    # a truly-shared passage is still found, exactly, under total collision
    shared = "s1 s2 s3 s4 s5 s6 s7"
    mixed = _docs(
        spark,
        [
            (1, shared + " a1 a2 a3 a4 a5", "en", "s", 0),
            (2, "b1 b2 " + shared + " b3", "en", "s", 0),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8", "en", "s", 0),
        ],
    )
    out = {r["doc_id"]: r for r in dd.duplicate_spans(mixed, k=5, min_docs=2).collect()}
    assert out[1]["span_start"] == 1 and out[1]["span_end"] == 7
    assert out[2]["span_start"] == 3 and out[2]["span_end"] == 9
    assert 3 not in out

    # min_docs > 2 path verifies on gram text too
    three = _docs(
        spark,
        [
            (1, shared + " a1 a2 a3", "en", "s", 0),
            (2, "b1 " + shared, "en", "s", 0),
            (3, shared + " c1 c2", "en", "s", 0),
            (4, "d1 d2 d3 d4 d5 d6 d7", "en", "s", 0),
        ],
    )
    out3 = {
        r["doc_id"]: r for r in dd.duplicate_spans(three, k=5, min_docs=3).collect()
    }
    assert set(out3) == {1, 2, 3} and out3[2]["span_start"] == 2


def test_positional_gram_kernel_matches_expression_twin(spark):
    from kafka_merge_purge_spark.operators.dedup import positional_gram_hashes
    from kafka_merge_purge_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(tuple, positional_gram_hashes(docs, vectorized=True).collect()))
    b = sorted(map(tuple, positional_gram_hashes(docs, vectorized=False).collect()))
    assert a == b and len(a) > 0


def test_scrub_removes_exactly_the_shared_passage(spark):
    from kafka_merge_purge_spark.operators.dedup import scrub_duplicate_spans

    shared = "s1 s2 s3 s4 s5 s6 s7"
    df = _docs(
        spark,
        [
            (1, shared + " a1 a2 a3 a4 a5", "en", "s", 0),
            (2, "b1 b2 " + shared, "en", "s", 0),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8", "en", "s", 0),
            (4, shared, "en", "s", 0),  # whole doc duplicated → scrubbed empty
        ],
    )
    out = {r["doc_id"]: r for r in scrub_duplicate_spans(df, k=5, min_docs=2).collect()}
    assert out[1]["text_scrubbed"] == "a1 a2 a3 a4 a5" and out[1]["n_dup_tokens"] == 7
    assert out[2]["text_scrubbed"] == "b1 b2"
    assert out[3]["text_scrubbed"] == "c1 c2 c3 c4 c5 c6 c7 c8"
    assert out[3]["n_dup_tokens"] == 0
    assert out[4]["text_scrubbed"] == "" and out[4]["n_dup_tokens"] == 7


# ------------------------------------------------ funnel / analytics


def test_funnel_stage_machine(spark):
    from datetime import datetime

    from kafka_merge_purge_spark.operators.analytics import funnel_stages

    rows = [
        # u1 completes the funnel in order
        (1, datetime(2024, 1, 1, 10), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 11), 1, "click", 0.0, "{}"),
        (3, datetime(2024, 1, 1, 12), 1, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE any view — must not count (stage 1 only)
        (4, datetime(2024, 1, 1, 9), 2, "purchase", 0.0, "{}"),
        (5, datetime(2024, 1, 1, 10), 2, "view", 0.0, "{}"),
        # u3: view then purchase with no click → stage 1
        (6, datetime(2024, 1, 1, 10), 3, "view", 0.0, "{}"),
        (7, datetime(2024, 1, 1, 11), 3, "purchase", 0.0, "{}"),
        # u4: never views → stage 0
        (8, datetime(2024, 1, 1, 10), 4, "error", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["user_id"]: r["funnel_stage"] for r in funnel_stages(df).collect()}
    assert out == {1: 3, 2: 1, 3: 1, 4: 0}


def test_chi_square_cells_reconstruct_marginals(spark):
    import __spark_entry__ as m

    out = m.queries()["x_chi_square"](spark, "/root/testdata/sf0.001").collect()
    total_obs = sum(r["observed"] for r in out)
    total_exp = sum(r["expected"] for r in out)
    # expected counts preserve the grand total (chi-square identity)
    assert abs(total_exp - total_obs) < 0.01
    assert all(r["chi2_contrib"] >= 0 for r in out)


def test_duplicate_spans_rejects_min_docs_below_two(spark):
    import pytest as _pytest

    from kafka_merge_purge_spark.operators.dedup import duplicate_spans

    df = _docs(spark, [(1, "a b c d e f", "en", "s", 0)])
    with _pytest.raises(ValueError, match="min_docs"):
        duplicate_spans(df, min_docs=1)


def test_duplicate_spans_caps_span_end_for_short_docs(spark):
    from kafka_merge_purge_spark.operators.dedup import duplicate_spans

    # identical 3-token docs with k=5: the whole text IS the single gram;
    # the span must claim 3 tokens, not k
    df = _docs(spark, [(1, "a b c", "en", "s", 0), (2, "a b c", "en", "s", 0)])
    out = {r["doc_id"]: r for r in duplicate_spans(df, k=5, min_docs=2).collect()}
    for i in (1, 2):
        assert out[i]["span_start"] == 1
        assert out[i]["span_end"] == 3 and out[i]["span_len"] == 3


def test_overlap_join_rejects_empty_keys(spark):
    import pytest as _pytest

    from kafka_merge_purge_spark.operators.rangejoin import interval_overlap_join

    left = _iv_frame(spark, [("a", 1, 0, 10)])
    right = _iv_frame(spark, [("a", 2, 5, 15)])
    with _pytest.raises(ValueError, match="equi key"):
        interval_overlap_join(left, right, [], "s", "e", "s", "e")


def _iv_frame(spark, rows):
    return spark.createDataFrame(rows, "k string, iid long, s long, e long")


def test_domain_mixture_tolerates_digitless_sources(spark):
    rows = [(1, "a b c d", "en", "web", 7), (2, "a b c d", "en", "src3", 7)]
    out = {r["source"]: r for r in domain_mixture_weights(_docs(spark, rows)).collect()}
    # digitless 'web' folds to number 0 → target_raw 1; nothing is NULL
    assert out["web"]["target_share"] is not None
    assert out["src3"]["mix_weight"] is not None
    assert abs(out["web"]["target_share"] + out["src3"]["target_share"] - 1.0) < 1e-5


def test_curation_pipeline_is_one_shuffle(spark):
    from kafka_merge_purge_spark.operators.curation import curation_pipeline

    df = _docs(spark, [(i, "the and word word2 word3 word4 word5 word6 word7 word8 word9", "en", f"src{i%3}", 60) for i in range(20)])
    plan = curation_pipeline(df)._jdf.queryExecution().executedPlan().toString()
    # redact → gopher → split collapse into one projection chain; the only
    # exchange is the final rollup's
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_curation_pipeline_matches_staged_composition(spark):
    # the fused single-projection pipeline must equal running the stages
    # one at a time with joins (the naive composition a user might write)
    from kafka_merge_purge_spark.operators.curation import (
        curation_pipeline,
        gopher_rules,
        redact_pii,
        synth_pii_text,
    )
    from kafka_merge_purge_spark.operators.text import train_test_split

    rows = [(i, " ".join(["the", "and"] + [f"w{i}{j}" for j in range(18)]), "en", f"src{i % 4}", 0)
            for i in range(30)]
    df = _docs(spark, rows)
    fused = {tuple(r) for r in curation_pipeline(df).collect()}

    red = redact_pii(synth_pii_text(df)).select(
        "doc_id", (F.col("n_email") + F.col("n_ip") + F.col("n_phone")).alias("n_pii"),
        "text_redacted")
    staged = (
        df.select("doc_id", "source")
        .join(red, "doc_id")
        .join(gopher_rules(red, text_col="text_redacted").select("doc_id", "n_tokens", "keep"), "doc_id")
        .join(train_test_split(df).select("doc_id", "split"), "doc_id")
        .filter(F.col("keep") == 1)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"),
             F.sum("n_pii").alias("n_pii"))
    )
    assert fused == {tuple(r) for r in staged.collect()}


# ------------------------------------------------ k-means clustering


def test_kmeans_assignment_covers_corpus(spark):
    from kafka_merge_purge_spark.operators.cluster import kmeans_assign
    from kafka_merge_purge_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = kmeans_assign(emb, k=4, iters=2)
    n = emb.count()
    assert a.count() == n                      # every vector assigned
    cids = {r["cluster_id"] for r in a.select("cluster_id").distinct().collect()}
    assert cids <= {1, 2, 3, 4} and len(cids) == 4  # all clusters live
    # deterministic: repeated fits give identical assignments
    b = kmeans_assign(emb, k=4, iters=2)
    assert sorted(map(tuple, a.select("vec_id", "cluster_id").collect())) == \
           sorted(map(tuple, b.select("vec_id", "cluster_id").collect()))


def test_kmeans_iterations_reduce_distortion(spark):
    import numpy as np

    from kafka_merge_purge_spark.operators.cluster import kmeans_assign
    from kafka_merge_purge_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb.orderBy("vec_id").collect()])

    def distortion(iters):
        rows = kmeans_assign(emb, k=4, iters=iters).orderBy("vec_id").collect()
        cid = np.array([r["cluster_id"] for r in rows])
        tot = 0.0
        for j in range(1, 5):
            pts = X[cid == j]
            if len(pts):
                tot += ((pts - pts.mean(axis=0)) ** 2).sum()
        return tot

    # Lloyd monotonicity (up to the 1e-9 centroid rounding): more rounds
    # never meaningfully increase within-cluster variance
    assert distortion(2) <= distortion(0) * (1 + 1e-6)


def test_kmeans_null_vectors_survive_with_null_cluster(spark):
    """NULL-vector rows keep their row with a NULL cluster_id in BOTH
    the normal and the empty-seed path (r5 advice: the filtered base
    used to drop them from one path only)."""
    from kafka_merge_purge_spark.operators.cluster import kmeans_assign

    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, None), (4, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(df, k=2, iters=1).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[3] is None
    assert out[1] is not None and out[2] is not None and out[4] is not None

    # empty-seed path: every vector NULL → all rows survive, all NULL cid
    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    out2 = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(all_null, k=2).collect()}
    assert out2 == {1: None, 2: None}


def test_boilerplate_min_docs_below_two_rejected(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="min_docs"):
        boilerplate_line_dedup(df, min_docs=1)


def test_kmeans_precomputed_centroids_identical(spark):
    """kmeans_assign(centroids=...) — the amortized-fit path — equals
    the per-call fit exactly (the fit is deterministic)."""
    from kafka_merge_purge_spark.operators.cluster import kmeans_assign, kmeans_fit
    from kafka_merge_purge_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_fit(emb, k=4, iters=2)
    a = sorted(map(tuple, kmeans_assign(emb, k=4, iters=2)
                   .select("vec_id", "cluster_id").collect()))
    b = sorted(map(tuple, kmeans_assign(emb, centroids=cents)
                   .select("vec_id", "cluster_id").collect()))
    assert a == b and len(a) > 0


def test_kmeans_parallel_init_beats_degenerate_lowest_id(spark):
    """r6 verdict item 5: lowest-id seeding degenerates when the first k
    ids are near-identical vectors (real ingest orders cluster by
    source) — all seeds land in ONE true cluster and Lloyd with few
    iters can't escape.  The k-means|| init (deterministic Bahmani
    oversampling) must seed spread-out and land materially lower
    inertia on such a corpus, while staying deterministic itself."""
    import random

    from kafka_merge_purge_spark.operators.cluster import (
        kmeans_fit,
        kmeans_inertia,
    )

    rng = random.Random(7)
    rows = []
    # ids 1..4: four near-identical vectors inside cluster A — the
    # degenerate lowest-id seed set
    centers = [[0.0, 0.0], [20.0, 0.0], [0.0, 20.0], [20.0, 20.0]]
    for i in range(1, 5):
        rows.append((i, [rng.gauss(0, 0.05), rng.gauss(0, 0.05)]))
    nid = 5
    for c in centers:
        for _ in range(40):
            rows.append((nid, [c[0] + rng.gauss(0, 0.5), c[1] + rng.gauss(0, 0.5)]))
            nid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    lowest = kmeans_fit(emb, k=4, iters=2)
    par = kmeans_fit(emb, k=4, iters=2, init="kmeans||")
    cost_lowest = kmeans_inertia(emb, lowest)
    cost_par = kmeans_inertia(emb, par)
    assert cost_par < cost_lowest * 0.5, (cost_par, cost_lowest)
    # determinism: the hash-coin construction repeats exactly
    assert kmeans_fit(emb, k=4, iters=2, init="kmeans||") == par
    # unknown init is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="init"):
        kmeans_fit(emb, k=4, iters=2, init="random")


def test_quality_classifier_exact_linear_scoring(spark):
    """r7 verdict item 8: the linear scorer's margin must equal the
    hand-computed exact-int dot product over the hashed features, the
    probability its sigmoid, and token-less docs must drop."""
    import hashlib
    import math

    from kafka_merge_purge_spark.operators.curation import quality_classifier

    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "gamma"), (3, "???")],
        "doc_id long, text string",
    )
    dim = 8
    weights = [0.5, -0.25, 1.0, 0.0, -1.5, 0.75, 0.125, -0.000001]
    bias = 0.25
    out = {r["doc_id"]: r for r in quality_classifier(df, weights, bias).collect()}
    assert set(out) == {1, 2}  # doc 3 has no alphanumeric tokens

    def bucket_sign(tok: str) -> tuple[int, int]:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        return (h >> 1) % dim, 1 if h % 2 == 0 else -1

    for doc, toks in ((1, ["alpha", "beta", "beta"]), (2, ["gamma"])):
        feats: dict[int, int] = {}
        for t in toks:
            b, s = bucket_sign(t)
            feats[b] = feats.get(b, 0) + s
        mi = sum(
            w * int(math.floor(weights[b] * 1e6 + 0.5)) for b, w in feats.items()
        ) + int(math.floor(bias * 1e6 + 0.5))
        margin = round(mi / 1e6, 6)
        assert out[doc]["margin"] == margin, (doc, out[doc]["margin"], margin)
        assert out[doc]["prob"] == round(1.0 / (1.0 + math.exp(-margin)), 6)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        quality_classifier(df, [])


def test_kmeans_parallel_init_string_ids(spark):
    """ADVICE r7: the per-round selection coin used id*(round+2) — NULL
    on string ids, so every round silently picked nothing and the init
    collapsed to ONE seed.  The hash-of-(id || ':round') coin must seed
    k real clusters on a string-id corpus."""
    import random

    from kafka_merge_purge_spark.operators.cluster import (
        kmeans_fit,
        kmeans_inertia,
        kmeans_parallel_init,
    )

    rng = random.Random(11)
    rows = []
    centers = [[0.0, 0.0], [20.0, 0.0], [0.0, 20.0], [20.0, 20.0]]
    nid = 0
    for c in centers:
        for _ in range(30):
            rows.append(
                (f"doc-{nid:04d}", [c[0] + rng.gauss(0, 0.5), c[1] + rng.gauss(0, 0.5)])
            )
            nid += 1
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    seeds = kmeans_parallel_init(emb, k=4)
    assert len(seeds) == 4  # not the 1-seed collapse
    # the seeds must spread across the 4 true clusters: a fit from them
    # lands near the known optimum (each point ~0.5σ from its center →
    # inertia ≈ 2·0.25·120 = 60; a collapsed init sits in the thousands)
    cents = kmeans_fit(emb, k=4, iters=2, init="kmeans||")
    assert kmeans_inertia(emb, cents) < 200.0
    # determinism on the string-id path too
    assert kmeans_fit(emb, k=4, iters=2, init="kmeans||") == cents


def test_kmeans_scored_frame_kernel_regime_matches_literal(spark):
    """ADVICE r7: above _MAX_LITERAL_CENTERS the k-means|| scoring and
    attraction passes switch from literal Catalyst arrays to a broadcast
    numpy kernel (codegen blowup guard).  Both regimes must agree on
    min-distances and attraction counts."""
    import random

    from kafka_merge_purge_spark.operators import cluster as cl

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    centers = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(150)]
    assert len(centers) > cl._MAX_LITERAL_CENTERS
    small = centers[: cl._MAX_LITERAL_CENTERS]

    # distances: kernel vs literal on the SAME (small) center set
    lit = {
        r["_id"]: r["_d2"]
        for r in base.withColumn("_d2", cl._min_dist_expr(F.col("_v"), small)).collect()
    }
    # force the kernel by calling the private frame builder on the big
    # set, then on the small set's padded twin is impossible — instead
    # compare the kernel on `small` via a temporarily lowered threshold
    old = cl._MAX_LITERAL_CENTERS
    try:
        cl._MAX_LITERAL_CENTERS = 1
        ker = {r["_id"]: r["_d2"] for r in cl._scored_frame(base, small).collect()}
        counts_ker = cl._attraction_counts(base, small)
    finally:
        cl._MAX_LITERAL_CENTERS = old
    for i in lit:
        assert abs(lit[i] - ker[i]) < 1e-9
    counts_lit = cl._attraction_counts(base, small)
    assert counts_lit == counts_ker
    # and the big set actually runs (no codegen failure) through init
    sc = cl._scored_frame(base, centers)
    assert sc.count() == 60


def test_gopher_rules_adaptive_cjk_token_granularity(spark):
    """r6 verdict item 6: with the default whitespace tokenizer a CJK
    document is ONE token — it auto-fails the word-count rule no matter
    its quality.  adaptive=True restores token-granular metrics (and is
    hash-identical on space-delimited ASCII, pinned below)."""
    from kafka_merge_purge_spark.operators.curation import gopher_rules

    cjk = "今日は良い天気ですね散歩に行きましょう公園の桜がきれいに咲いています"
    en = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, en), (2, cjk)], "doc_id long, text string"
    )
    plain = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    adap = {r["doc_id"]: r for r in gopher_rules(df, adaptive=True).collect()}
    # the degradation: one giant "word" fails the count rule
    assert plain[2]["n_tokens"] == 1 and plain[2]["rule_word_count"] == 0
    # adaptive: bigram granularity, count rule now meaningful
    assert adap[2]["n_tokens"] == len(cjk) - 1
    assert adap[2]["rule_word_count"] == 1
    assert adap[2]["mean_word_len"] == 2.0
    # identity on space-delimited ASCII: every metric equal
    assert tuple(plain[1]) == tuple(adap[1])


def test_duplicate_spans_adaptive_finds_cjk_boilerplate(spark):
    """Default whitespace gramming sees a space-free CJK doc as ONE gram
    (whole-document granularity — only exact doc dups pair); adaptive
    gramming localizes the shared passage inside otherwise-different
    documents."""
    from kafka_merge_purge_spark.operators import dedup as dd

    boiler = "これは共通の定型文でありすべての文書に現れます"
    a = "最初の文書の独自の内容がここにあります" + boiler
    b = boiler + "二番目の文書はまったく別の話題を扱います"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    # the degradation: ASCII normalization erases the CJK text entirely,
    # so BOTH docs collapse to the single "" gram — a bogus whole-doc
    # "span" of length 1, blind to where the shared passage actually is
    degraded = dd.duplicate_spans(df, k=5).collect()
    assert {(r["doc_id"], r["span_len"]) for r in degraded} == {(1, 1), (2, 1)}
    spans = {r["doc_id"]: r for r in dd.duplicate_spans(df, k=5, adaptive=True).collect()}
    assert set(spans) == {1, 2}
    # each doc's span covers (at least) the shared passage's grams
    assert spans[1]["span_len"] >= len(boiler) - 1
    assert spans[2]["span_len"] >= len(boiler) - 1
    # the scrubbed residual keeps the unique content only
    scrub = {r["doc_id"]: r for r in
             dd.scrub_duplicate_spans(df, k=5, adaptive=True).collect()}
    assert scrub[1]["n_dup_tokens"] >= len(boiler) - 1
    assert "共通の定型文" not in scrub[1]["text_scrubbed"].replace(" ", "")


def test_kmeans_assign_kernel_regime_matches_literal(spark):
    """r9: the literal-vs-GEMM regime split now also covers
    kmeans_fit's iteration assignment and kmeans_assign (previously
    only the k-means|| passes switched — the fit/assign built a
    ~9k-literal interpreted expression at auto-sized k).  Both regimes
    must agree on cluster ids (numpy argmin = array_position first-min
    tie-break), and the big-k assign must keep the row-set contract:
    NULL-vector rows survive with NULL cluster_id."""
    import random

    from kafka_merge_purge_spark.operators import cluster as cl

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    rows.append((999, None))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]

    lit = {
        r["vec_id"]: r["cluster_id"]
        for r in cl.kmeans_assign(emb, centroids=centers).collect()
    }
    old = cl._MAX_LITERAL_CENTERS
    try:
        cl._MAX_LITERAL_CENTERS = 1  # force kernel + join path
        ker = {
            r["vec_id"]: r["cluster_id"]
            for r in cl.kmeans_assign(emb, centroids=centers).collect()
        }
        # the fit loop also rides the kernel in this regime
        cents_ker = cl.kmeans_fit(emb, k=5, iters=2)
    finally:
        cl._MAX_LITERAL_CENTERS = old
    assert ker == lit and ker[999] is None and len(ker) == 61
    cents_lit = cl.kmeans_fit(emb, k=5, iters=2)
    assert [[round(x, 6) for x in c] for c in cents_ker] == [
        [round(x, 6) for x in c] for c in cents_lit
    ]
    # and a genuinely big center set runs end to end (no codegen blowup)
    big = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(150)]
    assert cl.kmeans_assign(emb, centroids=big).count() == 61


def test_gopher_keep_filter_survives_joins(spark):
    """r9 regression (Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND): the
    stopword rule's old HOF form captured the outer `toks` attribute
    inside a lambda; once CollapseProject inlined the keep-predicate
    into a join-side Filter, Spark 4.1 failed to bind the captured
    reference at execution.  The array_intersect form is value-identical
    and join-safe — this pins the exact composition that crashed."""
    from kafka_merge_purge_spark.operators.curation import (
        gopher_rules,
        redact_pii,
        synth_pii_text,
    )
    from kafka_merge_purge_spark.operators.text import tokens

    docs = _docs(
        spark,
        [(i, "the and of word1 word2 word3 word4 word5 word6 word7", "en", "s", 50)
         for i in range(12)],
    )
    red = redact_pii(synth_pii_text(docs)).select("doc_id", "text_redacted")
    g = gopher_rules(
        red.withColumn("toks", tokens(F.col("text_redacted"))),
        text_col="text_redacted",
        tokens_col="toks",
    )
    out = (
        g.filter(F.col("keep") == 1)
        .select("doc_id", "n_tokens")
        .join(docs.select("doc_id"), "doc_id")
    )
    assert out.count() == 12  # executes without the binding crash


def test_llm_pipeline_composes_and_plan_bounded(spark):
    """r8 verdict item 7: the composed mega-pipeline equals its staged
    computation (quality gate ∩ Gopher keep ∩ SemDeDup keep, packed by
    redacted token counts in id order), and the one-plan composition is
    exchange-bounded — the passthrough packing means no join-back
    re-evaluates the survivor subtree."""
    import random

    from kafka_merge_purge_spark.operators.curation import (
        gopher_rules,
        llm_curation_pipeline,
        quality_classifier,
        redact_pii,
        synth_pii_text,
    )
    from kafka_merge_purge_spark.operators.dedup import semantic_dedup
    from kafka_merge_purge_spark.operators.text import tokens

    rng = random.Random(3)
    docs = spark.createDataFrame(
        [(i, "the and of " + " ".join(f"w{rng.randrange(40)}" for _ in range(30)))
         for i in range(30)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(28)]
        + [(28, None)],  # a doc with a NULL embedding row: sem drops it,
        "vec_id long, embedding array<double>",  # the pipeline keeps it
    )
    weights, bias, cap = [0.3] * 16, 0.2, 64
    out = llm_curation_pipeline(
        docs, emb, weights=weights, bias=bias, k=2, capacity=cap,
        synth_pii=True,  # staged reference below injects synthetic PII
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r9 pinned bound: 26 at first gate, 12 after the GEMM prune +
    # zero-shuffle quality kernel landed — regressions show up here
    assert plan.count("Exchange") <= 14
    # python_barrier contract: the keep-filter must be a plain attribute
    # comparison, never the inlined Gopher metric chain (the top-word
    # HOF re-evaluated per row was an 8.5 s regression)
    keep_filters = [
        l for l in plan.splitlines() if "Filter" in l and "keep#" in l
    ]
    assert keep_filters and all(
        "array_max" not in l and "aggregate(" not in l for l in keep_filters
    )
    got = {r["doc_id"]: r for r in out.collect()}

    # staged reference
    qok = {
        r["doc_id"]
        for r in quality_classifier(docs, weights, bias).collect()
        if r["prob"] >= 0.5
    }
    red = redact_pii(synth_pii_text(docs)).select("doc_id", "text_redacted")
    gr = {
        r["doc_id"]: r["n_tokens"]
        for r in gopher_rules(
            red.withColumn("toks", tokens(F.col("text_redacted"))),
            text_col="text_redacted", tokens_col="toks",
        ).collect()
        if r["keep"] == 1
    }
    sem = {
        r["vec_id"]: (r["cell_id"], r["is_kept"])
        for r in semantic_dedup(emb, threshold=0.4, k=2).collect()
    }
    want_ids = {
        d for d in gr
        if d in qok and (d not in sem or sem[d][1] == 1)
    }
    assert set(got) == want_ids and got
    assert 28 not in sem  # NULL embedding dropped from the dedup frame
    if 28 in want_ids:
        assert got[28]["cell_id"] is None  # pipeline kept it, cell NULL
    before = 0
    for d in sorted(want_ids):
        assert got[d]["n_tokens"] == gr[d]
        assert got[d]["tokens_before"] == before
        assert got[d]["shard_id"] == before // cap
        before += gr[d]


def test_quality_classifier_kernel_equals_agg(spark):
    """r9: the zero-shuffle kernel form must equal the explode+aggregate
    form row for row (same md5→bucket→±sign arithmetic, same quantized
    dot, same margin/sigmoid expressions) — including degenerate docs
    (no alphanumerics → no row), NULL text, and punctuation-heavy
    normalization edges."""
    from kafka_merge_purge_spark.operators.curation import quality_classifier

    rows = [
        (1, "the quick brown fox"),
        (2, "  MIXED case,   punctuation!! and-dashes "),
        (3, "???"),          # no alnum: dropped by both forms
        (4, None),           # NULL: dropped by both forms
        (5, "a"),
        (6, "numbers 123 and 456 tokens tokens tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = [((j * 37) % 13 - 6) / 10.0 for j in range(64)]
    kern = {tuple(r) for r in quality_classifier(df, w, 0.1).collect()}
    agg = {tuple(r) for r in quality_classifier(df, w, 0.1, impl="agg").collect()}
    assert kern == agg and len(kern) == 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="impl"):
        quality_classifier(df, w, impl="svm")


def test_quality_classifier_kernel_matches_agg_non_ascii(spark):
    """r9 ADVICE (low): the kernel's Python str.lower() vs the agg
    form's JVM lower().  Spark 4's UTF8_BINARY lower implements the
    locale-invariant Unicode default mapping — same as Python — so the
    two physical forms must agree bit-for-bit on the notorious cases
    too: dotted-İ (→ i + combining dot, squeezed to 'i '), KELVIN K,
    final sigma, titlecase ǅ, ﬁ-ligature, ĳ, sharp-ß."""
    from kafka_merge_purge_spark.operators.curation import quality_classifier

    docs = spark.createDataFrame(
        [
            (1, "İstanbul I İĲK text1"),
            (2, "KELVIN K degrees 273"),
            (3, "ΣΙΣΥΦΟΣ mixed ascii tail"),
            (4, "ǅungla ǄX ﬁle FI"),
            (5, "STRASSE ẞ ß plain9"),
            (6, "normal ascii words only 42"),
        ],
        "doc_id long, text string",
    )
    weights = [((i * 37) % 11 - 5) / 10.0 for i in range(16)]
    kern = sorted(
        map(tuple, quality_classifier(docs, weights, bias=0.1).collect())
    )
    agg = sorted(
        map(tuple, quality_classifier(docs, weights, bias=0.1, impl="agg").collect())
    )
    assert kern == agg and len(kern) == 6


def test_llm_pipeline_defaults_to_real_text_no_synth_pii(spark):
    """r9 ADVICE (medium): llm_curation_pipeline must NOT pollute the
    caller's corpus by default — synth_pii=False redacts the real text,
    so Gopher token counts / packing budgets are computed over what the
    caller supplied; synth_pii=True (the gate's knob) appends the
    synthetic PII block and inflates the counts."""
    from kafka_merge_purge_spark.operators.curation import llm_curation_pipeline

    docs = spark.createDataFrame(
        [(i, "the and of " + " ".join(f"tok{j}" for j in range(30))) for i in range(8)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    w = [0.3] * 16
    real = {r["doc_id"]: r["n_tokens"] for r in
            llm_curation_pipeline(docs, emb, weights=w, k=2, prob_min=0.0).collect()}
    injected = {r["doc_id"]: r["n_tokens"] for r in
                llm_curation_pipeline(docs, emb, weights=w, k=2, prob_min=0.0,
                                      synth_pii=True).collect()}
    assert real and set(real) == set(injected)
    # every doc's text is 33 tokens; the synthetic PII block adds more
    assert all(n == 33 for n in real.values())
    assert all(injected[d] > real[d] for d in real)


def test_canonical_url_normalization_branches(spark):
    """Every normalization branch: case, www, default ports (scheme-
    matched), trailing slash, tracking params, param sort, fragment;
    non-default ports and unknown schemes survive; plan is a pure
    narrow map."""
    from kafka_merge_purge_spark.operators.curation import canonical_url, url_dedup

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
        (2, "https://example.com/a/b?a=1&b=2"),
        (3, "http://Example.com:80"),
        (4, "http://example.com/"),
        (5, "https://example.com/a/b?gclid=zz&b=2&utm_campaign=y&a=1"),
        (6, "https://site.org:8443/path?ref=tw&z=9"),   # non-default port kept
        (7, "ftp://host.net:443/f"),                    # unknown scheme: port kept
        (8, "https://example.com/a/b?sessionid=s&a=1&b=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"] for r in canonical_url(df).collect()}
    assert got[1] == got[2] == got[5] == got[8] == "https://example.com/a/b?a=1&b=2"
    assert got[3] == got[4] == "http://example.com"
    # bare `ref` is content-bearing (branch/pagination) — NOT stripped by
    # default (r10 ADVICE); params still sort bytewise
    assert got[6] == "https://site.org:8443/path?ref=tw&z=9"
    assert got[7] == "ftp://host.net:443/f"

    # corpora where ref IS tracking noise opt in per call
    from kafka_merge_purge_spark.operators.curation import TRACKING_PARAM_KEYS

    got_ref = {
        r["doc_id"]: r["canonical_url"]
        for r in canonical_url(
            df, tracking_keys=TRACKING_PARAM_KEYS + ("ref",)
        ).collect()
    }
    assert got_ref[6] == "https://site.org:8443/path?z=9"
    assert got_ref[1] == got[1]  # other branches unaffected

    dd_ = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert dd_["https://example.com/a/b?a=1&b=2"]["keep_id"] == 1
    assert dd_["https://example.com/a/b?a=1&b=2"]["n_fetches"] == 4
    assert dd_["http://example.com"]["keep_id"] == 3

    plan = canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_reservoir_quota_and_bias(spark):
    """A-ES semantics: exactly k rows per group (fewer only when the
    group is smaller), deterministic across invocations, non-positive/
    NULL weights never sampled, and heavy weights win far more often
    than their row share (10x-weight rows are 10% of rows but take
    ~half the samples across 40 groups)."""
    from kafka_merge_purge_spark.operators.curation import weighted_reservoir

    rows = [
        (g, g * 1000 + i, 10.0 if i < 5 else 1.0)
        for g in range(40)
        for i in range(50)
    ]
    rows += [(0, 99991, 0.0), (0, 99992, None), (1, 99993, -3.0)]
    df = spark.createDataFrame(rows, "g int, id long, w double")
    out = weighted_reservoir(df, "g", "id", "w", k=5).collect()
    per_group: dict = {}
    for r in out:
        per_group.setdefault(r["g"], []).append(r)
        assert r["id"] < 99991  # degenerate weights never sampled
    assert all(len(v) == 5 for v in per_group.values()) and len(per_group) == 40
    assert all(sorted(x["rank"] for x in v) == [1, 2, 3, 4, 5]
               for v in per_group.values())
    heavy = sum(1 for r in out if r["id"] % 1000 < 5) / len(out)
    assert 0.3 < heavy < 0.7  # expected ~0.5 (weight share 50/95)

    again = weighted_reservoir(df, "g", "id", "w", k=5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    # tiny group: returns the whole group
    tiny = spark.createDataFrame([(9, 1, 2.0), (9, 2, 1.0)], "g int, id long, w double")
    assert weighted_reservoir(tiny, "g", "id", "w", k=5).count() == 2


def test_weighted_reservoir_nan_weight_screened(spark):
    """Spark orders NaN above every number, so NaN > 0 passes the
    positivity screen; the operator must drop NaN weights explicitly or
    the NaN sort key scrambles the ranking."""
    from kafka_merge_purge_spark.operators.curation import weighted_reservoir

    df = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, float("nan")), (1, 3, 1.0)],
        "g int, id long, w double",
    )
    out = weighted_reservoir(df, "g", "id", "w", k=3).collect()
    assert sorted(r["id"] for r in out) == [1, 3]


# --------------------------------------------------------------------------
# DSIR (r13)
# --------------------------------------------------------------------------

def test_dsir_select_prefers_target_like_docs(spark):
    """Planted two-domain corpus: selection at k=10 must be dominated
    by documents sharing the target domain's vocabulary; deterministic
    across invocations; k validated; NULL text tolerated."""
    from kafka_merge_purge_spark.operators.curation import dsir_select
    import pytest as _pytest

    alpha = [
        (i, f"alpha beta gamma delta run {i % 3} alpha beta") for i in range(20)
    ]
    zulu = [
        (i + 100, f"zulu yankee xray whiskey jump {i % 3} zulu yankee")
        for i in range(20)
    ]
    corpus = spark.createDataFrame(
        alpha + zulu + [(999, None)], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(1000 + j, "alpha beta gamma delta alpha") for j in range(3)],
        "doc_id long, text string",
    )
    sel = dsir_select(corpus, target, k=10).collect()
    assert len(sel) == 10
    n_alpha = sum(1 for r in sel if r["doc_id"] < 100)
    assert n_alpha >= 8, f"only {n_alpha}/10 selections from the target domain"
    # scores separate the domains: every alpha doc outscores every zulu doc
    all_scored = dsir_select(corpus, target, k=41).collect()
    amin = min(r["score_q"] / r["n_grams"] for r in all_scored if r["doc_id"] < 100)
    zmax = max(
        r["score_q"] / r["n_grams"] for r in all_scored if 100 <= r["doc_id"] < 999
    )
    assert amin > zmax
    again = dsir_select(corpus, target, k=10).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, sel))
    with _pytest.raises(ValueError, match="k must be"):
        dsir_select(corpus, target, k=0)
    # empty target: smoothing keeps every ratio finite, selection still k
    empty_t = spark.createDataFrame([], "doc_id long, text string")
    assert len(dsir_select(corpus, empty_t, k=5).collect()) == 5
