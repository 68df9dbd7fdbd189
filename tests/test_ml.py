"""operators/ml.py — distributed logistic regression.

Weights are ~1-ulp run-nondeterministic (float gradient sums across
partitions), so these pins are semantic — recovered accuracy, loss
descent, de-standardization algebra — not bit-exact values.  The gate
entry x_logreg is rows-only by the same convention.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_merge_purge_spark.operators.ml import (
    logreg_fit,
    logreg_predict,
    logreg_weights_frame,
)

FEATS = ["x1", "x2"]


def _separable(spark, n=400, gap=0.25, seed=7):
    rng = random.Random(seed)
    rows = []
    while len(rows) < n:
        x1, x2 = rng.uniform(-3, 3), rng.uniform(-3, 3)
        m = x1 + x2 - 0.5
        if abs(m) < gap:
            continue
        rows.append((x1, x2, 1 if m > 0 else 0))
    return spark.createDataFrame(rows, "x1 double, x2 double, y int")


def _accuracy(scored, label="y"):
    return scored.agg(
        F.avg((F.col("pred") == F.col(label)).cast("double"))
    ).collect()[0][0]


def test_separable_concept_recovered(spark):
    df = _separable(spark)
    model = logreg_fit(df, FEATS, "y", rounds=30, lr=1.0)
    assert _accuracy(logreg_predict(df, model)) == 1.0
    # the true boundary is x1 + x2 = 0.5: weights near-equal, bias
    # opposes the margin offset
    w = model["weights"]
    assert w["x1"] > 0 and w["x2"] > 0
    assert abs(w["x1"] - w["x2"]) < 0.5 * abs(w["x1"])
    assert model["bias"] < 0


def test_loss_descends_below_coin_flip(spark):
    df = _separable(spark)
    m1 = logreg_fit(df, FEATS, "y", rounds=1, lr=1.0)
    m30 = logreg_fit(df, FEATS, "y", rounds=30, lr=1.0)
    # round 1 records the loss AT w=0: exactly ln 2
    assert m1["loss"] == pytest.approx(math.log(2.0))
    assert m30["loss"] < 0.2


def test_destandardization_is_raw_space(spark):
    """Scoring with the returned RAW-space weights must equal scoring
    inside the standardized space the trainer used."""
    df = _separable(spark)
    model = logreg_fit(df, FEATS, "y", rounds=10, lr=1.0)
    # recompute the margin by hand in raw space for one row
    row = df.limit(1).collect()[0]
    m = model["bias"] + sum(
        model["weights"][c] * row[c] for c in FEATS
    )
    prob = logreg_predict(df.limit(1), model).collect()[0]["prob"]
    assert prob == pytest.approx(1.0 / (1.0 + math.exp(-m)))


def test_constant_feature_gets_zero_weight(spark):
    df = _separable(spark).withColumn("x3", F.lit(5.0))
    model = logreg_fit(df, ["x1", "x2", "x3"], "y", rounds=10, lr=1.0)
    # σ := 1 guard: a constant column contributes zero gradient signal
    assert model["weights"]["x3"] == 0.0
    assert _accuracy(logreg_predict(df, model)) == 1.0


def test_l2_shrinks_weights(spark):
    df = _separable(spark)
    free = logreg_fit(df, FEATS, "y", rounds=20, lr=1.0)
    reg = logreg_fit(df, FEATS, "y", rounds=20, lr=1.0, l2=0.5)
    assert abs(reg["weights"]["x1"]) < abs(free["weights"]["x1"])
    assert abs(reg["weights"]["x2"]) < abs(free["weights"]["x2"])


def test_sample_buckets_trains_on_subset(spark):
    df = _separable(spark)
    full = logreg_fit(df, FEATS, "y", rounds=5, lr=1.0)
    sub = logreg_fit(
        df, FEATS, "y", rounds=5, lr=1.0, sample_buckets=512
    )
    assert 0 < sub["n"] < full["n"]
    # the subset is still separable by the same concept
    assert _accuracy(logreg_predict(df, sub)) > 0.9


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "x1 double, x2 double, y int")
    model = logreg_fit(empty, FEATS, "y", rounds=3)
    assert model == {
        "weights": {"x1": 0.0, "x2": 0.0},
        "bias": 0.0,
        "n": 0,
        "loss": None,
    }
    with pytest.raises(ValueError, match="feature_cols"):
        logreg_fit(empty, [], "y")
    with pytest.raises(ValueError, match="rounds"):
        logreg_fit(empty, FEATS, "y", rounds=0)
    with pytest.raises(ValueError, match="sample_buckets"):
        logreg_fit(empty, FEATS, "y", sample_buckets=0)


def _nb_train(spark):
    return spark.createDataFrame(
        [
            (1, "buy cheap pills now", "spam"),
            (2, "cheap pills buy buy", "spam"),
            (3, "meeting notes agenda", "ham"),
            (4, "agenda for the meeting", "ham"),
        ],
        "doc_id long, text string, label string",
    )


def test_naive_bayes_planted_corpus(spark):
    from kafka_merge_purge_spark.operators.ml import nb_fit, nb_predict

    model = nb_fit(_nb_train(spark), "text", "label")
    test = spark.createDataFrame(
        [(10, "cheap pills"), (11, "the meeting agenda")],
        "doc_id long, text string",
    )
    preds = {r["doc_id"]: r["pred"] for r in nb_predict(test, model).collect()}
    assert preds == {10: "spam", 11: "ham"}


def test_naive_bayes_matches_python_replay(spark):
    """Scores are EXACT decimal sums of round(ln, 6) train terms — a
    pure-Python replay must match to the last microdigit."""
    from kafka_merge_purge_spark.operators.ml import nb_fit, nb_predict

    train = _nb_train(spark)
    model = nb_fit(train, "text", "label")
    test = spark.createDataFrame(
        [(10, "cheap pills"), (12, "zebra unknown words"), (13, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["pred"], r["score"])
        for r in nb_predict(test, model).collect()
    }

    docs = [(r["text"], r["label"]) for r in train.collect()]
    words = [(lab, w) for t, lab in docs for w in t.split() if w]
    vocab = {w for _, w in words}
    labels = sorted({lab for _, lab in docs})
    from collections import Counter

    cw = Counter(words)
    tw = Counter(lab for lab, _ in words)
    dl = Counter(lab for _, lab in docs)

    def q6(x):
        # round-half-up at 6 digits on the double's shortest repr —
        # Spark's F.round(double) semantics; values here are far from
        # half-way boundaries so banker's-vs-half-up cannot differ
        return round(x, 6)

    lp = {
        (lab, w): q6(math.log((cw[(lab, w)] + 1) / (tw[lab] + len(vocab))))
        for lab in labels
        for w in vocab
        if (lab, w) in cw
    }
    prior = {lab: q6(math.log(dl[lab] / len(docs))) for lab in labels}
    unseen = {
        lab: q6(math.log(1 / (tw[lab] + len(vocab)))) for lab in labels
    }
    from fractions import Fraction

    def score(text, lab):
        s = Fraction(round(prior[lab] * 10**6), 10**6)
        for w in text.split():
            if not w:
                continue
            term = lp.get((lab, w), unseen[lab])
            s += Fraction(round(term * 10**6), 10**6)
        return s

    for doc_id, text in ((10, "cheap pills"), (12, "zebra unknown words"), (13, "")):
        want = max(labels, key=lambda lab: (score(text, lab), ), default=None)
        # tie-break: smallest label among max scores
        best = max(score(text, lab) for lab in labels)
        want = min(lab for lab in labels if score(text, lab) == best)
        assert got[doc_id][0] == want
        assert got[doc_id][1] == float(best)


def test_naive_bayes_empty_doc_ties_to_smallest_label(spark):
    from kafka_merge_purge_spark.operators.ml import nb_fit, nb_predict

    # equal priors → empty doc scores tie exactly → 'ham' < 'spam'
    model = nb_fit(_nb_train(spark), "text", "label")
    empty = spark.createDataFrame([(13, "")], "doc_id long, text string")
    assert nb_predict(empty, model).collect()[0]["pred"] == "ham"


def test_naive_bayes_alpha_validation(spark):
    from kafka_merge_purge_spark.operators.ml import nb_fit

    with pytest.raises(ValueError, match="alpha"):
        nb_fit(_nb_train(spark), "text", "label", alpha=0)


def test_boosted_stumps_learn_or_concept(spark):
    """y = (x1>3) OR (x2>4): a single stump caps at one axis; boosting
    must find both true thresholds and clearly beat the one-stump
    model."""
    import random

    from kafka_merge_purge_spark.operators.ml import (
        boosted_stumps_fit,
        boosted_stumps_predict,
    )

    rng = random.Random(11)
    rows = [
        (x1, x2, 1 if (x1 > 3 or x2 > 4) else 0)
        for x1, x2 in (
            (rng.randint(0, 6), rng.randint(0, 6)) for _ in range(600)
        )
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y int")
    model = boosted_stumps_fit(df, ["x1", "x2"], "y", rounds=8)
    feats_used = {(f, t) for f, t, _, _ in model["stumps"]}
    assert ("x1", 3) in feats_used and ("x2", 4) in feats_used
    assert all(a > 0 for _, _, _, a in model["stumps"])

    def acc(m):
        return (
            boosted_stumps_predict(df, m)
            .agg(F.avg((F.col("pred") == F.col("y")).cast("double")))
            .collect()[0][0]
        )

    one = boosted_stumps_fit(df, ["x1", "x2"], "y", rounds=1)
    assert acc(model) > 0.9 > acc(one) > 0.75


def test_boosted_stumps_separable_is_one_stump(spark):
    # cleanly separable on x1: round 2's reweighted sample has no
    # stump beating chance → early stop after the perfect stump
    from kafka_merge_purge_spark.operators.ml import (
        boosted_stumps_fit,
        boosted_stumps_predict,
    )

    df = spark.createDataFrame(
        [(x, 1 if x > 5 else 0) for x in range(20)], "x1 long, y int"
    )
    model = boosted_stumps_fit(df, ["x1"], "y", rounds=5)
    assert model["stumps"][0][:3] == ("x1", 5, 1)
    scored = boosted_stumps_predict(df, model)
    assert (
        scored.agg(
            F.avg((F.col("pred") == F.col("y")).cast("double"))
        ).collect()[0][0]
        == 1.0
    )


def test_boosted_stumps_empty_and_validation(spark):
    from kafka_merge_purge_spark.operators.ml import boosted_stumps_fit

    empty = spark.createDataFrame([], "x1 long, y int")
    assert boosted_stumps_fit(empty, ["x1"], "y") == {"stumps": [], "n": 0}
    with pytest.raises(ValueError, match="feature_cols"):
        boosted_stumps_fit(empty, [], "y")
    with pytest.raises(ValueError, match="rounds"):
        boosted_stumps_fit(empty, ["x1"], "y", rounds=0)


def test_model_save_load_round_trips(spark, tmp_path):
    """All three trainers' models survive parquet persistence with
    identical predictions."""
    from kafka_merge_purge_spark.operators.ml import (
        boosted_stumps_fit,
        boosted_stumps_predict,
        load_model,
        nb_fit,
        nb_predict,
        save_model,
    )

    df = _separable(spark, n=120)
    lr = logreg_fit(df, FEATS, "y", rounds=5)
    save_model(spark, lr, str(tmp_path / "lr"))
    lr2 = load_model(spark, str(tmp_path / "lr"))
    a = logreg_predict(df, lr).select("prob").collect()
    # weights round 6 digits in the frame — predictions agree to 1e-5
    b = logreg_predict(df, lr2).select("prob").collect()
    assert all(abs(x["prob"] - y["prob"]) < 1e-4 for x, y in zip(a, b))

    nb = nb_fit(_nb_train(spark), "text", "label")
    save_model(spark, nb, str(tmp_path / "nb"))
    nb2 = load_model(spark, str(tmp_path / "nb"))
    test = spark.createDataFrame(
        [(10, "cheap pills"), (11, "the meeting agenda")],
        "doc_id long, text string",
    )
    assert (
        nb_predict(test, nb).orderBy("doc_id").collect()
        == nb_predict(test, nb2).orderBy("doc_id").collect()
    )

    st = boosted_stumps_fit(
        spark.createDataFrame(
            [(x, 1 if x > 5 else 0) for x in range(20)], "x1 long, y int"
        ),
        ["x1"],
        "y",
        rounds=3,
    )
    save_model(spark, st, str(tmp_path / "st"))
    st2 = load_model(spark, str(tmp_path / "st"))
    assert st2["stumps"] == st["stumps"]
    probe = spark.createDataFrame([(3,), (8,)], "x1 long")
    assert (
        boosted_stumps_predict(probe, st).collect()
        == boosted_stumps_predict(probe, st2).collect()
    )

    import pytest as _pt

    with _pt.raises(ValueError, match="unrecognized"):
        save_model(spark, {"bogus": 1}, str(tmp_path / "bad"))


def test_documents_demo_beats_baseline(spark):
    """The x_logreg gate concept: n_chars > 300 from token features —
    accuracy must clearly beat the majority class."""
    import __spark_entry__ as entry

    feats = entry._docs_logreg_features(spark, "/root/testdata/sf0.001")
    model = logreg_fit(
        feats, ["n_tokens", "n_digits", "n_spaces"], "label", rounds=30
    )
    scored = logreg_predict(feats, model)
    acc = _accuracy(scored, "label")
    majority = (
        feats.agg(F.avg(F.col("label").cast("double"))).collect()[0][0]
    )
    assert acc >= 0.95 > max(majority, 1 - majority)
    wf = logreg_weights_frame(spark, model)
    assert [r["feature"] for r in wf.collect()] == [
        "__bias__",
        "n_digits",
        "n_spaces",
        "n_tokens",
    ]
