"""operators/stats.py — statistical testing + model-eval tier.

Hand fixtures pin textbook values (perfect fit, total separation,
sklearn's AP example shape); hypothesis lanes replay each operator
against a pure-Python exact-fraction model on arbitrary integer data
(ties, negatives, constants, empties).  The DuckDB side of the same
operators is pinned by tools/parity.py (x_linear_fit, x_mann_whitney,
x_ks_test, x_average_precision, x_calibration, x_ece).
"""

from __future__ import annotations

import math
from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kafka_merge_purge_spark.operators import stats

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


def _half_away6(fr: Fraction) -> float:
    """The repo's exact 6-decimal HALF-AWAY-FROM-ZERO rounding of a
    non-negative rational, as stats._exact_div6 computes it."""
    assert fr >= 0
    q = (2 * fr.numerator * 1_000_000 + fr.denominator) // (
        2 * fr.denominator
    )
    return q / 1_000_000


# ---------------------------------------------------------------------------
# hand fixtures
# ---------------------------------------------------------------------------


def test_linear_fit_perfect_line(spark):
    df = spark.createDataFrame(
        [("g", x, 2 * x + 1) for x in range(1, 6)], "g string, x long, y long"
    )
    row = stats.linear_fit(df, ["g"], "x", "y").collect()[0]
    assert (row["n"], row["slope"], row["intercept"], row["r2"]) == (
        5,
        2.0,
        1.0,
        1.0,
    )


def test_linear_fit_constant_x_is_null(spark):
    df = spark.createDataFrame(
        [("g", 3, y) for y in (1, 5, 9)], "g string, x long, y long"
    )
    row = stats.linear_fit(df, ["g"], "x", "y").collect()[0]
    assert row["slope"] is None and row["intercept"] is None
    assert row["r2"] is None


def test_mann_whitney_total_separation(spark):
    # A = {1,2,3} all below B = {4,5,6}: U_A = 0, strongly negative z
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 0), (5, 0), (6, 0)], "v long, f int"
    )
    row = stats.mann_whitney_u(df, "v", "f").collect()[0]
    assert (row["n_a"], row["n_b"], row["u"]) == (3, 3, 0.0)
    # U=0, mean=4.5, var=3·3/12·7=5.25 → z = −4.5/√5.25
    assert row["z"] == round(-4.5 / (2.0 * math.sqrt(5.25)) * 2.0, 6)


def test_mann_whitney_all_ties_zero_variance(spark):
    df = spark.createDataFrame([(7, 1), (7, 1), (7, 0)], "v long, f int")
    row = stats.mann_whitney_u(df, "v", "f").collect()[0]
    assert row["u"] == 1.0  # 2 tied pairs × ½
    assert row["z"] is None


def test_ks_total_separation(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 0), (5, 0), (6, 0)], "v long, f int"
    )
    row = stats.ks_statistic(df, "v", "f").collect()[0]
    assert (row["n_a"], row["n_b"], row["ks_d"]) == (3, 3, 1.0)


def test_ks_identical_samples_zero(spark):
    df = spark.createDataFrame(
        [(v, f) for v in (1, 2, 3) for f in (0, 1)], "v long, f int"
    )
    row = stats.ks_statistic(df, "v", "f").collect()[0]
    assert row["ks_d"] == 0.0


def test_average_precision_interleaved(spark):
    # ranking (pos, neg, pos, neg) → AP = (1/1 + 2/3)/2 = 5/6
    df = spark.createDataFrame(
        [(4, 1), (3, 0), (2, 1), (1, 0)], "score long, label int"
    )
    row = stats.average_precision(df).collect()[0]
    assert (row["n"], row["n_pos"]) == (4, 2)
    assert row["ap"] == _half_away6(Fraction(row["ap_num"], 2 * 10**9))


def test_average_precision_perfect_ranking(spark):
    df = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "score long, label int"
    )
    assert stats.average_precision(df).collect()[0]["ap"] == 1.0


def test_calibration_and_ece(spark):
    # two deciles: conf 0.9 acc 0.5, conf 0.1 acc 0.0 → ECE = 0.25
    df = spark.createDataFrame(
        [(900000, 1), (900000, 0), (100000, 0), (100000, 0)],
        "prob_q long, label int",
    )
    bins = {
        r["bin"]: r
        for r in stats.calibration_bins(df).collect()
    }
    assert bins[9]["conf"] == 0.9 and bins[9]["acc"] == 0.5
    assert bins[1]["conf"] == 0.1 and bins[1]["acc"] == 0.0
    row = stats.ece(df).collect()[0]
    assert (row["n"], row["ece"]) == (4, 0.25)
    # prob exactly at the top edge lands in the LAST bin, not bins
    edge = spark.createDataFrame([(1000000, 1)], "prob_q long, label int")
    assert stats.calibration_bins(edge).collect()[0]["bin"] == 9


def test_empty_inputs_keep_one_row_contract(spark):
    empty = spark.createDataFrame([], "v long, f int")
    for fn, cols in (
        (stats.ks_statistic, ("n_a", "n_b", "ks_d")),
        (stats.mann_whitney_u, ("n_a", "n_b", "u", "z")),
    ):
        row = fn(empty, "v", "f").collect()[0]
        assert row["n_a"] == 0 and row["n_b"] == 0
    ap = stats.average_precision(
        spark.createDataFrame([], "score long, label int")
    ).collect()[0]
    assert (ap["n"], ap["n_pos"], ap["ap"]) == (0, 0, None)
    ec = stats.ece(
        spark.createDataFrame([], "prob_q long, label int")
    ).collect()[0]
    assert (ec["n"], ec["ece"]) == (0, None)


def test_welch_t_textbook(spark):
    # A = {1,2,3,4} (mean 2.5, var 5/3), B = {10,12,14,16} (mean 13, var 20/3)
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (10, 0), (12, 0), (14, 0), (16, 0)],
        "v long, f int",
    )
    row = stats.welch_t(df, "v", "f").collect()[0]
    se2 = 5 / 12 + 20 / 12
    assert row["mean_diff"] == -10.5
    assert row["t"] == round(-10.5 / math.sqrt(se2), 6)
    assert row["df_welch"] == round(
        se2 * se2 / ((5 / 12) ** 2 / 3 + (20 / 12) ** 2 / 3), 6
    )


def test_welch_t_degenerate(spark):
    # n_a = 1: t/df undefined, mean_diff still reported
    df = spark.createDataFrame([(5, 1), (1, 0), (3, 0)], "v long, f int")
    row = stats.welch_t(df, "v", "f").collect()[0]
    assert row["mean_diff"] == 3.0 and row["t"] is None
    # both samples constant: zero variance → NULL t
    c = spark.createDataFrame(
        [(2, 1), (2, 1), (7, 0), (7, 0)], "v long, f int"
    )
    row = stats.welch_t(c, "v", "f").collect()[0]
    assert row["mean_diff"] == -5.0 and row["t"] is None


def _as_normal_p(stat):
    """Python replay of the A&S 7.1.26 two-sided normal p."""
    x = abs(stat) / 1.4142135623730951
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    return round(poly * math.exp(-x * x), 6)


def test_welch_and_mw_p_values(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (10, 0), (12, 0), (14, 0), (16, 0)],
        "v long, f int",
    )
    wr = stats.welch_t(df, "v", "f").collect()[0]
    # |t| = 7.27: p ≈ 0 at 6 decimals, replayed via the same polynomial
    se2 = 5 / 12 + 20 / 12
    assert wr["p_normal"] == _as_normal_p(-10.5 / math.sqrt(se2))
    mw = stats.mann_whitney_u(df, "v", "f").collect()[0]
    assert mw["p_normal"] == _as_normal_p(mw["z"]) or mw["p_normal"] == pytest.approx(
        _as_normal_p(mw["z"]), abs=2e-6
    )
    # z ≈ -2.17 → p ≈ 0.03: actually significant at 5%
    assert 0.0 < mw["p_normal"] < 0.05


def test_two_proportion_z(spark):
    # A: 30/100 convert, B: 10/100 convert
    rows = (
        [(1, 1)] * 30 + [(1, 0)] * 70 + [(0, 1)] * 10 + [(0, 0)] * 90
    )
    df = spark.createDataFrame(rows, "f int, s int")
    row = stats.two_proportion_z(df, "f", "s").collect()[0]
    assert (row["n_a"], row["n_b"], row["s_a"], row["s_b"]) == (
        100,
        100,
        30,
        10,
    )
    assert row["rate_diff"] == 0.2
    pp = 40 / 200
    z = (0.3 - 0.1) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert row["z"] == round(z, 6)
    assert row["p_normal"] < 0.001
    # degenerate: all successes → z undefined
    allwin = spark.createDataFrame([(1, 1), (0, 1)], "f int, s int")
    row = stats.two_proportion_z(allwin, "f", "s").collect()[0]
    assert row["rate_diff"] == 0.0 and row["z"] is None


def test_cusum_step_shift(spark):
    # clean level shift 0→10 after position 4 → change_at = 4, D = 25
    df = spark.createDataFrame(
        [(i, 0 if i < 5 else 10) for i in range(10)], "o long, x long"
    )
    row = stats.cusum_changepoint(df, "o", "x").collect()[0]
    assert (row["n"], row["change_at"], row["cusum"]) == (10, 4, 25.0)
    # constant series: numerator identically 0, earliest order wins
    flat = spark.createDataFrame(
        [(i, 7) for i in range(5)], "o long, x long"
    )
    row = stats.cusum_changepoint(flat, "o", "x").collect()[0]
    assert (row["change_at"], row["cusum"]) == (0, 0.0)


@given(
    pts=st.lists(
        st.tuples(st.integers(-4, 4), st.integers(-5, 5)),
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@SETTINGS
def test_cusum_matches_python_model(spark, pts):
    df = (
        spark.createDataFrame(pts, "o long, x long")
        if pts
        else spark.createDataFrame([], "o long, x long")
    )
    row = stats.cusum_changepoint(df, "o", "x", bucket_size=3).collect()[0]
    if not pts:
        assert row["n"] == 0 and row["change_at"] is None
        return
    srt = sorted(pts)
    n, sn = len(srt), sum(x for _, x in srt)
    best = None
    cumc = cums = 0
    for o, x in srt:
        cumc, cums = cumc + 1, cums + x
        d = abs(n * cums - cumc * sn)
        if best is None or d > best[0]:
            best = (d, o)
    assert (int(row["d_num"]), row["change_at"]) == best
    assert row["cusum"] == _half_away6(Fraction(best[0], n))


def test_js_divergence_bounds(spark):
    # identical distributions → 0; disjoint supports → ln 2
    same = spark.createDataFrame(
        [(w, f) for w in ["a", "b", "b"] for f in (0, 1)], "w string, f int"
    )
    assert stats.js_divergence(same, "w", "f").collect()[0]["js"] == 0.0
    dis = spark.createDataFrame(
        [("a", 1), ("b", 1), ("x", 0), ("y", 0)], "w string, f int"
    )
    row = stats.js_divergence(dis, "w", "f").collect()[0]
    assert row["js"] == round(math.log(2), 6) and row["n_items"] == 4
    empty = spark.createDataFrame([], "w string, f int")
    row = stats.js_divergence(empty, "w", "f").collect()[0]
    assert (row["n_a"], row["n_b"], row["js"]) == (0, 0, None)


def test_js_divergence_matches_python_replay(spark):
    """Exact decimal replay: quantized per-item terms, one rational."""
    data = [("a", 1)] * 3 + [("b", 1)] * 2 + [("b", 0)] * 4 + [("c", 0)]
    df = spark.createDataFrame(data, "w string, f int")
    row = stats.js_divergence(df, "w", "f").collect()[0]
    from collections import Counter

    ca = Counter(w for w, f in data if f)
    cb = Counter(w for w, f in data if not f)
    na, nb = sum(ca.values()), sum(cb.values())
    s1 = s2 = 0  # micro-unit integer sums
    for w in set(ca) | set(cb):
        mix = ca[w] * nb + cb[w] * na
        if ca[w]:
            s1 += ca[w] * round(round(math.log(2 * ca[w] * nb / mix), 6) * 10**6)
        if cb[w]:
            s2 += cb[w] * round(round(math.log(2 * cb[w] * na / mix), 6) * 10**6)
    num, den = s1 * nb + s2 * na, 2 * na * nb * 10**6
    assert row["js"] == _half_away6(Fraction(abs(num), den)) * (
        1 if num >= 0 else -1
    )


def test_mutual_information_textbook(spark):
    # independent → 0; deterministic mapping → H(X) = ln 2
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(3)],
        "x string, y string",
    )
    assert stats.mutual_information(ind, "x", "y").collect()[0]["mi"] == 0.0
    dep = spark.createDataFrame(
        [("a", "c")] * 5 + [("b", "d")] * 5, "x string, y string"
    )
    row = stats.mutual_information(dep, "x", "y").collect()[0]
    assert row["mi"] == round(math.log(2), 6) and row["n_cells"] == 2
    empty = spark.createDataFrame([], "x string, y string")
    row = stats.mutual_information(empty, "x", "y").collect()[0]
    assert (row["n"], row["n_cells"], row["mi"]) == (0, 0, None)


def test_bootstrap_ci_brackets_mean(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(1000)], "id long, x long"
    )
    row = stats.bootstrap_mean_ci(df, "x", "id", replicates=100).collect()[0]
    assert row["n"] == 1000 and row["mean"] == 49.5
    # uniform 0..99: se(mean) ≈ 0.91 → the 95% CI must bracket tightly
    assert row["ci_lo"] < 49.5 < row["ci_hi"]
    assert 1.0 < row["ci_hi"] - row["ci_lo"] < 8.0
    assert row["n_replicates"] == 100


def test_bootstrap_ci_constant_column_is_degenerate(spark):
    df = spark.createDataFrame([(i, 7) for i in range(50)], "id long, x long")
    row = stats.bootstrap_mean_ci(df, "x", "id", replicates=40).collect()[0]
    assert (row["mean"], row["ci_lo"], row["ci_hi"]) == (7.0, 7.0, 7.0)


def test_bootstrap_weights_follow_poisson1(spark):
    """The Weyl-rotation md5-threshold weights must reproduce the
    Poisson(1) pmf — pins the threshold literals AND the per-row
    counter scheme's marginal uniformity."""
    from pyspark.sql import functions as F

    n, R = 400, 25
    digest = F.md5(F.col("id").cast("string"))
    df = spark.createDataFrame(
        [(i,) for i in range(n)], "id long"
    ).select(
        F.conv(F.substring(digest, 1, 15), 16, 10)
        .cast("long")
        .cast("decimal(38,0)")
        .alias("h1"),
        F.conv(F.substring(digest, 17, 15), 16, 10)
        .cast("long")
        .cast("decimal(38,0)")
        .alias("h2"),
        F.explode(F.sequence(F.lit(0), F.lit(R - 1))).alias("r"),
    )
    u = F.pmod(
        F.col("h2") + (F.col("r") + F.lit(1)).cast("decimal(38,0)") * F.col("h1"),
        F.lit(2**60).cast("decimal(38,0)"),
    ).cast("long")
    w = F.lit(9)
    for k in range(len(stats.POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < F.lit(stats.POISSON1_THRESHOLDS[k]), k).otherwise(w)
    counts = {
        r["w"]: r["c"]
        for r in df.select(w.alias("w")).groupBy("w").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    total = n * R
    p0 = counts.get(0, 0) / total
    p1 = counts.get(1, 0) / total
    assert abs(p0 - math.exp(-1)) < 0.02
    assert abs(p1 - math.exp(-1)) < 0.02
    assert counts.get(2, 0) / total < 0.25


def test_bootstrap_empty_and_validation(spark):
    empty = spark.createDataFrame([], "id long, x long")
    row = stats.bootstrap_mean_ci(empty, "x", "id").collect()[0]
    assert (row["n"], row["mean"], row["n_replicates"]) == (0, None, 0)
    with pytest.raises(ValueError, match="replicates"):
        stats.bootstrap_mean_ci(empty, "x", "id", replicates=0)
    with pytest.raises(ValueError, match="tail_bp"):
        stats.bootstrap_mean_ci(empty, "x", "id", tail_bp=0)


def test_median_ci_textbook(spark):
    # 1..101: median 51; l = floor((101 − 1.96·√101)/2) = 40, u = 62
    df = spark.createDataFrame([(v,) for v in range(1, 102)], "v long")
    row = stats.median_ci(df, "v").collect()[0]
    assert (row["n"], row["median"], row["ci_lo"], row["ci_hi"]) == (
        101,
        51.0,
        40.0,
        62.0,
    )
    # even n averages the two middle order statistics
    even = spark.createDataFrame([(v,) for v in range(1, 11)], "v long")
    assert stats.median_ci(even, "v").collect()[0]["median"] == 5.5
    # CI brackets the median and tightens with n
    assert row["ci_lo"] < row["median"] < row["ci_hi"]


def test_median_ci_small_and_empty(spark):
    two = stats.median_ci(
        spark.createDataFrame([(7,), (9,)], "v long"), "v"
    ).collect()[0]
    assert (two["median"], two["ci_lo"], two["ci_hi"]) == (8.0, None, None)
    empty = stats.median_ci(
        spark.createDataFrame([], "v long"), "v"
    ).collect()[0]
    assert (empty["n"], empty["median"]) == (0, None)


@given(
    vals=st.lists(st.integers(-8, 8), min_size=3, max_size=15)
)
@SETTINGS
def test_median_ci_matches_sorted_model(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = stats.median_ci(df, "v", bucket_size=3).collect()[0]
    s = sorted(vals)
    n = len(s)
    want_med = (s[(n + 1) // 2 - 1] + s[n // 2]) / 2
    assert row["median"] == want_med
    l = math.floor((n - 1.959964 * math.sqrt(n)) / 2)
    if l >= 1:
        assert row["ci_lo"] == float(s[l - 1])
        assert row["ci_hi"] == float(s[n - l])
    else:
        # rank collapses below the sample: whole range or NULL (n<3)
        assert row["ci_lo"] in (None, float(s[0]))


def test_grouped_mw_equals_global_per_slice(spark):
    rows = [
        ("g1", 1, 1), ("g1", 2, 1), ("g1", 5, 0), ("g1", 6, 0),
        ("g2", 9, 1), ("g2", 3, 0), ("g2", 3, 1), ("g2", 7, 0),
    ]
    df = spark.createDataFrame(rows, "g string, v long, f int")
    grouped = {
        r["g"]: (r["u"], r["z"], r["p_normal"])
        for r in stats.mann_whitney_u_grouped(df, ["g"], "v", "f").collect()
    }
    for gname in ("g1", "g2"):
        solo = stats.mann_whitney_u(
            df.filter(F.col("g") == gname), "v", "f"
        ).collect()[0]
        assert grouped[gname] == (solo["u"], solo["z"], solo["p_normal"])


def test_grouped_cusum_equals_global_per_slice(spark):
    rows = [
        ("a", i, 0 if i < 5 else 10) for i in range(10)
    ] + [("b", i, 7) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, o long, x long")
    grouped = {
        r["g"]: (r["change_at"], int(r["d_num"]), r["cusum"])
        for r in stats.cusum_changepoint_grouped(
            df, ["g"], "o", "x"
        ).collect()
    }
    assert grouped["a"] == (4, 250, 25.0)
    assert grouped["b"] == (0, 0, 0.0)
    for gname in ("a", "b"):
        solo = stats.cusum_changepoint(
            df.filter(F.col("g") == gname), "o", "x"
        ).collect()[0]
        assert grouped[gname] == (
            solo["change_at"],
            int(solo["d_num"]),
            solo["cusum"],
        )


# ---------------------------------------------------------------------------
# hypothesis: pure-Python exact-fraction models
# ---------------------------------------------------------------------------

two_sample = st.lists(
    st.tuples(st.integers(-5, 5), st.integers(0, 1)),
    max_size=14,
)


@given(pts=two_sample)
@SETTINGS
def test_mann_whitney_matches_pair_count(spark, pts):
    """u == the literal pair-count definition Σ[a>b] + ½Σ[a==b]."""
    df = (
        spark.createDataFrame(pts, "v long, f int")
        if pts
        else spark.createDataFrame([], "v long, f int")
    )
    row = stats.mann_whitney_u(df, "v", "f", bucket_size=3).collect()[0]
    a = [v for v, f in pts if f]
    b = [v for v, f in pts if not f]
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    if not a or not b:
        assert row["u"] is None and row["z"] is None
        return
    u = sum(
        1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b
    )
    assert row["u"] == u


@given(pts=two_sample)
@SETTINGS
def test_ks_matches_fraction_model(spark, pts):
    df = (
        spark.createDataFrame(pts, "v long, f int")
        if pts
        else spark.createDataFrame([], "v long, f int")
    )
    row = stats.ks_statistic(df, "v", "f", bucket_size=3).collect()[0]
    a = sorted(v for v, f in pts if f)
    b = sorted(v for v, f in pts if not f)
    if not a or not b:
        assert row["ks_d"] is None
        return
    vals = sorted(set(a) | set(b))
    d = max(
        abs(
            Fraction(sum(1 for x in a if x <= v), len(a))
            - Fraction(sum(1 for x in b if x <= v), len(b))
        )
        for v in vals
    )
    assert row["ks_d"] == _half_away6(d)
    assert Fraction(int(row["d_num"]), len(a) * len(b)) == d


@given(
    pts=st.lists(
        st.tuples(st.integers(-4, 4), st.integers(0, 1)), max_size=14
    )
)
@SETTINGS
def test_average_precision_matches_step_model(spark, pts):
    """ap_num == the sklearn step definition with each term floored at
    scale 10⁹ (exact integer replay over distinct-score blocks)."""
    df = (
        spark.createDataFrame(pts, "score long, label int")
        if pts
        else spark.createDataFrame([], "score long, label int")
    )
    row = stats.average_precision(df, bucket_size=3).collect()[0]
    S = 10**9
    want, tp, fp = 0, 0, 0
    for s in sorted({p[0] for p in pts}, reverse=True):
        pc = sum(1 for v, l in pts if v == s and l)
        nc = sum(1 for v, l in pts if v == s and not l)
        tp, fp = tp + pc, fp + nc
        want += (pc * tp * S) // (tp + fp)
    assert row["ap_num"] == want
    n_pos = sum(l for _, l in pts)
    if n_pos:
        assert row["ap"] == _half_away6(Fraction(want, n_pos * S))


@given(
    pts=st.lists(
        st.tuples(st.integers(-6, 6), st.integers(-6, 6)), max_size=12
    )
)
@SETTINGS
def test_linear_fit_matches_fraction_model(spark, pts):
    df = (
        spark.createDataFrame([("g", x, y) for x, y in pts], "g string, x long, y long")
        if pts
        else spark.createDataFrame([], "g string, x long, y long")
    )
    rows = stats.linear_fit(df, ["g"], "x", "y").collect()
    if not pts:
        assert rows == []
        return
    row = rows[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert row["n"] == n
    if dx <= 0:
        assert row["slope"] is None and row["intercept"] is None
        return
    assert row["slope"] == round(float(num) / float(dx), 6)
    assert row["intercept"] == round(
        float(sy * sxx - sx * sxy) / float(dx), 6
    )
    if dy > 0:
        assert row["r2"] == round(
            float(num) * float(num) / (float(dx) * float(dy)), 6
        )
    else:
        assert row["r2"] is None
