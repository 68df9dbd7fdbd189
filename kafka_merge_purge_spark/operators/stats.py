"""Statistical testing + model-evaluation aggregates (round 15).

The tier every SQL analytics engine ships as ``REGR_*`` / hypothesis
tests, re-expressed in the repo's exact-arithmetic idiom so each
operator carries a FULL DuckDB value-hash oracle:

- :func:`linear_fit` — grouped OLS (slope / intercept / R²), the
  ``REGR_SLOPE`` / ``REGR_INTERCEPT`` / ``REGR_R2`` family, from
  DECIMAL(38,0) moment sums over quantized int64 inputs.
- :func:`mann_whitney_u` — two-sample rank-sum test with average-tie
  ranks as exact ×2 integers and the tie-corrected normal z.
- :func:`ks_statistic` — two-sample Kolmogorov-Smirnov D as ONE exact
  integer numerator ``max|n2·F1 − n1·F2|·(n1·n2)`` over distinct
  values.
- :func:`average_precision` — exact PR ranking quality (sklearn's
  ``average_precision_score`` step definition) with every per-threshold
  precision term floored at a fixed integer scale, so both engines sum
  IDENTICAL integers — no float accumulation order anywhere.
- :func:`calibration_bins` / :func:`ece` — reliability-diagram bins
  and Expected Calibration Error as one exact rational.

Scale posture (shared with similarity.exact_auc / spearman_corr): every
cumulative runs over DISTINCT values via the two-level bucketed prefix
sum — per-value counts bucket by ``value DIV bucket_size``, prefix-sum
locally under a partitioned window, and only the tiny per-bucket totals
take an ordered global window.  No single-task window over the data
axis, no pair enumeration, no global sort; the aggregates are map-side
combined.  Inputs must be quantized int64 (the repo's
``floor(x·Q + 0.5)`` idiom) — exactness is what makes the oracles
full-hash instead of rows-only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def _exact_div6(num, den):
    """round(num/den, 6) for NON-NEGATIVE exact decimal integers,
    computed without touching a double until the value is already a
    6-decimal integer: half-away integer rounding via `div` (both
    engines truncate toward zero), then an exact /10⁶.  The naive
    round-on-double flips between engines when num/den lands exactly on
    .xxxxxx5 — which exact rationals hit routinely (the text._EXACT_AVG6
    lesson).  Caller guarantees num ≥ 0, den > 0, and quotient ≤ ~9·10¹⁸
    ·10⁻⁶ so the scaled integer fits a long."""
    m = F.lit(1_000_000).cast(_D38)
    two = F.lit(2).cast(_D38)
    scaled = two * num * m + den
    # subtract the remainder first so the decimal division is exact
    # (integral quotient) regardless of result-scale rounding rules
    q = (scaled - (scaled % (two * den))) / (two * den)
    return q.cast("long").cast("double") / F.lit(1_000_000.0)


def _exact_div6_signed(num, den):
    """round(num/den, 6) with HALF-AWAY-FROM-ZERO for a possibly
    NEGATIVE exact decimal integer ``num`` (den > 0) — the signed twin
    of :func:`_exact_div6`, same integer-arithmetic posture."""
    m = F.lit(1_000_000).cast(_D38)
    two = F.lit(2).cast(_D38)
    mag = two * F.abs(num) * m + den
    q = ((mag - (mag % (two * den))) / (two * den)).cast("long")
    return (
        F.when(num < 0, -q).otherwise(q).cast("double")
        / F.lit(1_000_000.0)
    )


#: √2 as the exact double literal — inlined identically in oracles so
#: both engines divide by the same bits.
_SQRT2 = 1.4142135623730951


def _normal_two_sided_p(stat_abs):
    """Two-sided normal-approximation p-value 2·Φ(−|z|) = erfc(|z|/√2)
    via the Abramowitz-Stegun 7.1.26 polynomial (|error| < 1.5·10⁻⁷ —
    below the 6-decimal quantum).  Pure double mult/div/exp in a FIXED
    op order; verified to produce identical doubles in Spark (JVM libm)
    and DuckDB, so it rides FULL hash oracles that replay the same
    expression."""
    x = stat_abs / F.lit(_SQRT2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    return F.round(poly * F.exp(-x * x), 6)


#: The oracle-side twin of :func:`_normal_two_sided_p`.  Callers bind
#: ``x = abs(stat)/1.4142135623730951`` and ``t = 1.0/(1.0+0.3275911*x)``
#: in a CTE and format those column names in — explicit multiplication
#: chains (NOT power(): libm pow's repeated squaring rounds (t²)²
#: differently from ((t·t)·t)·t and would break bit parity).
NORMAL_P_SQL = (
    "round((0.254829592 * {t} - 0.284496736 * {t} * {t}"
    " + 1.421413741 * {t} * {t} * {t}"
    " - 1.453152027 * {t} * {t} * {t} * {t}"
    " + 1.061405429 * {t} * {t} * {t} * {t} * {t})"
    " * exp(-{x} * {x}), 6)"
)


def _two_sample_counts(
    df: DataFrame, value_col: str, flag_col: str
) -> DataFrame:
    """Per distinct value: row counts of sample A (flag != 0) and
    sample B (flag = 0), nulls dropped.  Columns (_v, _ca, _cb)."""
    pts = df.filter(
        F.col(value_col).isNotNull() & F.col(flag_col).isNotNull()
    ).select(
        F.col(value_col).cast("long").alias("_v"),
        F.when(F.col(flag_col).cast("int") != 0, 1).otherwise(0).alias("_a"),
    )
    return pts.groupBy("_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(1 - F.col("_a")).alias("_cb"),
    )


def _with_below(
    g: DataFrame,
    key_col: str,
    count_cols: Sequence[str],
    bucket_size: int,
) -> DataFrame:
    """Exclusive prefix sums of ``count_cols`` in ascending ``key_col``
    order — the two-level bucketed form (exact_auc's posture): keys
    bucket by ``key DIV bucket_size`` (pmod first so negatives floor),
    local windows prefix-sum within buckets, and only the per-bucket
    totals (tiny) take the ordered global window.  Adds
    ``{c}_below`` for each count column."""
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1, got {bucket_size}")
    g = g.withColumn(
        "_b",
        F.expr(
            f"({key_col} - pmod({key_col}, {bucket_size})) DIV {bucket_size}"
        ),
    )
    w_local = (
        Window.partitionBy("_b")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = g.groupBy("_b").agg(
        *[F.sum(c).alias(f"_bt_{c}") for c in count_cols]
    )
    w_pref = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b",
        *[
            F.coalesce(F.sum(f"_bt_{c}").over(w_pref), F.lit(0)).alias(
                f"_off_{c}"
            )
            for c in count_cols
        ],
    )
    out = g.join(F.broadcast(offsets), "_b")
    for c in count_cols:
        out = out.withColumn(
            f"{c}_below",
            F.col(f"_off_{c}")
            + F.coalesce(F.sum(c).over(w_local), F.lit(0)),
        )
    return out.drop("_b", *[f"_off_{c}" for c in count_cols])


def linear_fit(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Grouped ordinary-least-squares fit ``y ≈ slope·x + intercept`` —
    the portable ``REGR_SLOPE / REGR_INTERCEPT / REGR_R2`` family.

    Inputs must be integer-valued (cast to int64; quantize floats
    upstream with ``floor(x·Q + 0.5)``).  Per group the six moment sums
    (n, Σx, Σy, Σxy, Σx², Σy²) aggregate in DECIMAL(38,0) — exact, so
    both engines derive identical numerators/denominators:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
        R²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    Only the final divisions touch IEEE doubles (correctly-rounded ops
    on exact decimal casts; R² squares the exact numerator in double —
    its decimal square can exceed 38 digits).  Envelope: the largest
    intermediate is max(n·|Σxy|, |Σy·Σx²|) — with |x| ≤ X, |y| ≤ Y the
    bound is n²·X·Y resp. n²·X²·Y < 10³⁸.

    One map-side-combined aggregate; no joins, no windows — scale is
    the groupBy key cardinality.  Output per group: (group_cols…, n,
    slope, intercept, r2) — slope/intercept/r2 NULL when x is constant
    (zero variance) or n = 0; r2 additionally NULL when y is constant.
    """
    pts = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *group_cols,
        F.col(x_col).cast("long").cast(_D38).alias("_x"),
        F.col(y_col).cast("long").cast(_D38).alias("_y"),
    )
    g = pts.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nl"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("_nl").cast(_D38)
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    inum = F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")
    num_d, dx_d, dy_d = (
        num.cast("double"),
        dx.cast("double"),
        dy.cast("double"),
    )
    return g.select(
        *group_cols,
        F.col("_nl").cast("long").alias("n"),
        F.when(dx > 0, F.round(num_d / dx_d, 6)).alias("slope"),
        F.when(dx > 0, F.round(inum.cast("double") / dx_d, 6)).alias(
            "intercept"
        ),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(num_d * num_d / (dx_d * dy_d), 6),
        ).alias("r2"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    bucket_size: int = 1_000_000,
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) test: does sample
    A (``flag_col`` ≠ 0) stochastically dominate sample B?  The
    non-parametric location test a data pipeline reaches for before
    assuming normality (A/B metric shifts, quality-score drift between
    snapshots).

    Exact arithmetic: values must be int64.  Per distinct value the two
    sample counts aggregate; average-tie rank sums are carried as exact
    ×2 integers via the bucketed two-level prefix sum (no global sort):

        2·R_A = Σ_v ca(v) · (2·below(v) + c(v) + 1)
        2·U_A = 2·R_A − n_A·(n_A + 1)

    so ``u = U_A`` is exact to the half-integer.  The tie-corrected
    normal approximation uses Σ(t³ − t) over tie-group sizes t (exact
    DECIMAL) in

        z = (U_A − n_A·n_B/2) / sqrt(n_A·n_B/12·((N+1) − Σ(t³−t)/(N(N−1))))

    computed as three correctly-rounded double ops on exact decimal
    casts.  Envelope: 2·R_A ≤ 2N² and Σt³ ≤ N³ must fit 38 digits →
    N ≤ ~10¹².  Output ONE row: (n_a, n_b, u2 — the exact 2·U_A
    integer witness, u double, z double); u/z NULL when either sample
    is empty, z NULL when all values tie (zero variance)."""
    g = _two_sample_counts(df, value_col, flag_col)
    g = _with_below(g, "_v", ["_ca", "_cb"], bucket_size)
    ct = (F.col("_ca") + F.col("_cb")).cast(_D38)
    below = (F.col("_ca_below") + F.col("_cb_below")).cast(_D38)
    terms = g.select(
        (
            F.col("_ca").cast(_D38)
            * (F.lit(2).cast(_D38) * below + ct + F.lit(1).cast(_D38))
        ).alias("_r2t"),
        (ct * ct * ct - ct).alias("_t3t"),
        "_ca",
        "_cb",
    )
    m = terms.agg(
        F.coalesce(F.sum("_r2t"), F.lit(0).cast(_D38)).alias("_r2"),
        F.coalesce(F.sum("_t3t"), F.lit(0).cast(_D38)).alias("_ties"),
        F.coalesce(F.sum("_ca"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("_cb"), F.lit(0)).cast("long").alias("n_b"),
    )
    na, nb = F.col("n_a").cast(_D38), F.col("n_b").cast(_D38)
    nn = na + nb
    u2 = F.col("_r2") - na * (na + F.lit(1).cast(_D38))
    var_d = (
        (na * nb).cast("double")
        / F.lit(12.0)
        * (
            (nn + F.lit(1).cast(_D38)).cast("double")
            - F.col("_ties").cast("double")
            / (nn * (nn - F.lit(1).cast(_D38))).cast("double")
        )
    )
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    z_raw = (u2 - na * nb).cast("double") / (F.lit(2.0) * F.sqrt(var_d))
    return m.select(
        "n_a",
        "n_b",
        F.when(both, u2.cast(_D38)).alias("u2"),
        F.when(both, F.round(u2.cast("double") / F.lit(2.0), 6)).alias("u"),
        F.when(both & (var_d > 0), F.round(z_raw, 6)).alias("z"),
        F.when(
            both & (var_d > 0), _normal_two_sided_p(F.abs(z_raw))
        ).alias("p_normal"),
    )


def welch_t(
    df: DataFrame,
    value_col: str,
    flag_col: str,
) -> DataFrame:
    """Welch's unequal-variance t-test — the parametric companion to
    :func:`mann_whitney_u` (mean shift between sample A = flag ≠ 0 and
    sample B):

        t  = (x̄_A − x̄_B) / √(s²_A/n_A + s²_B/n_B)
        df = (s²_A/n_A + s²_B/n_B)² / ((s²_A/n_A)²/(n_A−1) + (s²_B/n_B)²/(n_B−1))

    (Welch-Satterthwaite).  Values must be int64 (quantize-first); the
    per-sample moment sums (n, Σx, Σx²) aggregate in DECIMAL(38,0) —
    exact — and the sample variances derive as s² = (n·Σx² − (Σx)²)
    / (n·(n−1)), each an exact-integer numerator/denominator pair cast
    once to double, so both engines run the identical double op chain.
    Envelope: n·Σx² < 10³⁸.

    ONE map-side-combined aggregate (conditional sums), no joins, no
    windows.  Output ONE row: (n_a, n_b, mean_diff, t, df_welch) —
    t/df NULL when either n < 2 or both variances are zero."""
    pts = df.filter(
        F.col(value_col).isNotNull() & F.col(flag_col).isNotNull()
    ).select(
        F.col(value_col).cast("long").cast(_D38).alias("_v"),
        F.when(F.col(flag_col).cast("int") != 0, 1).otherwise(0).alias("_a"),
    )
    a = F.col("_a") == 1
    zero = F.lit(0).cast(_D38)
    m = pts.agg(
        F.coalesce(F.sum(F.when(a, 1)), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum(F.when(~a, 1)), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.when(a, F.col("_v"))), zero).alias("_sa"),
        F.coalesce(F.sum(F.when(~a, F.col("_v"))), zero).alias("_sb"),
        F.coalesce(
            F.sum(F.when(a, F.col("_v") * F.col("_v"))), zero
        ).alias("_qa"),
        F.coalesce(
            F.sum(F.when(~a, F.col("_v") * F.col("_v"))), zero
        ).alias("_qb"),
    )
    na, nb = F.col("n_a").cast(_D38), F.col("n_b").cast(_D38)
    # exact-integer variance numerators: n·Σx² − (Σx)²
    va_num = na * F.col("_qa") - F.col("_sa") * F.col("_sa")
    vb_num = nb * F.col("_qb") - F.col("_sb") * F.col("_sb")
    one = F.lit(1).cast(_D38)
    # s²/n as doubles from exact decimal parts: va_num/(na·(na−1)·na)
    ra = va_num.cast("double") / (na * (na - one) * na).cast("double")
    rb = vb_num.cast("double") / (nb * (nb - one) * nb).cast("double")
    # mean diff as one exact rational: (sa·nb − sb·na)/(na·nb)
    md_num = F.col("_sa") * nb - F.col("_sb") * na
    md = md_num.cast("double") / (na * nb).cast("double")
    se2 = ra + rb
    t = md / F.sqrt(se2)
    dfw = (
        se2
        * se2
        / (
            ra * ra / (na - one).cast("double")
            + rb * rb / (nb - one).cast("double")
        )
    )
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return m.select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0), F.round(md, 6)
        ).alias("mean_diff"),
        F.when(ok & (se2 > 0), F.round(t, 6)).alias("t"),
        F.when(ok & (se2 > 0), F.round(dfw, 6)).alias("df_welch"),
        # large-sample normal approximation (not the t distribution)
        F.when(ok & (se2 > 0), _normal_two_sided_p(F.abs(t))).alias(
            "p_normal"
        ),
    )


def mann_whitney_u_grouped(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    flag_col: str,
) -> DataFrame:
    """Per-group Mann-Whitney U — the segmented A/B shape (one
    rank-sum test per cohort/day/segment; the spearman_corr_grouped
    convention): identical arithmetic to :func:`mann_whitney_u` with
    every window/aggregate keyed by the group columns.  Windows over
    DISTINCT values run group-partitioned (bounded by per-group value
    cardinality; a single huge-cardinality group → use the global
    bucketed form, the documented crossover).  Output one row per
    group: (group…, n_a, n_b, u2, u, z, p_normal)."""
    gcols = list(group_cols)
    pts = df.filter(
        F.col(value_col).isNotNull() & F.col(flag_col).isNotNull()
    ).select(
        *gcols,
        F.col(value_col).cast("long").alias("_v"),
        F.when(F.col(flag_col).cast("int") != 0, 1).otherwise(0).alias("_a"),
    )
    g = pts.groupBy(*gcols, "_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(1 - F.col("_a")).alias("_cb"),
    )
    w_local = (
        Window.partitionBy(*gcols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    below = (
        F.coalesce(F.sum(F.col("_ca") + F.col("_cb")).over(w_local), F.lit(0))
    ).cast(_D38)
    ct = (F.col("_ca") + F.col("_cb")).cast(_D38)
    terms = g.select(
        *gcols,
        (
            F.col("_ca").cast(_D38)
            * (F.lit(2).cast(_D38) * below + ct + F.lit(1).cast(_D38))
        ).alias("_r2t"),
        (ct * ct * ct - ct).alias("_t3t"),
        "_ca",
        "_cb",
    )
    m = terms.groupBy(*gcols).agg(
        F.coalesce(F.sum("_r2t"), F.lit(0).cast(_D38)).alias("_r2"),
        F.coalesce(F.sum("_t3t"), F.lit(0).cast(_D38)).alias("_ties"),
        F.coalesce(F.sum("_ca"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("_cb"), F.lit(0)).cast("long").alias("n_b"),
    )
    na, nb = F.col("n_a").cast(_D38), F.col("n_b").cast(_D38)
    nn = na + nb
    u2 = F.col("_r2") - na * (na + F.lit(1).cast(_D38))
    var_d = (
        (na * nb).cast("double")
        / F.lit(12.0)
        * (
            (nn + F.lit(1).cast(_D38)).cast("double")
            - F.col("_ties").cast("double")
            / (nn * (nn - F.lit(1).cast(_D38))).cast("double")
        )
    )
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    z_raw = (u2 - na * nb).cast("double") / (F.lit(2.0) * F.sqrt(var_d))
    return m.select(
        *gcols,
        "n_a",
        "n_b",
        F.when(both, u2.cast(_D38)).alias("u2"),
        F.when(both, F.round(u2.cast("double") / F.lit(2.0), 6)).alias("u"),
        F.when(both & (var_d > 0), F.round(z_raw, 6)).alias("z"),
        F.when(
            both & (var_d > 0), _normal_two_sided_p(F.abs(z_raw))
        ).alias("p_normal"),
    )


def cusum_changepoint_grouped(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group CUSUM changepoint — one mean-shift scan per series
    (the metric-per-segment shape): identical exact arithmetic to
    :func:`cusum_changepoint` with the group columns on every
    aggregate/window; the per-group argmax with earliest-position
    tie-break stays ONE struct-max aggregate.  Output one row per
    non-empty group: (group…, n, change_at, d_num, cusum)."""
    gcols = list(group_cols)
    pts = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *gcols,
        F.col(order_col).cast("long").alias("_o"),
        F.col(value_col).cast("long").alias("_x"),
    )
    g = pts.groupBy(*gcols, "_o").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum("_x").cast(_D38).alias("_s"),
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("_o")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*gcols)
    cum = g.select(
        *gcols,
        "_o",
        F.sum("_c").over(w_cum).cast(_D38).alias("_cc"),
        F.sum("_s").over(w_cum).alias("_cs"),
        F.sum("_c").over(w_all).cast("long").alias("n"),
        F.sum("_s").over(w_all).alias("_sn"),
    )
    d = F.abs(F.col("n").cast(_D38) * F.col("_cs") - F.col("_cc") * F.col("_sn"))
    return (
        cum.select(
            *gcols,
            "n",
            F.struct(d.alias("d"), (-F.col("_o")).alias("no")).alias("_k"),
        )
        .groupBy(*gcols, "n")
        .agg(F.max("_k").alias("_k"))
        .select(
            *gcols,
            "n",
            (-F.col("_k.no")).alias("change_at"),
            F.col("_k.d").alias("d_num"),
            _exact_div6(F.col("_k.d"), F.col("n").cast(_D38)).alias("cusum"),
        )
    )


def two_proportion_z(
    df: DataFrame,
    flag_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test — the A/B conversion-rate comparison:
    does group A (``flag_col`` ≠ 0) convert (``success_col`` ≠ 0) at a
    different rate than group B?

        z = (p_A − p_B) / √(p̂(1−p̂)(1/n_A + 1/n_B)),  p̂ pooled

    ONE conditional-sum aggregate of four exact integer counts; the
    rate difference is one exact rational (signed half-away rounding),
    z and the normal two-sided p mirror the identical double op chain
    in both engines.  Output ONE row: (n_a, n_b, s_a, s_b, rate_diff,
    z, p_normal) — z/p NULL when a group is empty or the pooled rate
    is degenerate (0 or 1)."""
    pts = df.filter(
        F.col(flag_col).isNotNull() & F.col(success_col).isNotNull()
    ).select(
        F.when(F.col(flag_col).cast("int") != 0, 1).otherwise(0).alias("_a"),
        F.when(F.col(success_col).cast("int") != 0, 1)
        .otherwise(0)
        .alias("_s"),
    )
    a = F.col("_a") == 1
    m = pts.agg(
        F.coalesce(F.sum(F.when(a, 1)), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum(F.when(~a, 1)), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.when(a, F.col("_s"))), F.lit(0))
        .cast("long")
        .alias("s_a"),
        F.coalesce(F.sum(F.when(~a, F.col("_s"))), F.lit(0))
        .cast("long")
        .alias("s_b"),
    )
    na, nb = F.col("n_a").cast(_D38), F.col("n_b").cast(_D38)
    sa, sb = F.col("s_a").cast(_D38), F.col("s_b").cast(_D38)
    diff_num = sa * nb - sb * na
    # doubles from exact pieces, fixed op order (mirrored in oracles)
    pa = F.col("s_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("s_b").cast("double") / F.col("n_b").cast("double")
    pp = (sa + sb).cast("double") / (na + nb).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = (pa - pb) / se
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    ok = both & (F.col("s_a") + F.col("s_b") > 0) & (
        F.col("s_a") + F.col("s_b") < F.col("n_a") + F.col("n_b")
    )
    return m.select(
        "n_a",
        "n_b",
        "s_a",
        "s_b",
        F.when(both, _exact_div6_signed(diff_num, na * nb)).alias(
            "rate_diff"
        ),
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, _normal_two_sided_p(F.abs(z))).alias("p_normal"),
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    bucket_size: int = 1_000_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: the sup-norm distance
    between the two empirical CDFs — the distribution-drift test
    (did this snapshot's length/score distribution move?).

        D = max_v |F_A(v) − F_B(v)|
          = max_v |n_B·cumA(v) − n_A·cumB(v)| / (n_A·n_B)

    Exact arithmetic: the numerator is an integer max over DISTINCT
    values (inclusive cumulative counts from the bucketed two-level
    prefix sum — no global sort), carried in DECIMAL(38,0); only the
    final division is a double.  Envelope: n_A·n_B < 10³⁸.  Output ONE
    row: (n_a, n_b, d_num — the exact integer witness, ks_d double);
    NULL stats when either sample is empty."""
    g = _two_sample_counts(df, value_col, flag_col)
    g = _with_below(g, "_v", ["_ca", "_cb"], bucket_size)
    tot = g.agg(
        F.coalesce(F.sum("_ca"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("_cb"), F.lit(0)).cast("long").alias("n_b"),
    )
    cum_a = (F.col("_ca_below") + F.col("_ca")).cast(_D38)
    cum_b = (F.col("_cb_below") + F.col("_cb")).cast(_D38)
    diffs = g.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("n_b").cast(_D38) * cum_a - F.col("n_a").cast(_D38) * cum_b
        ).alias("_d"),
    )
    m = diffs.groupBy("n_a", "n_b").agg(F.max("_d").alias("_dn"))
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    out = m.select(
        "n_a",
        "n_b",
        F.when(both, F.col("_dn")).alias("d_num"),
        F.when(
            both,
            _exact_div6(
                F.col("_dn"),
                F.col("n_a").cast(_D38) * F.col("n_b").cast(_D38),
            ),
        ).alias("ks_d"),
    )
    # empty input: groupBy over zero rows yields zero rows — restore the
    # one-row contract from the (always one-row) totals aggregate
    return out.unionByName(
        tot.join(m.select("n_a", "n_b"), ["n_a", "n_b"], "left_anti").select(
            "n_a",
            "n_b",
            F.lit(None).cast(_D38).alias("d_num"),
            F.lit(None).cast("double").alias("ks_d"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_size: int = 1_000_000,
) -> DataFrame:
    """CUSUM mean-shift changepoint: the position along ``order_col``
    maximizing the centered cumulative-sum deviation

        D(k) = |S(k) − C(k)·S_n/n| = |n·S(k) − C(k)·S_n| / n

    (S(k)/C(k) = value-sum/row-count through order position k) — the
    classic drift detector (Page 1954; the batch twin of the streaming
    anomaly lane): where did the metric's mean shift?

    Exact arithmetic: order and value must be int64 (quantize floats
    upstream); per distinct order position the counts/sums aggregate,
    the inclusive cumulatives run via the bucketed two-level prefix sum
    (no global sort), and the numerator |n·S(k) − C(k)·S_n| is exact
    DECIMAL(38,0).  The argmax tie-breaks to the SMALLEST order via a
    single struct-max aggregate (max on (d, −order)) — no second pass,
    nothing collects.  Envelope: n·Σ|v| < 10³⁸.

    Output ONE row: (n, change_at — the order position, d_num — exact
    witness, cusum = D/n rounded at 6 via integer half-away division);
    all NULL-stat when n = 0."""
    pts = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(order_col).cast("long").alias("_o"),
        F.col(value_col).cast("long").alias("_x"),
    )
    g = pts.groupBy("_o").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum("_x").cast(_D38).alias("_s"),
    )
    g = _with_below(g, "_o", ["_c", "_s"], bucket_size)
    tot = g.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("_s"), F.lit(0).cast(_D38)).alias("_sn"),
    )
    cumc = (F.col("_c_below") + F.col("_c")).cast(_D38)
    cums = (F.col("_s_below") + F.col("_s")).cast(_D38)
    d = F.abs(F.col("n").cast(_D38) * cums - cumc * F.col("_sn"))
    m = (
        g.crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.struct(d.alias("d"), (-F.col("_o")).alias("no")).alias("_k"),
        )
        .groupBy("n")
        .agg(F.max("_k").alias("_k"))
        .select(
            "n",
            (-F.col("_k.no")).alias("change_at"),
            F.col("_k.d").alias("d_num"),
            _exact_div6(F.col("_k.d"), F.col("n").cast(_D38)).alias("cusum"),
        )
    )
    # empty input: the grouped frame has no rows — restore the one-row
    # contract from the always-one-row totals aggregate
    return m.unionByName(
        tot.join(m.select("n"), ["n"], "left_anti").select(
            "n",
            F.lit(None).cast("long").alias("change_at"),
            F.lit(None).cast(_D38).alias("d_num"),
            F.lit(None).cast("double").alias("cusum"),
        )
    )


def average_precision(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    scale: int = 1_000_000_000,
    bucket_size: int = 1_000_000,
) -> DataFrame:
    """Exact average precision (PR ranking quality) of integer scores —
    the precision-weighted companion to :func:`similarity.exact_auc`
    (class-imbalance-sensitive, the retrieval/filter-model standard):

        AP = Σ_s (TP(s) − TP(s_prev)) · TP(s)/(TP(s)+FP(s)) / P

    over DISTINCT scores s descending (sklearn's
    ``average_precision_score`` step definition — a tied block
    contributes at the whole block's precision, so no tie-break order
    exists to disagree on).  Scores must be int64 (quantize-first).

    Exactness without float accumulation: each precision term is
    floored at a fixed integer scale,

        term(s) = (Δtp(s) · TP(s) · scale) div (TP(s) + FP(s)),

    an integral division both engines compute identically (quotient ≤
    Δtp·scale fits int64 for Δtp < 9·10⁹ at the default scale; the
    dividend is DECIMAL(38,0)); the terms SUM exactly (ap_num ≤
    P·scale) and only the final ``ap_num / (P·scale)`` is a double.
    The deliberate floor bias is < #distinct-scores/(P·scale) — at the
    default scale, < 10⁻⁹ per distinct score per positive.

    Cumulative TP/FP run over distinct scores via the bucketed
    two-level prefix sum on the NEGATED score (descending = ascending
    on −s); one aggregate ends the plan.  Output ONE row: (n, n_pos,
    ap_num — exact integer witness, ap double; NULL ap when no
    positives)."""
    if scale < 1:
        raise ValueError(f"average_precision: scale must be >= 1, got {scale}")
    g = (
        df.filter(F.col(label_col).isNotNull() & F.col(score_col).isNotNull())
        .select(
            (-F.col(score_col).cast("long")).alias("_v"),
            F.when(F.col(label_col).cast("int") != 0, 1)
            .otherwise(0)
            .alias("_pos"),
        )
        .groupBy("_v")
        .agg(
            F.sum("_pos").alias("_pc"),
            F.sum(1 - F.col("_pos")).alias("_nc"),
        )
    )
    g = _with_below(g, "_v", ["_pc", "_nc"], bucket_size)
    tp = (F.col("_pc_below") + F.col("_pc")).cast(_D38)
    fp = (F.col("_nc_below") + F.col("_nc")).cast(_D38)
    terms = g.select(
        F.expr(
            f"CAST(_pc AS {_D38}) * CAST(_pc_below + _pc AS {_D38})"
            f" * CAST({scale} AS {_D38})"
        ).alias("_dividend"),
        (tp + fp).alias("_k"),
        "_pc",
        "_nc",
    ).select(
        F.expr(f"_dividend div _k").cast(_D38).alias("_t"),
        "_pc",
        "_nc",
    )
    m = terms.agg(
        F.coalesce(F.sum("_t"), F.lit(0).cast(_D38)).alias("_apn"),
        F.coalesce(F.sum("_pc"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("_pc") + F.sum("_nc"), F.lit(0))
        .cast("long")
        .alias("n"),
    )
    return m.select(
        "n",
        "n_pos",
        F.col("_apn").cast("long").alias("ap_num"),
        F.when(
            F.col("n_pos") > 0,
            _exact_div6(
                F.col("_apn"),
                F.col("n_pos").cast(_D38) * F.lit(scale).cast(_D38),
            ),
        ).alias("ap"),
    )


def js_divergence(
    df: DataFrame,
    item_col: str,
    flag_col: str,
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between the item distributions
    of sample A (``flag_col`` ≠ 0) and sample B — the bounded
    symmetric corpus-drift metric (0 = identical, ln 2 = disjoint):
    did this snapshot's token/domain mix move?

        JS = ½·Σᵢ Pᵢ·ln(Pᵢ/Mᵢ) + ½·Σᵢ Qᵢ·ln(Qᵢ/Mᵢ),  M = (P+Q)/2

    Exact-sum arithmetic (the nb_fit/dsir convention): per item the
    ratios P/M = 2·ca·n_b/(ca·n_b + cb·n_a) and Q/M (mirror) are
    ratios of exact integers; each ln quantizes round(ln, 6) ONCE to
    DECIMAL(18,6), the Σ ca·lp / Σ cb·lq sums are exact decimals
    (counts cast DECIMAL(12,0)), and the two halves combine over the
    common denominator 2·n_a·n_b as ONE exact rational rounded with
    integer half-away division.  Absent-side items contribute exactly
    ln 2 (P/M = 2) — no smoothing needed.

    One item-keyed aggregate + a 1-row broadcast total; no windows.
    Output ONE row: (n_a, n_b, n_items, js) — js NULL when either
    sample is empty."""
    pts = df.filter(
        F.col(item_col).isNotNull() & F.col(flag_col).isNotNull()
    ).select(
        F.col(item_col).alias("_v"),  # any type — items never cast
        F.when(F.col(flag_col).cast("int") != 0, 1).otherwise(0).alias("_a"),
    )
    g = pts.groupBy("_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(1 - F.col("_a")).alias("_cb"),
    )
    tot = g.agg(
        F.coalesce(F.sum("_ca"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("_cb"), F.lit(0)).cast("long").alias("n_b"),
        F.count(F.lit(1)).alias("n_items"),
    )
    na, nb = F.col("n_a").cast(_D38), F.col("n_b").cast(_D38)
    ca, cb = F.col("_ca").cast(_D38), F.col("_cb").cast(_D38)
    mix = ca * nb + cb * na
    d186 = "decimal(18,6)"
    terms = g.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        "n_items",
        F.when(
            F.col("_ca") > 0,
            F.col("_ca").cast("decimal(12,0)")
            * F.round(
                F.log(
                    (F.lit(2).cast(_D38) * ca * nb).cast("double")
                    / mix.cast("double")
                ),
                6,
            ).cast(d186),
        ).alias("_tp"),
        F.when(
            F.col("_cb") > 0,
            F.col("_cb").cast("decimal(12,0)")
            * F.round(
                F.log(
                    (F.lit(2).cast(_D38) * cb * na).cast("double")
                    / mix.cast("double")
                ),
                6,
            ).cast(d186),
        ).alias("_tq"),
    )
    zero6 = F.lit(0).cast("decimal(31,6)")
    m = terms.groupBy("n_a", "n_b", "n_items").agg(
        F.coalesce(F.sum("_tp"), zero6).alias("_s1"),
        F.coalesce(F.sum("_tq"), zero6).alias("_s2"),
    )
    # one exact rational: (s1·nb + s2·na) / (2·na·nb), s1/s2 scaled to
    # integer micro-units first
    s1_6 = F.expr("CAST(_s1 * 1000000 AS DECIMAL(38,0))")
    s2_6 = F.expr("CAST(_s2 * 1000000 AS DECIMAL(38,0))")
    num = s1_6 * nb + s2_6 * na
    den = (
        F.lit(2).cast(_D38) * na * nb * F.lit(1_000_000).cast(_D38)
    )
    out = m.select(
        "n_a",
        "n_b",
        "n_items",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            _exact_div6_signed(num, den),
        ).alias("js"),
    )
    return out.unionByName(
        tot.join(
            m.select("n_a", "n_b", "n_items"),
            ["n_a", "n_b", "n_items"],
            "left_anti",
        ).select(
            "n_a",
            "n_b",
            "n_items",
            F.lit(None).cast("double").alias("js"),
        )
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns — the
    feature-selection / dependence primitive next to chi-square:

        MI = Σ_{x,y} c_xy/n · ln(n·c_xy / (c_x·c_y))

    Exact-sum arithmetic: each cell's log ratio of exact integers
    quantizes round(ln, 6) ONCE to DECIMAL(18,6); Σ c_xy·lp is an
    exact decimal (counts cast DECIMAL(12,0)) and the final /n rounds
    with SIGNED integer half-away division (quantized cell terms can
    dip a microdigit below zero even though MI ≥ 0).

    Plan: one (x,y) cell aggregate + two broadcast marginal joins + a
    1-row total; all map-side combined.  Output ONE row: (n, n_cells,
    mi) — mi NULL when n = 0."""
    pts = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    cells = pts.groupBy("_x", "_y").agg(F.count(F.lit(1)).alias("_cxy"))
    mx = pts.groupBy("_x").agg(F.count(F.lit(1)).alias("_cx"))
    my = pts.groupBy("_y").agg(F.count(F.lit(1)).alias("_cy"))
    tot = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    n38 = F.col("n").cast(_D38)
    lp = F.round(
        F.log(
            (n38 * F.col("_cxy").cast(_D38)).cast("double")
            / (F.col("_cx").cast(_D38) * F.col("_cy").cast(_D38)).cast(
                "double"
            )
        ),
        6,
    ).cast("decimal(18,6)")
    terms = (
        cells.join(F.broadcast(mx), "_x")
        .join(F.broadcast(my), "_y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            (F.col("_cxy").cast("decimal(12,0)") * lp).alias("_t"),
        )
    )
    zero6 = F.lit(0).cast("decimal(31,6)")
    m = terms.groupBy("n").agg(
        F.coalesce(F.sum("_t"), zero6).alias("_s"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    num = F.expr("CAST(_s * 1000000 AS DECIMAL(38,0))")
    den = n38 * F.lit(1_000_000).cast(_D38)
    out = m.select(
        "n",
        F.col("n_cells").cast("long").alias("n_cells"),
        F.when(F.col("n") > 0, _exact_div6_signed(num, den)).alias("mi"),
    )
    return out.unionByName(
        tot.join(m.select("n"), ["n"], "left_anti").select(
            "n",
            F.lit(0).cast("long").alias("n_cells"),
            F.lit(None).cast("double").alias("mi"),
        )
    )


# Poisson(1) inverse-CDF thresholds at the 60-bit md5 scale:
# t_k = floor(CDF(k)·2^60) for k = 0..8; u ≥ t_8 → weight 9 (residual
# probability < 1.2e-6).  Fixed literals — identical in the DuckDB
# oracle, deterministic forever.
POISSON1_THRESHOLDS = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
    1152920207336574720,
)


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    replicates: int = 100,
    tail_bp: int = 250,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean — the
    distributed bootstrap (Chamandy et al. 2012 / the m-out-of-n
    one-pass form): every (row, replicate) pair draws a Poisson(1)
    resample weight, so each replicate's weighted mean is one bootstrap
    resample WITHOUT materializing resamples.

    DERANDOMIZED and exact (the md5-coin convention): ONE md5 per row
    seeds a per-row Weyl rotation over the replicate counter —
    u_r = (h2 + (r+1)·h1) mod 2⁶⁰ from the digest's two 60-bit halves
    (counter-based PRNG; marginally each replicate is an exact Poisson
    bootstrap draw) — tested against fixed inverse-CDF thresholds
    (:data:`POISSON1_THRESHOLDS`) with integer compares, no RNG;
    replicate sums Σw·x and Σw aggregate in
    DECIMAL(38,0) and each replicate mean rounds with signed integer
    half-away division.  The CI is the nearest-rank percentile pair
    over the replicate means with INTEGER rank arithmetic
    (``lo = ceil(R'·tail_bp/10⁴)``, ``hi = R' − lo + 1`` — never a
    float ``α·R`` whose last ulp flips the rank).  Everything
    replays bit-identically in SQL: FULL hash oracle.

    ``tail_bp`` = per-tail mass in basis points (250 → a 95% CI).
    Replicates whose total weight is 0 drop (probability e^{−n});
    ``n_replicates`` reports the effective count.

    Plan: one R-way explode (CPU-only; the shuffle carries R rows per
    partition after map-side combine), ONE replicate-keyed aggregate,
    then windows over the R-row means frame (bounded by construction —
    the rrf posture).  Envelope: 9·n·|x| < 10³⁸.

    Output ONE row: (n, mean, ci_lo, ci_hi, n_replicates)."""
    if replicates < 1:
        raise ValueError(
            f"bootstrap_mean_ci: replicates must be >= 1, got {replicates}"
        )
    if not 0 < tail_bp < 5000:
        raise ValueError(
            f"bootstrap_mean_ci: tail_bp must be in (0, 5000), got {tail_bp}"
        )
    pts = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_x"),
    )
    tot = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col("_x").cast(_D38)), F.lit(0).cast(_D38)).alias(
            "_sx"
        ),
    )
    # ONE md5 per ROW (not per row×replicate — that md5 dominated the
    # whole operator at sf0.1/R=100): the digest's two 60-bit halves
    # seed a per-row Weyl rotation over the replicate counter,
    # u_r = (h2 + (r+1)·h1) mod 2^60 — the counter-based-PRNG posture.
    # Marginally each replicate's weights are EXACT Poisson bootstrap
    # draws (h2 + c·h1 is uniform for random h1,h2); only the
    # within-row cross-replicate dependence is weaker than independent
    # hashing, which bootstrap quantiles average out across rows (the
    # pmf pytest pins the marginal distribution).  The mod-2^60 product
    # splits h1 into 30-bit limbs so EVERYTHING stays int64 codegen —
    # (r+1)·h1 would overflow a long, and DECIMAL arithmetic here
    # measured SLOWER than the per-pair md5 it replaced.
    from kafka_merge_purge_spark.plans.introspect import projection_barrier

    digest = F.md5(F.col("_id"))
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 17, 15), 16, 10).cast("long")
    # the barrier pins the md5/conv to ONE evaluation per ROW —
    # CollapseProject otherwise splits the hash projection ABOVE the
    # explode's Generate and re-hashes per (row × replicate) (measured:
    # the whole operator 24 s → 4 s at sf0.1/R=100)
    hashed = projection_barrier(
        pts.select(
            F.col("_x"),
            F.shiftright(h1, 30).alias("_a"),  # hi limb (h1 >> 30)
            F.pmod(h1, F.lit(2**30)).alias("_b"),  # lo limb
            h2.alias("_h2"),
        )
    )
    e = hashed.select(
        "_x",
        "_a",
        "_b",
        "_h2",
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("_r"),
    )
    r1 = F.col("_r") + F.lit(1)
    # ((r+1)·h1) mod 2^60 = ((r+1)·hi mod 2^30)·2^30 + (r+1)·lo, all
    # intermediates < 2^61: long-safe under ANSI
    rot = (
        F.pmod(r1 * F.col("_a"), F.lit(2**30)) * F.lit(2**30)
        + r1 * F.col("_b")
    )
    u = F.pmod(F.col("_h2") + rot, F.lit(2**60))
    w = F.lit(9)
    for k in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_THRESHOLDS[k]), k).otherwise(w)
    # replicate sums in LONG, not DECIMAL — the 150M-row decimal
    # multiply-accumulate measured ~50× slower than codegen long sums
    # (32 s → 0.7 s for the whole aggregate at sf0.1/R=100).  Envelope:
    # Σw·x ≤ 9·Σ|x| must fit int64 → Σ|x| < 10¹⁸; ANSI sum overflow
    # raises eagerly (the repo's eager-guard posture) — quantize
    # coarser upstream past it.
    g = e.select("_r", "_x", w.alias("_w")).groupBy("_r").agg(
        F.coalesce(F.sum(F.col("_w") * F.col("_x")), F.lit(0))
        .cast(_D38)
        .alias("_s"),
        F.coalesce(F.sum("_w"), F.lit(0)).cast("long").alias("_c"),
    )
    means = g.filter(F.col("_c") > 0).select(
        "_r",
        _exact_div6_signed(F.col("_s"), F.col("_c").cast(_D38)).alias("_m"),
    )
    w_rank = Window.orderBy("_m", "_r")
    w_all = Window.partitionBy()
    ranked = means.select(
        "_m",
        F.row_number().over(w_rank).alias("_k"),
        F.count(F.lit(1)).over(w_all).alias("_rr"),
    )
    lo_k = F.expr(f"CAST((_rr * {tail_bp} + 9999) DIV 10000 AS INT)")
    sel = ranked.select(
        "_m", "_k", "_rr", lo_k.alias("_lo"), (F.col("_rr") - lo_k + 1).alias("_hi")
    ).agg(
        F.min(F.when(F.col("_k") == F.col("_lo"), F.col("_m"))).alias(
            "ci_lo"
        ),
        F.min(F.when(F.col("_k") == F.col("_hi"), F.col("_m"))).alias(
            "ci_hi"
        ),
        F.coalesce(F.max("_rr"), F.lit(0)).cast("long").alias("n_replicates"),
    )
    return tot.crossJoin(F.broadcast(sel)).select(
        "n",
        F.when(
            F.col("n") > 0,
            _exact_div6_signed(F.col("_sx"), F.col("n").cast(_D38)),
        ).alias("mean"),
        "ci_lo",
        "ci_hi",
        "n_replicates",
    )


def median_ci(
    df: DataFrame,
    value_col: str,
    bucket_size: int = 1_000_000,
) -> DataFrame:
    """Distribution-free 95% confidence interval for the MEDIAN via
    order statistics (the binomial sign-test inversion — no resampling,
    no normality assumption; the companion to
    :func:`bootstrap_mean_ci`):

        l = ⌊(n − z·√n)/2⌋,  u = n − l + 1,   z = 1.959964
        CI = [x₍l₎, x₍u₎]

    (the classic large-sample rank pair; coverage ≥ 95% for continuous
    data).  The median itself is the average of the two middle order
    statistics, rounded with exact integer half-away arithmetic.

    All selection runs on the per-value counts: one value-keyed
    aggregate, inclusive cumulatives via the bucketed two-level prefix
    sum, and each order statistic is ``min(v | cum ≥ k)`` — three
    conditional mins in ONE aggregate, no sort, no per-row rank.  The
    only float is z·√n (one sqrt + mult + floor on the same doubles in
    both engines).  Output ONE row: (n, median, ci_lo, ci_hi) — CI
    NULL when n < 3 (the rank pair collapses)."""
    pts = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("_v")
    )
    g = pts.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    g = _with_below(g, "_v", ["_c"], bucket_size)
    tot = g.agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n"))
    n_d = F.col("n").cast("double")
    l_rank = F.floor(
        (n_d - F.lit(1.959964) * F.sqrt(n_d)) / F.lit(2.0)
    ).cast("long")
    cum = (F.col("_c_below") + F.col("_c")).cast("long")
    # lower/upper middle order statistics: ⌈n/2⌉ and ⌊n/2⌋+1
    m_lo = F.expr("(n + 1) DIV 2")
    m_hi = F.expr("n DIV 2 + 1")
    sel = (
        g.crossJoin(F.broadcast(tot))
        .select(
            "n",
            "_v",
            cum.alias("_cum"),
            l_rank.alias("_l"),
            (F.col("n") - l_rank + 1).alias("_u"),
            m_lo.alias("_ml"),
            m_hi.alias("_mh"),
        )
        .groupBy("n")
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_ml"), F.col("_v"))).alias(
                "_vml"
            ),
            F.min(F.when(F.col("_cum") >= F.col("_mh"), F.col("_v"))).alias(
                "_vmh"
            ),
            F.min(
                F.when(
                    (F.col("_l") >= 1) & (F.col("_cum") >= F.col("_l")),
                    F.col("_v"),
                )
            ).alias("_vl"),
            F.min(F.when(F.col("_cum") >= F.col("_u"), F.col("_v"))).alias(
                "_vu"
            ),
        )
    )
    med = _exact_div6_signed(
        (F.col("_vml") + F.col("_vmh")).cast(_D38),
        F.lit(2).cast(_D38),
    )
    ok = F.col("n") >= 3
    out = sel.select(
        "n",
        med.alias("median"),
        F.when(ok, F.col("_vl").cast("double")).alias("ci_lo"),
        F.when(ok, F.col("_vu").cast("double")).alias("ci_hi"),
    )
    return out.unionByName(
        tot.join(out.select("n"), ["n"], "left_anti").select(
            "n",
            F.lit(None).cast("double").alias("median"),
            F.lit(None).cast("double").alias("ci_lo"),
            F.lit(None).cast("double").alias("ci_hi"),
        )
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str = "prob_q",
    label_col: str = "label",
    bins: int = 10,
    prob_scale: int = 1_000_000,
) -> DataFrame:
    """Reliability-diagram bins: group rows by predicted-probability
    bin and compare mean confidence to observed accuracy — the
    model-calibration diagnostic.  ``prob_col`` is the quantized
    probability in [0, prob_scale] (micro-probabilities at the
    default); p = prob_scale lands in the last bin.

    Pure groupBy (map-side combined, no joins/windows); confidence and
    accuracy are single rounded divisions on exact integer sums.
    Output per non-empty bin: (bin, n_rows, n_pos, conf, acc)."""
    if bins < 1:
        raise ValueError(f"calibration_bins: bins must be >= 1, got {bins}")
    pts = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        # integer DIV (not a double divide) so the bin edge floors
        # identically in both engines
        F.least(
            F.expr(
                f"CAST((CAST({prob_col} AS BIGINT) * {bins})"
                f" DIV {prob_scale} AS INT)"
            ),
            F.lit(bins - 1),
        ).alias("bin"),
        F.col(prob_col).cast("long").alias("_p"),
        F.when(F.col(label_col).cast("int") != 0, 1).otherwise(0).alias("_y"),
    )
    g = pts.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum("_p").cast(_D38).alias("_sp"),
    )
    return g.select(
        "bin",
        "n_rows",
        "n_pos",
        _exact_div6(
            F.col("_sp"),
            F.col("n_rows").cast(_D38) * F.lit(prob_scale).cast(_D38),
        ).alias("conf"),
        _exact_div6(
            F.col("n_pos").cast(_D38), F.col("n_rows").cast(_D38)
        ).alias("acc"),
    )


def ece(
    df: DataFrame,
    prob_col: str = "prob_q",
    label_col: str = "label",
    bins: int = 10,
    prob_scale: int = 1_000_000,
) -> DataFrame:
    """Expected Calibration Error over :func:`calibration_bins`'s
    binning, as ONE exact rational:

        ECE = Σ_b (n_b/N)·|acc_b − conf_b|
            = Σ_b |n_pos_b·prob_scale − Σp_b| / (N·prob_scale)

    — the per-bin weights cancel into a single integer numerator
    (DECIMAL(38,0); envelope N·prob_scale < 10³⁸), so both engines
    compute the identical sum and one final double division.  Output
    ONE row: (n, ece_num — exact integer witness, ece double; NULL
    when n = 0)."""
    if bins < 1:
        raise ValueError(f"ece: bins must be >= 1, got {bins}")
    pts = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.least(
            F.expr(
                f"CAST((CAST({prob_col} AS BIGINT) * {bins})"
                f" DIV {prob_scale} AS INT)"
            ),
            F.lit(bins - 1),
        ).alias("_bin"),
        F.col(prob_col).cast("long").alias("_p"),
        F.when(F.col(label_col).cast("int") != 0, 1).otherwise(0).alias("_y"),
    )
    g = pts.groupBy("_bin").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").cast(_D38).alias("_pos"),
        F.sum("_p").cast(_D38).alias("_sp"),
    )
    m = g.agg(
        F.coalesce(
            F.sum(
                F.abs(
                    F.col("_pos") * F.lit(prob_scale).cast(_D38)
                    - F.col("_sp")
                )
            ),
            F.lit(0).cast(_D38),
        ).alias("_num"),
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n"),
    )
    return m.select(
        "n",
        F.col("_num").cast("long").alias("ece_num"),
        F.when(
            F.col("n") > 0,
            _exact_div6(
                F.col("_num"),
                F.col("n").cast(_D38) * F.lit(prob_scale).cast(_D38),
            ),
        ).alias("ece"),
    )
