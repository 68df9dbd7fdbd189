"""Event-analytics operators: funnel, cohort retention, chi-square.

The product-analytics tier over the events stream.  Each operator is one
or two hash aggregates (map-side combined) plus in-expression logic — no
self-joins over the fact table, no windows over the full corpus — so all
of them scale as grouped aggregations at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """How far each user progresses through the ordered ``steps``
    sequence: stage i is reached when a ``steps[i]`` event occurs after
    the event that reached stage i-1 (ties broken by ``id_col``).

    ONE shuffle: per-user events collect into an in-expression
    (ts, event_id)-sorted array and an ``aggregate()`` fold walks the
    stage machine — no per-step self-joins, no windows.  The greedy fold
    decides exactly the EXISTS-chain reachability (first step-0 event <
    some step-1 event < … in the total order), which the DuckDB oracle
    states directly.

    Output: (user_col, funnel_stage) with stage in [0, len(steps)].
    """
    seq = events.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct(ts_col, id_col, type_col))).alias("evs")
    )

    def step(acc, x):
        out = acc
        for i, s in enumerate(steps):
            out = F.when((acc == i) & (x[type_col] == s), F.lit(i + 1)).otherwise(out)
        return out

    stage = F.aggregate(F.col("evs"), F.lit(0), step)
    return seq.select(user_col, stage.alias("funnel_stage"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, distinct
    actives per (cohort_week, week_offset).  First-touch frame is a
    grouped min (map-side combined) joined back onto the events; the
    offset grid comes from the data, not a driver loop."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    j = events.join(first, user_col).select(
        user_col,
        "cohort_week",
        (
            F.datediff(F.date_trunc("week", F.col(ts_col)), F.col("cohort_week")) / 7
        ).cast("long").alias("week_offset"),
    )
    return j.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct(user_col).alias("n_active")
    )


def chi_square_cells(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Chi-square contingency cells for event_type × day-of-week:
    observed counts, expected counts, and per-cell contribution
    (o−e)²/e.  Marginals broadcast back onto the tiny cell frame; every
    float derives from exact integer counts in one expression, so cells
    hash across engines without a cross-cell float sum (a reader sums
    chi2_contrib through DECIMAL for the statistic — see
    functions/stable.py for why)."""
    cells = events.groupBy(type_col, F.dayofweek(ts_col).alias("dow")).agg(
        F.count(F.lit(1)).alias("observed")
    )
    row_tot = cells.groupBy(type_col).agg(F.sum("observed").alias("row_n"))
    col_tot = cells.groupBy("dow").agg(F.sum("observed").alias("col_n"))
    tot = cells.agg(F.sum("observed").alias("n"))
    expected = (F.col("row_n") * F.col("col_n")) / F.col("n")
    contrib = (F.col("observed") - expected) * (F.col("observed") - expected) / expected
    return (
        cells.join(F.broadcast(row_tot), type_col)
        .join(F.broadcast(col_tot), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            type_col,
            "dow",
            "observed",
            F.round(expected, 6).alias("expected"),
            F.round(contrib, 6).alias("chi2_contrib"),
        )
    )


def dataset_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One-pass dataset profile — the "dataset card" summary a corpus
    publication or ingest-validation step wants: per column its row
    count, NULL count, distinct count and min/max (rendered as strings
    for a uniform schema).

    Scale shape: ONE aggregate over the scan computes every column's
    stats simultaneously; the single stat row then explodes to long
    form in a narrow map, so the corpus is read exactly once no matter
    how many columns are profiled.  ``exact_distinct=False`` (default —
    the 100 TB posture) uses HyperLogLog ``approx_count_distinct``,
    keeping the plan a plain one-shuffle partial aggregate;
    ``exact_distinct=True`` switches to exact ``count_distinct``, which
    Spark plans via an Expand (input replicated ×columns before the
    exchange) — the oracle gate uses it because exactness is what the
    hash check pins.

    Output: (column, n_rows, n_null, n_distinct, min_value, max_value).
    """
    cols = columns if columns is not None else df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(col.isNull().cast("long")).alias("n_null"),
                nd.alias("n_distinct"),
                F.min(col).cast("string").alias("min_value"),
                F.max(col).cast("string").alias("max_value"),
            ).alias(f"_s_{c}")
        )
    one = df.agg(*aggs)
    return one.select(
        F.explode(F.array(*[F.col(f"_s_{c}") for c in cols])).alias("s")
    ).select("s.*")


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    lower: float = 0.01,
    upper: float = 0.99,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` to its group's
    [``lower``, ``upper``] exact interpolated percentiles — the
    standard outlier treatment before scaling/normalizing features or
    token-count-style metrics.

    Scale shape: the x_zscore posture — ONE tiny per-group percentile
    aggregate (exact sort-based percentile, the q_percentiles twin)
    broadcast back onto the facts; the fact table itself NEVER
    shuffles (no corpus-wide window).  Bounds are rounded to 1e-6
    BEFORE clamping so the clamp decision is engine-portable
    (both engines compare against the identical quantized bound).

    NULL/NaN discipline: NULL and NaN values pass through UNCLAMPED
    (clamped = value, clipped = 0) — greatest/least skip NULLs, so a
    naive clamp would FABRICATE the bound for a NULL input; and both
    are masked out of the percentile aggregate — Spark's percentile
    ranks NaN above every number, so one NaN row would silently shift
    the whole group's upper bound.

    Output: passthrough + (group, value, clamped, clipped)."""
    v = F.col(value_col)
    is_degenerate = v.isNull()
    if dict(df.dtypes).get(value_col) in ("float", "double"):
        is_degenerate = is_degenerate | F.isnan(v)
    clean = F.when(~is_degenerate, v)
    aggs = (
        F.round(F.percentile(clean, lower), 6).alias("_lo"),
        F.round(F.percentile(clean, upper), 6).alias("_hi"),
    )
    if group_col is not None:
        j = df.join(F.broadcast(df.groupBy(group_col).agg(*aggs)), group_col)
    else:
        j = df.crossJoin(F.broadcast(df.agg(*aggs)))
    clamped = F.when(
        is_degenerate, v
    ).otherwise(F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
    clipped = F.when(is_degenerate, F.lit(0)).otherwise(
        ((v < F.col("_lo")) | (v > F.col("_hi"))).cast("int")
    )
    out_cols = list(passthrough)
    if group_col is not None:
        out_cols.append(group_col)
    return j.select(
        *out_cols,
        v.alias("value"),
        F.round(clamped, 6).alias("clamped"),
        clipped.alias("clipped"),
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew diagnostics — the pre-flight check
    before shuffling 100 TB on a key: the ``top`` heaviest keys with
    their absolute and relative mass, against the corpus totals.  A
    key whose share dwarfs 1/shuffle-partitions is the one that
    stalls the stage — feed it to the salting tier
    (operators/skew.py) or AQE skew-join handles it at runtime.

    Output: (rank, key string, cnt, share, n_rows, n_keys) — totals
    ride every row (single-row broadcast cross-join) so one glance
    gives both the heavy key and its denominator.  NULL keys count as
    the literal key "NULL" (a null-heavy foreign key is the single
    most common real-world skew).

    Scale shape: ONE map-side-combined count aggregate, a top-N heap
    (TakeOrderedAndProject), and a 1-row broadcast — no full sort, no
    second scan."""
    keyed = df.select(
        F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")).alias("key")
    )
    counts = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), "key")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .crossJoin(F.broadcast(totals))
        .select(
            "rank",
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            "n_rows",
            "n_keys",
        )
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str,
    buckets: int = 8,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Equal-frequency (equi-depth) histogram per group: ``buckets``
    quantile buckets with their exact row counts and value bounds —
    the optimizer-statistics / feature-binning companion to the
    fixed-width x_histogram (equal-WIDTH bins starve on skewed data;
    equi-depth bins adapt their edges to the mass).

    Determinism: ``ntile`` splits ties by ROW ORDER, so engines
    disagree on duplicated values unless the sort is a total order —
    pass ``tiebreak_col`` (a unique key) whenever ``value_col`` can
    repeat; bounds round to 1e-6.

    Scale shape: one per-group window (sort-based, spillable) + one
    tiny (group, bucket) aggregate.  NULL values drop (no quantile
    rank).  Output: (group, bucket 1..buckets, n, lo, hi)."""
    from pyspark.sql import Window

    order = [F.col(value_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(group_col, value_col, *( [tiebreak_col] if tiebreak_col else [] ))
        .withColumn("bucket", F.ntile(buckets).over(w))
        .groupBy(group_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(value_col), 6).alias("lo"),
            F.round(F.max(value_col), 6).alias("hi"),
        )
    )
