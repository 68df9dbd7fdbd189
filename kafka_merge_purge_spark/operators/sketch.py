"""Mergeable frequency sketches: Misra-Gries heavy hitters.

The bounded-memory answer to "top domains / tokens / keys" over a
corpus whose distinct-value count dwarfs executor memory — the third
sketch family next to HLL distinct counting (x_approx_distinct) and
quantile sketches (x_approx_percentile), and the classic public
algorithm (Misra & Gries 1982) behind every heavy-hitters service.

Scale shape: ONE pass over the data builds a ≤``capacity``-entry
summary per partition inside an Arrow-batched ``mapInPandas`` kernel
(no shuffle of the raw values at all); the per-partition summaries —
``partitions × capacity`` rows, tiny — are merged by a single grouped
sum, which is a valid sketch merge: summed weights remain lower bounds
on true frequencies, and the classic guarantee composes across
partitions (any value with true global frequency > n/capacity survives
in at least one partition's summary, because each partition's sketch
retains everything above its local n_p/capacity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_update(counters: dict, value, capacity: int) -> None:
    """ONE Misra-Gries counter update, in place — the whole algorithm's
    invariant lives here (increment-if-present, insert-if-room, else
    decrement-all-and-evict-zeros), shared by the batch summaries below
    and the streaming fold (streaming/stateful.fold_heavy_hitters) so
    the two twins cannot drift (r6 review)."""
    if value in counters:
        counters[value] += 1
    elif len(counters) < capacity:
        counters[value] = 1
    else:
        dead = []
        for k in counters:
            counters[k] -= 1
            if counters[k] == 0:
                dead.append(k)
        for k in dead:
            del counters[k]


def misra_gries_summaries(
    df: DataFrame, value_col: str, capacity: int = 256
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(value, weight)`` with at
    most ``capacity`` rows per partition; ``weight`` is a LOWER bound on
    the value's in-partition frequency, undercounting by at most
    ``n_partition / capacity``.  NULL values are skipped (they are not
    a frequency class, matching count()'s NULL semantics)."""
    import pandas as pd
    from collections.abc import Iterator

    value_type = dict(df.select(value_col).dtypes)[value_col]

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[value_col]:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                mg_update(counters, v, capacity)
        if counters:
            yield pd.DataFrame(
                {value_col: list(counters), "weight": list(counters.values())}
            )

    return df.select(value_col).mapInPandas(
        summarize, schema=f"{value_col} {value_type}, weight long"
    )


def merged_heavy_hitters(
    df: DataFrame, value_col: str, capacity: int = 256
) -> DataFrame:
    """The FULL merged Misra-Gries summary (≤ ``partitions × capacity``
    rows before the grouped sum, ≤ that many distinct values after):
    every value with true global frequency > n/capacity is guaranteed
    present HERE — this frame, not any top-k slice of it, is the
    carrier of the classic guarantee (ADVICE r6: up to ``capacity``
    values can clear the threshold, so a ``limit(k)`` can cut a
    guaranteed survivor).  Callers needing the guarantee (e.g. "every
    domain above 1% of the corpus") consume this frame directly;
    callers wanting a leaderboard take :func:`heavy_hitters_sketch`."""
    return (
        misra_gries_summaries(df, value_col, capacity)
        .groupBy(value_col)
        .agg(F.sum("weight").alias("weight"))
    )


def heavy_hitters_sketch(
    df: DataFrame, value_col: str, k: int = 20, capacity: int = 256
) -> DataFrame:
    """Approximate top-``k`` most frequent values: per-partition
    Misra-Gries summaries merged by one grouped sum
    (:func:`merged_heavy_hitters`), then a bounded top-k.  ``weight``
    is a guaranteed lower bound on the true count.  The
    every-value-above-n/capacity presence guarantee holds for the
    MERGED summary, not this top-k slice — up to ``capacity`` values
    can exceed the threshold, so with ``k < capacity`` a guaranteed
    survivor can still be cut by the limit (ADVICE r6); use
    ``merged_heavy_hitters`` when the guarantee itself is the contract.
    Both properties are pinned in pytest against the exact aggregation.
    Deterministic tie-break (weight desc, value asc)."""
    return (
        merged_heavy_hitters(df, value_col, capacity)
        .orderBy(F.col("weight").desc(), F.col(value_col))
        .limit(k)
    )


def heavy_hitters_exact(df: DataFrame, value_col: str, k: int = 20) -> DataFrame:
    """Exact top-``k`` most frequent values — the sketch's correctness
    twin (one shuffle with map-side combine + a TakeOrdered finish),
    SQL-expressible for the DuckDB oracle.  Same tie-break as the
    sketch (count desc, value asc)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col(value_col))
        .limit(k)
    )


def grouped_mg_summaries(
    df: DataFrame, group_col: str, value_col: str, capacity: int = 256
) -> DataFrame:
    """Per-(partition, group) Misra-Gries summaries — the grouped form
    of :func:`misra_gries_summaries`: one Arrow pass keeps an
    independent ≤``capacity``-entry counter dict PER GROUP seen in the
    partition, so raw values still never shuffle and each group's
    summary carries the classic per-group guarantee (every value above
    that group's partition-local n/capacity survives).

    Memory note (the knob that matters at 100 TB): a task holds
    ``groups-seen-in-partition × capacity`` entries.  For low-cardinality
    groups (languages, sources, event types as GROUPS) that is trivial;
    for high-cardinality groups repartition by ``group_col`` first —
    each group then lands whole in one task, the merge becomes a
    no-op, and the guarantee tightens to the group's full n_g/capacity."""
    import pandas as pd
    from collections.abc import Iterator

    types = dict(df.select(group_col, value_col).dtypes)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict = {}
        for pdf in batches:
            for g, v in zip(pdf[group_col], pdf[value_col]):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                mg_update(groups.setdefault(g, {}), v, capacity)
        if groups:
            yield pd.DataFrame(
                {
                    group_col: [g for g, c in groups.items() for _ in c],
                    value_col: [v for c in groups.values() for v in c],
                    "weight": [w for c in groups.values() for w in c.values()],
                }
            )

    return df.select(group_col, value_col).mapInPandas(
        summarize,
        schema=f"{group_col} {types[group_col]}, "
        f"{value_col} {types[value_col]}, weight long",
    )


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 5,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-``k`` values PER GROUP at bounded memory: the
    grouped summaries merged by one (group, value) grouped sum, then a
    per-group rank window over the ≤ partitions×capacity summary rows
    (the window runs on sketch rows, never on the corpus).  ``weight``
    is a lower bound on the true in-group count; ties break weight
    desc, value asc, matching the exact twin.

    EXACT REGIME (the oracle gate's lever): with ``capacity`` ≥ the
    group's distinct-value count, Misra-Gries never decrements — the
    sketch IS the exact per-group count, so the full hash oracle
    applies; below that, the lower-bound/presence guarantees are pinned
    in pytest against the exact twin."""
    from pyspark.sql import Window

    merged = (
        grouped_mg_summaries(df, group_col, value_col, capacity)
        .groupBy(group_col, value_col)
        .agg(F.sum("weight").alias("weight"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("weight").desc(), F.col(value_col)
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", value_col, "weight")
    )

# --------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch — Bar-Yossef et al. 2002
# --------------------------------------------------------------------------


def kmv_hash(value) -> str:
    """The KMV hash: lowercase md5 hex of the value's UTF-8 bytes —
    chosen because Spark's ``F.md5``, DuckDB's ``MD5()`` and Python's
    ``hashlib.md5`` all agree byte-for-byte on string input, so the
    Arrow kernel, any Spark-expression twin and the SQL oracle order
    values identically.  Hex is compared lexicographically, which for
    fixed-width lowercase hex IS the numeric order of the 128-bit hash."""
    import hashlib

    return hashlib.md5(str(value).encode("utf-8")).hexdigest()


def _kmv_prune(entries: dict, k: int) -> None:
    """Keep the ``k`` smallest ``value -> hash`` entries by (hash,
    value).  In place; no-op when the dict is already small enough."""
    if len(entries) <= k:
        return
    keep = sorted(entries.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    entries.clear()
    entries.update(keep)


def grouped_kmv_summaries(
    df: DataFrame, group_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """Per-(partition, group) bottom-``k`` summaries: the ``k``
    lexicographically-smallest md5 hashes over the partition's DISTINCT
    values, one Arrow pass, raw values never shuffle (mirrors
    :func:`grouped_mg_summaries` — ≤ ``partitions × groups × k`` rows
    out).  Values are hashed as strings (``kmv_hash``); NULL values are
    skipped (not a distinct class, matching COUNT(DISTINCT) semantics).
    The amortized prune (trigger at 4k, cut to k) keeps the per-group
    dict O(k) no matter how many distinct values stream past."""
    import pandas as pd
    from collections.abc import Iterator

    group_type = dict(df.select(group_col).dtypes)[group_col]

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict = {}
        for pdf in batches:
            for g, v in zip(pdf[group_col], pdf[value_col]):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                entries = groups.setdefault(g, {})
                if v not in entries:
                    entries[v] = kmv_hash(v)
                    if len(entries) > 4 * k:
                        _kmv_prune(entries, k)
        for entries in groups.values():
            _kmv_prune(entries, k)
        if groups:
            yield pd.DataFrame(
                {
                    group_col: [g for g, e in groups.items() for _ in e],
                    value_col: [str(v) for e in groups.values() for v in e],
                    "h": [h for e in groups.values() for h in e.values()],
                }
            )

    return df.select(group_col, value_col).mapInPandas(
        summarize, schema=f"{group_col} {group_type}, {value_col} string, h string"
    )


def grouped_kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """The merged per-group KMV sketch: global bottom-``k`` distinct
    values by hash.  KMV's merge is EXACT — the k smallest of a union
    equals the k smallest over the per-partition k-smallest summaries
    (any globally-surviving hash survives its own partition's cut), so
    unlike Misra-Gries there is no approximation introduced by
    partitioning: ``sketch(A ∪ B) == merge(sketch(A), sketch(B))``
    bit-for-bit (pinned in pytest).  The rank window runs over sketch
    rows only (≤ partitions × k per group), never the corpus."""
    from pyspark.sql import Window

    s = grouped_kmv_summaries(df, group_col, value_col, k).dropDuplicates(
        [group_col, value_col]
    )
    w = Window.partitionBy(group_col).orderBy("h", value_col)
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", value_col, "h")
    )


def kmv_distinct_estimate(n_entries, k: int, max_hash):
    """Column expression for the KMV distinct estimate given a group's
    sketch size and its largest retained hash: with fewer than ``k``
    entries the sketch saw EVERY distinct value (the estimate is exact
    = ``n_entries``); at capacity the classic unbiased estimator
    ``(k-1) / U(h_k)`` applies, where ``U`` maps the top-48-bits of the
    k-th smallest hash into (0, 1)."""
    frac = F.conv(F.substring(max_hash, 1, 12), 16, 10).cast("double") / F.lit(
        float(16**12)
    )
    return F.when(n_entries < k, n_entries.cast("long")).otherwise(
        F.round((F.lit(float(k - 1)) / frac)).cast("long")
    )


def grouped_kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT) at bounded memory via the
    KMV sketch, plus the group's minimum hash (``min_hash`` pins the
    whole hash/order plumbing in the oracle, not just the count).

    EXACT REGIME (the oracle gate's lever, same as
    :func:`grouped_heavy_hitters`): with ``k`` > the group's true
    distinct count the sketch holds every distinct value and the
    estimate IS ``COUNT(DISTINCT value)`` — full hash oracle; the
    estimator regime's relative error (~1/sqrt(k-2)) is pinned in
    pytest on a 5000-distinct corpus."""
    sk = grouped_kmv_sketch(df, group_col, value_col, k)
    agg = sk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.max("h").alias("h_k"),
        F.min("h").alias("min_hash"),
    )
    return agg.select(
        group_col,
        kmv_distinct_estimate(F.col("n_entries"), k, F.col("h_k")).alias(
            "distinct_est"
        ),
        "min_hash",
    )


def merge_kmv_sketches(
    sk_a: DataFrame, sk_b: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Merge two per-group KMV sketches (e.g. two corpora, two days):
    union → dedupe by value → re-rank → bottom-k.  The result is
    bit-identical to the sketch of the concatenated corpora (KMV's
    exact mergeability — pinned in pytest), so union distinct counts
    come from ``kmv_distinct_estimate`` over the merged sketch with no
    rescan of either side."""
    from pyspark.sql import Window

    u = sk_a.select(group_col, value_col, "h").unionByName(
        sk_b.select(group_col, value_col, "h")
    ).dropDuplicates([group_col, value_col])
    w = Window.partitionBy(group_col).orderBy("h", value_col)
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", value_col, "h")
    )


# --------------------------------------------------------------------------
# Munro-Paterson quantile digest — deterministic mergeable quantile sketch
# --------------------------------------------------------------------------
#
# The third sketch family next to Misra-Gries (frequency) and KMV
# (distinct): bounded-memory quantiles via the classic deterministic
# multi-level buffer scheme (Munro & Paterson 1980; the derandomized
# ancestor of KLL).  All buffers hold exactly ``k`` sorted values; two
# same-level buffers collapse into one ONE level up by merge-sorting 2k
# values and keeping the odd positions (deterministic — no KLL coin),
# so a level-L value represents 2^L originals and total represented
# weight is conserved EXACTLY (collapse keeps k of 2k at double
# weight), meaning the digest always knows its true n.


def mp_new() -> dict:
    """Empty digest: ``partial`` accumulates raw values until ``k`` of
    them form a level-0 buffer; ``buffers`` maps level -> one sorted
    k-buffer (binary-counter invariant: at most one buffer per level)."""
    return {"partial": [], "buffers": {}}


def _mp_collapse(a: list, b: list) -> list:
    """Two size-k same-level buffers -> one size-k buffer a level up:
    merge-sort, keep odd positions (1, 3, ..., 2k-1).  Deterministic;
    the consistent odd-position choice is the standard derandomization
    (each kept value's true rank is straddled within the classic
    Munro-Paterson error bound)."""
    m = sorted(a + b)
    return m[1::2]


def _mp_carry(buffers: dict, level: int, buf: list) -> None:
    """Insert a sorted k-buffer at ``level``, collapsing upward while
    the level is occupied — the binary-counter carry."""
    while level in buffers:
        buf = _mp_collapse(buffers.pop(level), buf)
        level += 1
    buffers[level] = buf


def mp_update(digest: dict, value, k: int) -> None:
    """ONE value into the digest (shared by the batch kernel and the
    streaming fold, like ``mg_update``/``kmv_hash``)."""
    digest["partial"].append(value)
    if len(digest["partial"]) >= k:
        buf = sorted(digest["partial"])
        digest["partial"] = []
        _mp_carry(digest["buffers"], 0, buf)


def mp_merge(d1: dict, d2: dict, k: int) -> dict:
    """Merge two digests: carry d2's buffers into d1's level-wise
    (binary-counter addition), concatenate partials and re-carry any
    full k-slice.  Deterministic given the merge ORDER — the grouped
    operator below fixes that order by ascending partition id, and in
    the exact regime (total n ≤ k: everything still in partials, no
    collapse ever ran) the result is the plain multiset union,
    independent of order — which is what the hash gate relies on."""
    out = {"partial": list(d1["partial"]), "buffers": dict(d1["buffers"])}
    for level in sorted(d2["buffers"]):
        _mp_carry(out["buffers"], level, d2["buffers"][level])
    out["partial"].extend(d2["partial"])
    while len(out["partial"]) >= k:
        head, out["partial"] = out["partial"][:k], out["partial"][k:]
        _mp_carry(out["buffers"], 0, sorted(head))
    return out


def mp_count(digest: dict) -> int:
    """Exact represented count (weight is conserved by collapses)."""
    return len(digest["partial"]) + sum(
        (1 << lvl) * len(buf) for lvl, buf in digest["buffers"].items()
    )


def mp_quantiles(digest: dict, qs: list[float]) -> list:
    """Quantile estimates at the DuckDB ``quantile_disc`` selection
    rule: 1-indexed target rank ``ceil(q * n)`` computed in EXACT
    rational arithmetic (``Fraction(q)`` is the exact binary value of
    the float, so binary-exact quantiles like 0.25/0.875 can never
    drift across engines), answered with the smallest value whose
    cumulative weight reaches the rank.  Values are pure selections —
    no arithmetic touches them, so doubles hash bit-identically.
    Empty digest -> all None."""
    from fractions import Fraction

    n = mp_count(digest)
    if n == 0:
        return [None] * len(qs)
    items = [(v, 1) for v in digest["partial"]] + [
        (v, 1 << lvl) for lvl, buf in digest["buffers"].items() for v in buf
    ]
    items.sort(key=lambda t: t[0])
    out = []
    for q in qs:
        fr = Fraction(q) * n
        rank = max(1, -((-fr.numerator) // fr.denominator))  # ceil, exact
        cum = 0
        for v, w in items:
            cum += w
            if cum >= rank:
                out.append(v)
                break
    return out


def grouped_mp_summaries(
    df: DataFrame, group_col: str, value_col: str, k: int = 4096
) -> DataFrame:
    """Per-(partition, group) Munro-Paterson digests, exploded to rows
    ``(group, pid, level, value)`` — level -1 marks partial-buffer
    values (weight 1).  One Arrow pass; raw values never shuffle as a
    corpus, only ≤ ``partitions × groups × (k + k·levels)`` sketch rows
    do.  NULL values are skipped (matching quantile_disc)."""
    import pandas as pd
    from collections.abc import Iterator

    from pyspark import TaskContext

    types = dict(df.select(group_col, value_col).dtypes)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        groups: dict = {}
        for pdf in batches:
            for g, v in zip(pdf[group_col], pdf[value_col]):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                mp_update(groups.setdefault(g, mp_new()), float(v), k)
        rows_g, rows_l, rows_v = [], [], []
        for g, d in groups.items():
            for v in d["partial"]:
                rows_g.append(g); rows_l.append(-1); rows_v.append(v)
            for lvl, buf in d["buffers"].items():
                for v in buf:
                    rows_g.append(g); rows_l.append(lvl); rows_v.append(v)
        if rows_g:
            yield pd.DataFrame(
                {
                    group_col: rows_g,
                    "pid": [pid] * len(rows_g),
                    "level": rows_l,
                    value_col: rows_v,
                }
            )

    return df.select(group_col, value_col).mapInPandas(
        summarize,
        schema=f"{group_col} {types[group_col]}, pid int, level int, "
        f"{value_col} double",
    )


def grouped_mp_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.875),
    k: int = 4096,
) -> DataFrame:
    """Per-group quantiles at bounded memory: per-partition digests
    (one Arrow pass) -> ONE grouped shuffle of sketch rows ->
    ``applyInPandas`` rebuilds each partition's digest and merges them
    in ascending-pid order (the deterministic merge order), then reads
    the quantiles off the merged digest.  Output: one row per group
    with a ``q_<pct>`` column per requested quantile.

    EXACT REGIME (the oracle gate's lever, same as the MG and KMV
    gates): with ``k`` ≥ the group's row count no collapse ever runs,
    the merged digest is the group's exact multiset regardless of
    merge order, and each quantile IS DuckDB's ``quantile_disc`` —
    full hash oracle on the whole sketch plumbing (the values are pure
    selections, so doubles match bit-for-bit).  The estimator regime's
    rank-error bound is pinned in pytest."""
    import pandas as pd

    qcols = [f"q_{str(q)[2:]}" for q in qs]
    summaries = grouped_mp_summaries(df, group_col, value_col, k)

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[group_col].iloc[0]
        merged = mp_new()
        for pid in sorted(pdf["pid"].unique()):
            part = pdf[pdf["pid"] == pid]
            d = mp_new()
            # arrival order of partial values does not survive the
            # shuffle; sort so the merge's overflow slicing is
            # canonical — deterministic regardless of row order
            d["partial"] = sorted(part[part["level"] == -1][value_col])
            for lvl in sorted(part[part["level"] >= 0]["level"].unique()):
                d["buffers"][int(lvl)] = sorted(
                    part[part["level"] == lvl][value_col]
                )
            merged = mp_merge(merged, d, k)
        ests = mp_quantiles(merged, list(qs))
        return pd.DataFrame({group_col: [g], **{c: [e] for c, e in zip(qcols, ests)}})

    gtype = dict(df.select(group_col).dtypes)[group_col]
    out_schema = f"{group_col} {gtype}, " + ", ".join(f"{c} double" for c in qcols)
    return summaries.groupBy(group_col).applyInPandas(finish, schema=out_schema)


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

def _cm_bucket(row: int, value, width: int):
    """Portable count-min bucket: ``md5_int(row ':' value) mod width``
    — the same 60-bit md5 integer the KMV/heavy-hitter tiers use, so
    Spark, the Arrow fold and the DuckDB oracle land every value in the
    same cell."""
    from kafka_merge_purge_spark.operators.dedup import md5_int

    return F.pmod(
        md5_int(F.concat(F.lit(str(row)), F.lit(":"), value.cast("string"))),
        F.lit(width),
    )


def countmin_sketch(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the count-min sketch of ``value_col`` in long form: one row
    per non-empty cell ``(row, bucket, cnt)``, ≤ depth·width rows total
    no matter the input size.

    Scale shape: a narrow ``depth``-way explode (inline array of
    (row, bucket) structs) followed by ONE map-side-combined aggregate
    whose key space is depth·width — partial aggregation collapses each
    input partition to ≤ depth·width rows before the exchange, so the
    shuffle volume is CONSTANT in corpus size.  That is the whole point
    of a sketch at 100 TB: the reduce side sees kilobytes."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cm_bucket(i, F.col(value_col), width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_frequencies(
    df: DataFrame,
    value_col: str,
    queries: DataFrame | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min frequency estimates: ``est(v) = min over rows of
    cnt[row][h_row(v)]`` — never under-estimates, over-estimates by at
    most ~2·N/width with probability 1-2^-depth (the classic CM bound).

    ``queries``: one-column frame of items to probe; ``None`` (the
    demo/gate form) probes the input's own distinct values.  The sketch
    is ≤ depth·width rows, so the probe join is a broadcast — the big
    side never shuffles.

    Output: (item string, est long) — deterministic, fully replayable
    in SQL (the oracle recomputes the identical md5 cell arithmetic),
    so the gate hash-matches even in the colliding regime."""
    sk = countmin_sketch(df, value_col, depth, width)
    if queries is None:
        q = (
            df.filter(F.col(value_col).isNotNull())
            .select(F.col(value_col).cast("string").alias("item"))
            .distinct()
        )
    else:
        qcol = queries.columns[0]
        q = queries.select(F.col(qcol).cast("string").alias("item")).distinct()
    probes = q.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cm_bucket(i, F.col("item"), width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select("item", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    # LEFT join + coalesce 0: an empty cell means NO hashed value ever
    # landed there, so the count-min estimate for that row is 0 — an
    # inner join would silently drop never-seen probe items entirely
    # (and over-estimate items with a mix of empty and colliding
    # cells), diverging from the streaming twin's counts.get(cell, 0)
    return (
        probes.join(F.broadcast(sk), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
