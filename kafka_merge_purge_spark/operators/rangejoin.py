"""Binned range join: interval joins as equi-joins.

A naive range join (``fact.value BETWEEN ranges.lo AND ranges.hi``) plans
as a (broadcast) nested-loop join — O(|fact|·|ranges|) predicate
evaluations, and a non-starter when the ranges side is large.  The
standard scale technique is *binning*: quantize the value domain into
fixed-width bins, explode each range to the bins it overlaps, equi-join
on the bin id (hash join, shuffle or broadcast — Catalyst's choice), and
re-check the exact predicate to discard bin-edge false positives.

Semantics are identical to the naive join, which the parity gate
exploits: the binned query hashes against the *naive* SQL oracle.

At 100 TB: the bin id is a near-uniform key (bin width ≈ the value
distribution's scale), the fact side is touched once (narrow map to add
the bin), and per-row join work is O(ranges overlapping its bin), not
O(all ranges)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 64.0,
    hi_cap: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to the ranges containing their value
    (``lo <= value < hi``) via bin-id equi-join.

    ``hi_cap`` clamps open-ended ranges (e.g. hi = 1e9 sentinels) to the
    value domain's upper bound so they explode to O(domain/bin_width)
    bins, not O(hi/bin_width).  Pass the domain max (or a safe bound).
    """
    hi_eff = F.col(hi_col) if hi_cap is None else F.least(F.col(hi_col), F.lit(float(hi_cap)))
    binned_ranges = ranges.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                # hi is exclusive: a range ending exactly on a bin edge
                # does not overlap that bin
                F.floor((hi_eff - F.lit(1e-9)) / bin_width).cast("long"),
            )
        ),
    )
    binned_fact = fact.withColumn("_bin", F.floor(F.col(value_col) / bin_width).cast("long"))
    out = binned_fact.join(
        binned_ranges,
        (binned_fact["_bin"] == binned_ranges["_bin"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col)),
        how,
    )
    return out.drop("_bin")


def offset_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    max_offset: int,
    left_alias: str = "a",
    right_alias: str = "b",
    min_offset: int = 1,
) -> DataFrame:
    """Bounded-offset self/pair join as an EQUI join: all (a, b) pairs
    with ``min_offset <= b.id - a.id <= max_offset`` over an integer id
    column — the third instance of the repo's "non-equi band → equi key"
    rewrite (after :func:`binned_range_join`'s bins and the dedup tier's
    LSH bands), so it's an API now.

    A naive ``b.id > a.id AND b.id - a.id <= k`` condition has no equi
    component, so Catalyst plans a BroadcastNestedLoopJoin — O(n²)
    predicate evaluations for an O(n·k) output, and any expression that
    references both sides (e.g. a dot product in a downstream filter
    that Catalyst pulls into the join) is evaluated n²/2 times.  The
    rewrite explodes the bounded offset on the LEFT side —
    ``d ∈ [min_offset, max_offset]``, join on ``b.id == a.id + d`` —
    ONE hash join (broadcast or shuffle, Catalyst's choice) that
    produces exactly the k·n real pairs and evaluates downstream
    expressions only on those.

    At 100 TB: the left side widens by the constant factor k (narrow
    generate, no shuffle by itself), the join is a plain equi hash join
    on a near-unique key, and nothing is quadratic.  Returns the joined
    DataFrame with both sides accessible via ``left_alias``/
    ``right_alias``; the ``_d`` offset column is dropped.
    """
    if min_offset > max_offset:
        raise ValueError(
            f"offset_pairs: min_offset ({min_offset}) > max_offset ({max_offset})"
        )
    if "_d" in left.columns:
        # the final drop("_d") would silently take the caller's column too
        raise ValueError(
            "offset_pairs: left frame already has a '_d' column — rename it"
        )
    a = left.withColumn(
        "_d", F.explode(F.sequence(F.lit(min_offset), F.lit(max_offset)))
    ).alias(left_alias)
    b = right.alias(right_alias)
    out = a.join(
        b,
        F.col(f"{right_alias}.{id_col}")
        == F.col(f"{left_alias}.{id_col}") + F.col("_d"),
    )
    return out.drop("_d")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str | tuple[str, str]],
    lstart: str,
    lend: str,
    rstart: str,
    rend: str,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join: pairs whose CLOSED intervals intersect
    (``l.start <= r.end AND r.start <= l.end``), bounded by equi ``keys``
    (each a shared column name, or a ``(left_name, right_name)`` pair for
    self-joins where the sides must stay disambiguated).

    The equi keys make this a hash join: Catalyst extracts them into the
    join key and evaluates the overlap predicate as a post-join filter,
    so each row only meets the rows of its key group — the shape that
    survives 100 TB when keys (user, tenant, day, …) bound group sizes.
    For the keyless case, bin ONE side's interval over fixed-width time
    buckets exactly like :func:`binned_range_join` and pass the bucket id
    as the key; overlap re-check discards edge false positives.
    """
    if not keys:
        # None & Column would silently build a NULL join condition (empty
        # result, no error) — the unkeyed case must go through binning.
        raise ValueError(
            "interval_overlap_join requires at least one equi key; for the "
            "keyless case, bin one side's interval over fixed-width buckets "
            "(see binned_range_join) and pass the bucket id as the key"
        )
    cond = None
    for k in keys:
        lk, rk = (k, k) if isinstance(k, str) else k
        c = left[lk] == right[rk]
        cond = c if cond is None else cond & c
    cond = cond & (left[lstart] <= right[rend]) & (right[rstart] <= left[lend])
    return left.join(right, cond, how)
