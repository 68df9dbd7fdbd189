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
