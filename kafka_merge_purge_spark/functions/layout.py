"""Storage-layout optimization: Z-order (Morton) clustering keys.

At 100 TB, the cheapest query is the one whose files never open: parquet
keeps per-row-group min/max statistics, and Spark prunes row groups whose
stats exclude the filter.  Sorting by ONE column makes its stats tight
but leaves every other column's ranges full-width; interleaving the bits
of several columns (Z-ordering) makes ALL participating columns' per-file
ranges narrow simultaneously, so selective filters on any of them skip
most files.

Everything here is expression-level (shifts/masks in codegen) — the key
costs one narrow projection, and the layout write is the standard
repartitionByRange + sortWithinPartitions recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of each column.

    Inputs must be non-negative integers already scaled to [0, 2**bits)
    — use ``F.floor`` binning or rank-bucketing to get there.  With two
    columns and bits=16 the key fits comfortably in a long; d columns
    need d·bits ≤ 63.

    Pure shift/mask expression chain: bit i of column j lands at
    position i·d + j, so consecutive key values alternate through all
    dimensions — the space-filling-curve property that keeps every
    dimension's per-file range tight after a range-partitioned sort.
    """
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"zorder_key: {d} cols x {bits} bits exceeds a long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * d + j)
    return key


def scale_to_bits(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Affine-scale a numeric column from [lo, hi] onto [0, 2**bits) —
    the normalization Z-ordering REQUIRES: interleaving only mixes
    dimensions that occupy the same bit width (a 0..14 column interleaved
    raw against a 0..327 column degenerates to sorting by the wider one,
    because its high bits are always zero).  Use domain bounds or
    quantile bounds; values outside [lo, hi] clamp."""
    top = (1 << bits) - 1
    span = (hi - lo) or 1.0
    scaled = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(span) * top)
    return F.least(F.lit(top), F.greatest(F.lit(0), scaled)).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[Column],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``.

    repartitionByRange on the key gives each output task a disjoint key
    range (global clustering, not just per-task), sortWithinPartitions
    orders rows inside each file so row-group stats are tight too.  The
    sort is the one shuffle a layout rewrite inherently costs; readers
    pay nothing — pruning happens in the parquet reader via the stats
    the layout sharpened.
    """
    key = zorder_key(cols, bits=bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
