"""Hash-stable aggregation helpers.

Floating-point SUM/AVG over a shuffled dataset is order-dependent: Spark's
partial+final aggregation and DuckDB's parallel aggregation sum in
different orders, so two correct engines can disagree in the last ulp —
enough to break an exact value-hash comparison.

Fix: route sums through DECIMAL.  Casting each double to DECIMAL(18,4) is
deterministic (a binary double's shortest round decimal at 4 places is
essentially never a tie), and decimal addition is exact and associative,
so the sum is bit-identical regardless of partitioning or engine.  Cast
the final result back to double for a stable, engine-neutral schema.

Use these for every aggregate that feeds the DuckDB oracle gate; plain
``F.sum`` is fine for queries whose results aren't hash-compared.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale used for the stable decimal route; 4 fractional digits covers the
#: synthetic data's prices/quantities/discounts.
DECIMAL_TYPE = "decimal(18,4)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM of a double column via exact decimal addition.

    DuckDB twin:  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_TYPE)).cast("double")
    return out.alias(alias) if alias else out


#: fine-scale variant for small-magnitude data (unit-norm embedding
#: components are ~1e-2, their squares ~1e-4 — DECIMAL(18,4) quantizes
#: those to zero).  28 digits / 12 fractional keeps exactness (Spark sums
#: decimal(28,12) into decimal(38,12), no overflow below ~1e26 rows) while
#: preserving ~1e-12 resolution.
DECIMAL_FINE_TYPE = "decimal(28,12)"


def dsum_fine(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM at DECIMAL(28,12) — for moment sums over
    small-magnitude values (embedding components, probabilities) where
    the 1e-4 grid of :func:`dsum` destroys the signal.

    DuckDB twin:  CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_FINE_TYPE)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum ÷ count, rounded to 6.

    DuckDB twin: ROUND(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
                       / COUNT(x), 6)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast(DECIMAL_TYPE)).cast("double") / F.count(c), 6)
    return out.alias(alias) if alias else out


def dround(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(c, scale)
    return out.alias(alias) if alias else out
