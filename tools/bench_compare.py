"""Compare two bench.py JSON outputs (e.g. BENCH_r1.json vs BENCH_r2.json):
per-query deltas sorted by regression, plus totals.

Usage:  python tools/bench_compare.py OLD.json NEW.json [threshold_pct]
Exit code 1 if any query regressed more than threshold_pct (default 50)
AND more than 0.5 s absolute — the guard future rounds run before
shipping a planner-relevant change.
"""

from __future__ import annotations

import json
import sys

#: bench.py has drained operator-persisted caches between timed runs
#: since round 7 (release_all_persisted) — pre-r7 numbers for the
#: cache-bearing family understate the honest cold-per-invocation cost
#: (the min-of-2 second run re-used the first run's persisted frames).
#: Comparing a pre-drain OLD file against a post-drain NEW one must not
#: flag these as plan regressions; see BASELINE.md "Bench-basis update".
BENCH_BASIS_ROUND = 7
CACHE_BEARING = {
    "q_fuzzy_dedup",
    "q_ngram_jaccard",
    "x_minhash_pairs",
    "x_cross_dedup",
    "x_sorted_neighborhood",
    "x_hashed_ann",
    "x_embedding_dedup_ann",
}


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold_pct = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    old = json.loads(open(old_path).read())
    new = json.loads(open(new_path).read())
    oq, nq = old["queries"], new["queries"]
    # pre-drain files carry no bench_basis marker (added in r8)
    old_pre_drain = old.get("bench_basis", 0) < BENCH_BASIS_ROUND

    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((0.0, name, a, b, "added" if a is None else "removed"))
            continue
        pct = (b - a) / a * 100 if a else 0.0
        rows.append((pct, name, a, b, f"{pct:+.0f}%"))

    regressions = 0
    print(f"total: {old['value']}s -> {new['value']}s "
          f"({len(oq)} -> {len(nq)} queries)")
    for pct, name, a, b, label in sorted(rows, reverse=True):
        flag = ""
        if a is not None and b is not None and pct > threshold_pct and (b - a) > 0.5:
            if old_pre_drain and name in CACHE_BEARING:
                flag = "  (basis change r7: pre-drain old number — see BASELINE.md)"
            else:
                flag = "  <-- REGRESSION"
                regressions += 1
        print(f"  {name}: {a} -> {b}  {label}{flag}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
