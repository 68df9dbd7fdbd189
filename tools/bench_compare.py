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


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold_pct = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    old = json.loads(open(old_path).read())
    new = json.loads(open(new_path).read())
    oq, nq = old["queries"], new["queries"]

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
            flag = "  <-- REGRESSION"
            regressions += 1
        print(f"  {name}: {a} -> {b}  {label}{flag}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
