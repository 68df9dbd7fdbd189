"""Compare two bench.py JSON outputs (e.g. BENCH_r1.json vs BENCH_r2.json):
per-query deltas sorted by regression, plus totals.

Uniform host-noise separation (r10 verdict item 7): the per-query ratios
new/old are first normalized by their MEDIAN across all shared queries —
a co-tenancy blip inflates (nearly) every query by one common factor,
which the median captures, while a real plan regression moves a few
queries far beyond it.  Both the raw and the noise-adjusted delta print;
regression flags fire on the ADJUSTED delta.

Usage:  python tools/bench_compare.py OLD.json NEW.json [threshold_pct]
Exit code 1 if any query regressed more than threshold_pct (default 50)
AND more than 0.5 s absolute AFTER normalization — the guard future
rounds run before shipping a planner-relevant change.

Blind spot guard (r11 advice): median normalization absorbs a UNIFORM
real slowdown (e.g. a regression in a shared primitive like iterate()
that every graph query routes through) into host_factor.  Two
backstops: (a) a host_factor outside [1/HOST_FACTOR_BOUND,
HOST_FACTOR_BOUND] prints a loud warning telling the operator to
decide co-tenancy vs shared-primitive regression by rerunning on a
quiet host; (b) a RAW-delta gate at 3× the adjusted threshold (and
2 s absolute) fires regardless of normalization — a genuine uniform
3×-threshold slowdown cannot hide behind the median.
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

#: host_factor outside [1/bound, bound] is suspicious even on a busy
#: host — warn that a uniform shared-primitive regression would look
#: exactly like this (the median cannot tell them apart; a quiet-host
#: rerun can)
HOST_FACTOR_BOUND = 1.6
#: raw (unadjusted) gate multipliers — see module docstring
RAW_GATE_FACTOR = 3.0
RAW_GATE_ABS_S = 2.0
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

    # the uniform host factor: median new/old ratio over shared queries
    shared_ratios = sorted(
        nq[n] / oq[n] for n in set(oq) & set(nq) if oq[n] and nq[n]
    )
    host_factor = shared_ratios[len(shared_ratios) // 2] if shared_ratios else 1.0

    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((0.0, name, a, b, None, "added" if a is None else "removed"))
            continue
        b_adj = b / host_factor
        pct = (b - a) / a * 100 if a else 0.0
        adj_pct = (b_adj - a) / a * 100 if a else 0.0
        rows.append((adj_pct, name, a, b, b_adj, f"{pct:+.0f}% (adj {adj_pct:+.0f}%)"))

    regressions = 0
    # primaries_sec is only comparable inside one gated-window basis
    # (r15, r14 ADVICE): the fingerprint is a hash of the sorted q_*
    # names, so any window change (renames, promotions) flips it
    ob, nb = old.get("primaries_basis"), new.get("primaries_basis")
    if ob and nb and ob != nb:
        print(
            f"  !! primaries_basis {ob} -> {nb}: the gated q_* window "
            "CHANGED between these files — primaries_sec values are NOT "
            "comparable (per-query deltas below remain valid)"
        )
    elif (ob or nb) and not (ob and nb):
        print(
            "  !! one file predates the primaries_basis marker (r15) — "
            "treat primaries_sec comparison as unverified"
        )
    print(f"total: {old['value']}s -> {new['value']}s "
          f"({len(oq)} -> {len(nq)} queries); "
          f"uniform host factor {host_factor:.3f}"
          + (" — co-tenancy noise dominates, adjusted deltas are the signal"
             if abs(host_factor - 1.0) > 0.15 else ""))
    if host_factor > HOST_FACTOR_BOUND or host_factor < 1.0 / HOST_FACTOR_BOUND:
        print(
            f"  !! host_factor {host_factor:.3f} outside "
            f"[{1/HOST_FACTOR_BOUND:.2f}, {HOST_FACTOR_BOUND}] — EITHER heavy "
            "co-tenancy OR a uniform regression in a shared primitive "
            "(iterate(), bench harness, Spark conf); the median cannot tell "
            "them apart — rerun on a quiet host before trusting exit 0"
        )
    for adj_pct, name, a, b, b_adj, label in sorted(rows, reverse=True):
        flag = ""
        if a is not None and b_adj is not None:
            adjusted_hit = adj_pct > threshold_pct and (b_adj - a) > 0.5
            # raw backstop: fires on the UN-normalized delta so a uniform
            # slowdown absorbed into host_factor still gates
            pct = (b - a) / a * 100 if a else 0.0
            raw_hit = (
                pct > threshold_pct * RAW_GATE_FACTOR and (b - a) > RAW_GATE_ABS_S
            )
            if adjusted_hit or raw_hit:
                # the pre-drain basis change explains ADJUSTED drift in the
                # cache-bearing family, but never a >=3x-threshold RAW
                # blowup — the raw gate fires regardless (r12 advice)
                if old_pre_drain and name in CACHE_BEARING and not raw_hit:
                    flag = "  (basis change r7: pre-drain old number — see BASELINE.md)"
                else:
                    basis = " despite basis change" if (
                        old_pre_drain and name in CACHE_BEARING
                    ) else ""
                    flag = "  <-- REGRESSION" + (
                        "" if adjusted_hit else f" (raw gate{basis})"
                    )
                    regressions += 1
        print(f"  {name}: {a} -> {b}  {label}{flag}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
