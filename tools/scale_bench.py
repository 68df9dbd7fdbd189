"""Scale-slope bench: run the most expensive queries at sf0.1 and at the
10x scale-up produced by tools/make_scale_data.py, and report the
wall-clock slope.  A linear-work query on 32 local cores should scale
well under 10x (fixed overheads amortize); anything super-linear (>10x)
is flagged — that's the shape that would break at 100 TB.

Usage: python tools/scale_bench.py [scale_dir] [query ...]
(defaults: .scale_sf1 and the round-1 top-5 list below)
Prints one JSON line; paste/commit into BENCH_SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [  # the top-5 most expensive from the round-1 bench profile
    "q_agg_revenue",
    "q_embedding_neardup",
    "x_corr",
    "x_lsh_ann",
    "x_minhash_pairs",
]


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale_sf1"
    queries = sys.argv[2:] or QUERIES
    base_dir = "/root/testdata/sf0.1"

    import __spark_entry__ as entry_mod
    from kafka_merge_purge_spark.session import get_spark

    spark = get_spark("scale-bench")
    qs = entry_mod.queries()
    spark.read.parquet(f"{base_dir}/lineitem.parquet").count()  # warm JVM

    out: dict[str, dict] = {}
    for name in queries:
        fn = qs[name]
        times = {}
        for label, d in (("sf0.1", base_dir), ("sf1", scale_dir)):
            start = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            times[label] = round(time.perf_counter() - start, 3)
        slope = round(times["sf1"] / times["sf0.1"], 2)
        out[name] = {**times, "slope_at_10x": slope}
        print(f"  {name}: {times['sf0.1']}s -> {times['sf1']}s (x{slope})", file=sys.stderr)

    print(json.dumps({"metric": "scale_slope_10x", "queries": out}))


if __name__ == "__main__":
    main()
