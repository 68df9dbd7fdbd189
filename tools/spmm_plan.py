"""Dump the formatted plan of one factorize SpMM step (the per-power-round
job the localCheckpoint otherwise hides from plans/): build
``_spmm(rows, state, kp)`` on a tiny synthetic (w, c, v) frame and print
``.explain("formatted")``.

Usage: python tools/spmm_plan.py > plans/r15/spmm_step_<suffix>.txt
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_merge_purge_spark.operators.factorize import _spmm
    from kafka_merge_purge_spark.plans.introspect import formatted_plan
    from kafka_merge_purge_spark.session import get_spark

    spark = get_spark("spmm-plan", cpus=4, shuffle_partitions=4)
    kp = 6
    rows = spark.range(100).select(
        (F.col("id") % 10).alias("_w"),
        (F.col("id") % 7).alias("_c"),
        (F.col("id") + 1).cast("double").alias("_v"),
    )
    state = spark.range(7).select(
        F.col("id"),
        F.array(*[(F.col("id") * kp + j).cast("double") for j in range(kp)]).alias(
            "vec"
        ),
    )
    out = _spmm(rows, state, kp, transpose=False)
    print("== factorize._spmm step plan (kp=6, transpose=False) ==")
    print(formatted_plan(out).strip())


if __name__ == "__main__":
    main()
