"""Dump .explain('formatted') for registry queries to files — the
plan-evidence artifacts of the optimization rounds (plans/r11/).

Usage: python tools/dump_plans.py <outdir> <suffix> <q1,q2,...> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)

    from strava_data_pipeline_spark.plans import registry
    from strava_data_pipeline_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas")
            if p in plan
        ]
        print(f"{name}: exchanges={n_ex} joins={joins} python={py} -> {path}")


if __name__ == "__main__":
    main()
