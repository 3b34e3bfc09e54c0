"""Merge the r6 new-pack rehearsal reports into SCALING.json.

Folds the four pack reports (ops/time-series at mult=10, ops/time-
series + traversal + stats at mult=100) into a single `r6_packs`
block. Idempotent: re-running overwrites the same block and appends
the comment sentence only once (the lesson from VERDICT r5's ADVICE
on the r5 merge script).
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOTE = (
    " r6_packs: the 25 queries added by the r6 ops/time-series/"
    "traversal/stats/product/planner packs, rehearsed at mult=10 "
    "(all ten ops+ts queries, worst 0.285) and mult=100 (the "
    "twenty-one data-bound ones, worst 0.535 = view_delta_maintenance; "
    "bfs_distance 0.487 on the 120M-edge graph). Negative exponents "
    "are domain-frame-bound queries whose base-scale fixed cost "
    "dominates both runs."
)

INPUTS = {
    "mult10_ops_ts": "SCALING_OPS_TS_R6.json",
    "mult100_ops_ts": "SCALING_M100_R6_opsts.json",
    "mult100_traversal": "SCALING_M100_R6_trav.json",
    "mult100_stats": "SCALING_M100_R6_stats.json",
    "mult100_product": "SCALING_M100_R6_prod.json",
    "mult100_planner": "SCALING_M100_R6_planner.json",
    "mult100_data_quality": "SCALING_M100_R6_dq.json",
    "mult100_quantiles": "SCALING_M100_R6_gq.json",
}


def main() -> int:
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        scaling = json.load(f)
    block: dict = {}
    for key, fname in INPUTS.items():
        with open(os.path.join(REPO, fname)) as f:
            rep = json.load(f)
        block[key] = {
            "mult": rep["mult"],
            "queries": rep["queries"],
            "worst_exponent": rep["worst_exponent"],
        }
    scaling["r6_packs"] = block
    if "r6_packs:" not in scaling.get("_comment", ""):
        scaling["_comment"] = scaling.get("_comment", "") + NOTE
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)
        f.write("\n")
    print("merged r6_packs into SCALING.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
