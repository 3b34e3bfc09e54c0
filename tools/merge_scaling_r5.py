"""One-shot: fold the r5 rehearsal reports (SCALING_M10_R5.json,
SCALING_M100_R5.json) into SCALING.json as a `mult100` block plus
refreshed mult-10 numbers for the three re-measured queries.

Kept as a script (not inline edits) so the merge is reproducible from
the raw reports the rehearsal tool wrote.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(REPO, "SCALING.json")) as f:
        scaling = json.load(f)
    with open(os.path.join(REPO, "SCALING_M10_R5.json")) as f:
        m10 = json.load(f)
    with open(os.path.join(REPO, "SCALING_M100_R5.json")) as f:
        m100 = json.load(f)

    scaling["_comment"] = (
        "Scaling rehearsal record. mult=10 block: measured r4 over the 8 "
        "pair-tier + analytics-tier queries (corpus = 10x sf0.1 by "
        "mutated replication, min-of-2 warm runs, exponent = "
        "log(t_big/t_base)/log(mult); 1.0 linear, 2.0 the forbidden "
        "quadratic). r5 re-measured the three worst r4 exponents with "
        "the r5 engine (asymmetric PPJoin prefix + auto gram order) and "
        "a COLLISION-FREE dialect builder (the r4 builder's 5-cycle "
        "vowel rotation gave every doc an exact twin at mult=10 and "
        "would give 19 at mult=100, poisoning the exponent with corpus "
        "structure; r5 composes alphabet x vowel rotations = 130 "
        "distinct bijections) — see pair_tier_r5 — and then extended "
        "the rehearsal a full decade to mult=100 (sf0.1 -> ~sf10, "
        "500k docs / 60M lineitem / 10M events) — see mult100. "
        "local[32], driver heap 48g for the mult100 runs (local mode "
        "folds all executor memory into one JVM; a cluster's aggregate "
        "memory scales with the data)."
    )
    scaling["round"] = 5
    scaling["pair_tier_r5"] = {
        "mult": m10["mult"],
        "scaled_rows": m10["scaled_rows"],
        "queries": m10["queries"],
        "worst_exponent": m10["worst_exponent"],
    }
    scaling["mult100"] = {
        "mult": m100["mult"],
        "scaled_rows": m100["scaled_rows"],
        "queries": m100["queries"],
        "worst_exponent": m100["worst_exponent"],
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(scaling, f, indent=1)
        f.write("\n")
    print("merged: worst mult10-r5 exponent",
          m10["worst_exponent"], "| worst mult100 exponent",
          m100["worst_exponent"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
