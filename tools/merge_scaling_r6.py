"""Merge the r6 mult=100 rehearsal reports into SCALING.json.

Idempotent (VERDICT r5 ADVICE on the r5 merge script): re-running
overwrites the same `mult100_r6` block and only appends the comment
sentence once.

Inputs (repo root): SCALING_M100_R6_jac.json (dedup_ngram_jaccard with
the corpus-adaptive gram order + the broadcast gate) and
SCALING_M100_R6_cur.json (the five most expensive curation/mining-tier
queries, r5 VERDICT task 6).
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

R6_NOTE = (
    " mult100_r6: r6 extends the mult=100 decade to the curation tier "
    "(worst copurchase_triangles ~1.02, linear within measurement "
    "noise on a shared box) and re-measures dedup_ngram_jaccard after "
    "the corpus-adaptive gram order (auto_gram_order: smallest n>=3 "
    "with 26^n >= 3*n_docs — the pinned-3-gram space saturated at "
    "500k docs and forced exponent ~1.05 by construction) plus the "
    "corpus-size-gated join hints (an 8g driver OOMed on a 2 GB AQE "
    "broadcast build of the exploded prefix index before the gate)."
)


def main() -> int:
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        scaling = json.load(f)

    block: dict = {}
    for name, fname in (
        ("jaccard_adaptive_gram", "SCALING_M100_R6_jac.json"),
        ("curation_tier", "SCALING_M100_R6_cur.json"),
    ):
        p = os.path.join(REPO, fname)
        if os.path.exists(p):
            with open(p) as f:
                block[name] = json.load(f)

    scaling["mult100_r6"] = block
    if "mult100_r6:" not in scaling["_comment"]:
        scaling["_comment"] += R6_NOTE

    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)
        f.write("\n")
    worst = max(
        (q["exponent"] for b in block.values() for q in b["queries"].values()),
        default=None,
    )
    print(f"merged {list(block)} worst_exponent={worst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
