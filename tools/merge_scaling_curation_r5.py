"""One-shot: fold the r5 curation-tier rehearsal report
(SCALING_CURATION_R5.json — the nine queries added in r5, mult=10) into
SCALING.json as a `curation_tier_r5` block. Kept as a script so the
merge is reproducible from the raw report (same pattern as
merge_scaling_r5.py)."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(REPO, "SCALING.json")) as f:
        scaling = json.load(f)
    with open(os.path.join(REPO, "SCALING_CURATION_R5.json")) as f:
        cur = json.load(f)

    # idempotent: re-running the merge must not duplicate the sentence
    if "curation_tier_r5:" not in scaling["_comment"]:
        scaling["_comment"] += (
            " curation_tier_r5: the nine queries added in r5 (curation pack"
            " + snapshot_diff + embedding_power_iteration), mult=10,"
            " min-of-2 warm runs with the same collision-free dialect"
            " builder; worst exponent 0.708 (copurchase_triangles — the"
            " scaled graph is 10 disjoint copies, so triangle volume grows"
            " linearly and the measured sublinearity is fixed-cost"
            " amortization plus per-copy parallelism)."
        )
    scaling["curation_tier_r5"] = {
        "mult": cur["mult"],
        "scaled_rows": cur["scaled_rows"],
        "queries": cur["queries"],
        "worst_exponent": cur["worst_exponent"],
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(scaling, f, indent=1)
        f.write("\n")
    print("merged: worst curation-tier exponent", cur["worst_exponent"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
