"""Refresh the tier2 (all-registry, sf0.01) floor set in
BASELINE_BENCH.json.

bench_bands.py owns the HEADLINE floors/bands; this tool owns the
tier2 floors — the only perf guard the non-headline queries have. It
runs `bench.py` with SPARK_GRAFT_BENCH_ALL=1 N times (fresh process
per run, the driver's protocol) and min-merges `tier2_queries` into
the baseline: floors only ever move DOWN, new queries get their first
floor, nothing is dropped.

Usage:
    python tools/refresh_tier2.py [--runs 2] [--write]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(env: dict) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    doc = json.loads(line)
    return doc["tier2_queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--baseline", default=os.path.join(REPO, "BASELINE_BENCH.json")
    )
    ap.add_argument(
        "--from-json",
        nargs="+",
        default=None,
        help="merge tier2_queries from recorded bench outputs instead of re-running",
    )
    ap.add_argument("--allow-inflated", action="store_true")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    if args.from_json:
        runs = []
        for path in args.from_json:
            with open(path) as f:
                doc = json.load(f)
            runs.append(doc["tier2_queries"])
    else:
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_ALL"] = "1"
        runs = []
        for i in range(args.runs):
            t2 = run_once(env)
            runs.append(t2)
            print(
                f"run {i + 1}/{args.runs}: tier2 total {sum(t2.values()):.1f}s"
                f" over {len(t2)} queries",
                file=sys.stderr,
            )

    with open(args.baseline) as f:
        base = json.load(f)
    floors = base.setdefault("tier2_queries", {})
    names = sorted(set().union(*[set(r) for r in runs]))
    added, improved = [], []
    for n in names:
        lo = round(min(r[n] for r in runs if n in r), 3)
        if n not in floors:
            floors[n] = lo
            added.append(n)
        elif lo < floors[n]:
            floors[n] = lo
            improved.append(n)
    base["tier2_total"] = round(sum(floors.values()), 3)
    base["tier2_queries"] = dict(sorted(floors.items()))
    # record the observed [lo, hi] spread too — bench.py's gate uses
    # tier2_bands to excuse run-to-run variance, exactly like the
    # headline bands from bench_bands.py. Band lows merge down freely;
    # HIGHS carry the same r7 inflation guard as bench_bands.merge_bands
    # (a high past ratio*floor and the 1s cutoff would excuse a
    # gate-able regression — skipped unless --allow-inflated).
    old_bands = base.get("tier2_bands", {})
    capped = []
    new_bands = dict(old_bands)
    for n in names:
        lo = round(min(r[n] for r in runs if n in r), 3)
        hi = round(max(r[n] for r in runs if n in r), 3)
        if n not in old_bands:
            # first sighting: fresh [lo, hi] is the only healthy
            # baseline — same new-band seeding as bench_bands.py
            new_bands[n] = [lo, hi]
            continue
        band = list(old_bands[n])
        band[0] = min(band[0], lo)
        gateable = hi > 1.5 * floors[n] and hi >= 1.0
        if hi > band[1]:
            if gateable and not args.allow_inflated:
                capped.append(n)
            else:
                band[1] = hi
        new_bands[n] = [round(band[0], 3), round(band[1], 3)]
    if capped:
        print(
            f"WARNING: inflated tier2 band highs NOT merged: {capped}",
            file=sys.stderr,
        )
    base["tier2_bands"] = new_bands
    base["tier2_band_runs"] = base.get("tier2_band_runs", 0) + len(runs)

    # tier2 sub-cutoff SUM band — bench.py gates the sum of tier2
    # queries whose floor is sub-1.0s against tier2_sub_cutoff_band,
    # but nothing wrote that key before r8 (ADVICE r7): the gate ran
    # bandless and a contended ~130-query sub-second sum past 1.5x
    # failed with no recorded-spread excusal. Maintain it here with
    # the same frozen-membership + inflation-guard discipline as
    # bench_bands.merge_bands.
    sub_names = sorted(n for n, f in floors.items() if f < 1.0)
    sub_sums = [
        sum(r[n] for n in sub_names if n in r)
        for r in runs
        if any(n in r for n in sub_names)
    ]
    if sub_sums:
        floor_sum = sum(floors[n] for n in sub_names)
        old = base.get("tier2_sub_cutoff_band") or [
            min(sub_sums),
            min(sub_sums),
        ]
        if base.get("tier2_sub_cutoff_members") != sub_names:
            old = [min(sub_sums), min(sub_sums)]
        hi = max(sub_sums)
        if (
            hi > old[1]
            and hi > 1.5 * floor_sum
            and hi - floor_sum >= 1.0
            and not args.allow_inflated
        ):
            print(
                "WARNING: inflated tier2 sub-cutoff sum high NOT merged",
                file=sys.stderr,
            )
            hi = old[1]
        base["tier2_sub_cutoff_band"] = [
            round(min(old[0], *sub_sums), 3),
            round(max(old[1], hi), 3),
        ]
        base["tier2_sub_cutoff_members"] = sub_names

    if args.write:
        with open(args.baseline, "w") as f:
            json.dump(base, f, indent=1)
            f.write("\n")
        print(
            f"wrote {args.baseline}: +{len(added)} new, "
            f"{len(improved)} improved, total {base['tier2_total']}s",
            file=sys.stderr,
        )
    else:
        print(json.dumps({"added": added, "improved": improved}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
