"""Measure per-query variance bands for the bench regression gate.

The 1.5× gate (tools/bench_compare.py) false-flags sub-second queries:
their wall-time is dominated by scheduler/codegen-position jitter, and
one contended driver run can read 1.6× an uncontended floor with no
plan change (seven such queries in r4 — VERDICT r4 task 7). The fix is
to RECORD the observed variance: run the headline bench N times under
the driver's own protocol (fresh process per run, so every run pays the
same cold-compile distribution), and store per-query [lo, hi] bands in
BASELINE_BENCH.json. bench_compare then only flags a query that is BOTH
past ratio×floor AND above its recorded band — i.e., slower than this
machine has ever legitimately measured it.

Usage:
    python tools/bench_bands.py [--runs 3] [--baseline BASELINE_BENCH.json]
        [--write]

Without --write, prints the merged result to stdout only.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench_once(env: dict) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--baseline", default=os.path.join(REPO, "BASELINE_BENCH.json")
    )
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    env = dict(os.environ)
    runs: list[dict[str, float]] = []
    for i in range(args.runs):
        q = run_bench_once(env)
        runs.append(q)
        print(
            f"run {i + 1}/{args.runs}: total {sum(q.values()):.1f}s",
            file=sys.stderr,
        )

    names = sorted(set().union(*[set(r) for r in runs]))
    bands = {
        n: [
            round(min(r[n] for r in runs if n in r), 3),
            round(max(r[n] for r in runs if n in r), 3),
        ]
        for n in names
    }

    with open(args.baseline) as f:
        base = json.load(f)
    # the accepted floor only ever moves DOWN (a better measurement);
    # bands WIDEN monotonically — the high of 3 fresh samples
    # underestimates the true legitimate spread (the r6 gate flagged
    # ann_pq at 0.88s minutes after a 3-run band recorded [0.62, 0.73];
    # both were legitimate uncontended runs of identical code). The
    # band's contract is "slower than this machine has EVER
    # legitimately measured it", so every recorded run extends it.
    old_bands = base.get("bands", {})
    for n in names:
        lo = bands[n][0]
        if n not in base["queries"] or lo < base["queries"][n]:
            base["queries"][n] = lo
        if n in old_bands:
            bands[n] = [
                min(bands[n][0], old_bands[n][0]),
                max(bands[n][1], old_bands[n][1]),
            ]
    base["bands"] = {**old_bands, **bands}
    base["band_runs"] = base.get("band_runs", 0) + args.runs
    base["total_sec"] = round(sum(base["queries"].values()), 3)

    text = json.dumps(base, indent=1)
    if args.write:
        with open(args.baseline, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.baseline}", file=sys.stderr)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
