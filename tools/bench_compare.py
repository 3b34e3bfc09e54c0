"""Compare two bench JSON outputs per query.

Usage:
    python tools/bench_compare.py BASELINE_BENCH.json BENCH_rN.json [ratio]

Accepts either the raw one-line bench output or the driver's wrapper
(with a "parsed" key) or BASELINE_BENCH.json (with "queries" at top
level). Flags queries slower than `ratio`× the baseline (default 1.5)
and prints totals. Exit code 1 if any query regresses past the ratio.
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    if "parsed" in d and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    raise SystemExit(f"{path}: no 'queries' key found")


def compare(
    base: dict[str, float],
    cur: dict[str, float],
    ratio: float = 1.5,
    min_abs_sec: float = 0.0,
) -> list[str]:
    """Names of queries slower than ``ratio``× their baseline.
    ``min_abs_sec`` ignores sub-threshold absolute times — a 0.1s query
    jittering to 0.2s is scheduler noise, not a plan regression."""
    return [
        n
        for n, c in cur.items()
        if n in base and c > ratio * base[n] and c >= min_abs_sec
    ]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base = _queries(sys.argv[1])
    cur = _queries(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    regressed = set(compare(base, cur, ratio))
    for name in sorted(cur):
        b = base.get(name)
        c = cur[name]
        if b is None:
            print(f"  new     {name:32s} {c:8.2f}s")
        else:
            mark = f"  REGRESSED >{ratio}x" if name in regressed else ""
            print(f"  {c / b:5.2f}x  {name:32s} {c:8.2f}s  (base {b:.2f}s){mark}")
    common = [n for n in cur if n in base]
    print(
        f"common totals: {sum(cur[n] for n in common):.1f}s now "
        f"vs {sum(base[n] for n in common):.1f}s baseline "
        f"({len(common)} queries; {len(cur) - len(common)} new)"
    )
    if regressed:
        print(f"regressions: {sorted(regressed)}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
