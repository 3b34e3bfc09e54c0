"""Time registry queries, one FRESH Spark session (subprocess) per
query — the rehearsal-harness lesson of the r10 degree-skew probe:
back-to-back big-graph queries in ONE 8g JVM accumulate block-manager
state (localCheckpoint blocks and DISK_ONLY persists are caller-owned
and only reclaimed by the ContextCleaner after GC), and at mult=100
the third such query dies of UNABLE_TO_ACQUIRE_MEMORY even though
every query passes standalone. Fresh-process timing also matches the
bench floors' methodology, so numbers are comparable.

Usage (module):   from time_isolated import time_queries_isolated
Usage (CLI):      python tools/time_isolated.py q1,q2 /path/corpus [repeats]
prints one line:  RESULT {"q1": sec, ...}  (per-query lines as they land)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_single(name: str, corpus: str, repeats: int) -> float | dict:
    """One query, one subprocess, min-of-warm like scale_rehearsal's
    time_queries; returns seconds or an {'error': ...} dict."""
    code = (
        "import json,sys,time\n"
        f"sys.path.insert(0, {_REPO!r})\n"
        "from strava_data_pipeline_spark.plans import registry\n"
        "from strava_data_pipeline_spark.session import get_spark\n"
        "spark = get_spark('time-isolated')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "q = registry.all_queries()[%r]\n"
        "best = None\n"
        "for _ in range(%d):\n"
        "    t0 = time.time()\n"
        "    q(spark, %r).write.format('noop').mode('overwrite').save()\n"
        "    dt = time.time() - t0\n"
        "    best = dt if best is None else min(best, dt)\n"
        "    spark.catalog.clearCache()\n"
        "print('SINGLE ' + json.dumps(round(best, 3)))\n" % (name, repeats, corpus)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=_REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SINGLE "):
            return json.loads(line[len("SINGLE "):])
    return {
        "error": "subprocess-failed",
        "msg": (proc.stderr or proc.stdout)[-300:],
    }


def time_queries_isolated(
    names: list[str], corpus: str, repeats: int = 2
) -> dict:
    out: dict = {}
    for n in names:
        out[n] = _run_single(n, corpus, repeats)
        print(json.dumps({n: out[n]}), flush=True)
    return out


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    corpus = sys.argv[2]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    out = time_queries_isolated(names, corpus, repeats)
    print("RESULT " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
