"""In-flight data-quality monitors via ``DataFrame.observe``.

Production ingest needs row/null/range counters on every batch WITHOUT
a second pass: ``observe`` attaches accumulator-style metrics to the
exact plan that already runs, so the counters are free at 100 TB —
unlike a monitoring query, which would re-scan.

Reference parity: the reference logs per-sync activity counts in its
ticker loop (/root/reference/internal/strava/strava.go:261 and the
handler's sync response); this generalizes that to declarative metric
bundles on any frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_ingest(
    df: DataFrame,
    *,
    not_null: Sequence[str] = (),
    non_negative: Sequence[str] = (),
    name: str = "ingest",
) -> tuple[DataFrame, Observation]:
    """Attach an ingest-quality metric bundle to ``df``'s plan.

    Returns the same frame plus an :class:`Observation` whose ``get``
    yields, after ANY action on the frame: ``n_rows``, one
    ``null_<col>`` counter per ``not_null`` column, and one
    ``neg_<col>`` counter per ``non_negative`` column. Callers gate the
    batch (abort/quarantine) on the counters — the check costs zero
    extra scans.
    """
    obs = Observation(name)
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
        )
    for c in non_negative:
        metrics.append(
            F.count(F.when(F.col(c) < 0, 1)).alias(f"neg_{c}")
        )
    return df.observe(obs, *metrics), obs
