"""Temporal join operators: as-of join and interval (range) join.

The reference's query surface is point/list lookups over time-stamped
activities (/root/reference/internal/db/activities.go:187,202); these
are the two temporal-join generalizations a time-series analytics
engine needs beyond it.

Scale notes:
- ``asof_join`` is the union+window formulation: ONE shuffle on the
  join keys, no range cross-product, no per-key driver loop. This is
  the only as-of formulation that survives 100 TB facts — a
  range-condition join would rewrite to broadcast-nested-loop or an
  exploded equi-join, both quadratic in the worst case.
- ``interval_join`` broadcasts the window side; it is meant for
  dimension-sized window tables (calendars, maintenance windows,
  promo periods). A fact×fact interval join should go through
  bucketized overlap keys instead (not needed by this surface).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SRC = "__asof_src"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "valid_from",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Backward (inclusive) as-of join: each left row gets the payload
    of the latest right row with ``right_ts <= left_ts`` per key.

    Requires (on, right_ts) unique on the right side. Implemented by
    interleaving both sides on the time axis and carrying the last
    seen payload forward with an ignore-nulls window — the sort is
    per-key within one hash shuffle, never global.
    """
    on = list(on)
    payload = list(payload)
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SRC),
        *[F.col(c) for c in payload],
    )
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SRC, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps → inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SRC).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return u.where(F.col(_SRC) == 1).drop(_SRC, _TS)


def interval_join(
    facts: DataFrame,
    windows: DataFrame,
    ts_col: str = "ts",
    start_col: str = "win_start",
    end_col: str = "win_end",
) -> DataFrame:
    """Facts × windows where ``start <= ts < end`` (windows may
    overlap; a fact can land in several). The window side is
    broadcast — it must be dimension-sized."""
    return facts.join(
        F.broadcast(windows),
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)),
    )
