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

    Requires (on, right_ts) unique on the right side, and the payload
    column names absent from the left frame (validated — a collision
    would silently carry the LEFT side's own values forward and never
    join the right payload at all). Implemented by interleaving both
    sides on the time axis and carrying the last seen payload forward
    with an ignore-nulls window — the sort is per-key within one hash
    shuffle, never global.

    The carry-forward travels as ONE struct of all payload columns,
    not per-column ``last(ignorenulls)``: per-column carries would
    stitch values from DIFFERENT right rows whenever the latest row
    holds a NULL in one payload column (its null falls through to an
    older row's value while its non-null columns win) — a combination
    that never existed on the right side. The struct is only null for
    left rows, so ``last(struct, ignorenulls)`` lands atomically on
    the latest right ROW, nulls and all.
    """
    on = list(on)
    payload = list(payload)
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join payload columns {sorted(clash)} already exist on the "
            "left side; rename them on one side — the carry-forward would "
            "otherwise return left values instead of joining the right payload"
        )
    _PL = "__asof_payload"
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SRC),
        F.struct(*[F.col(c) for c in payload]).alias(_PL),
    )
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SRC, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps → inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SRC).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(_PL, F.last(F.col(_PL), ignorenulls=True).over(w))
    u = u.select(
        "*", *[F.col(f"{_PL}.{c}").alias(c) for c in payload]
    ).drop(_PL)
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


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: Sequence[str] = (),
    bin_seconds: int = 86_400,
) -> DataFrame:
    """Interval-overlap join (closed intervals: ``l_start <= r_end AND
    r_start <= l_end``) for two LARGE interval sets — the fact×fact case
    ``interval_join``'s broadcast formulation cannot handle.

    Both sides explode into the fixed time bins their interval spans,
    equi-join on (keys, bin) — a hash-partitioned shuffle, never a
    range/nested-loop join — then verify the true overlap predicate.
    A pair sharing several bins is kept only in the FIRST shared bin
    (``bin == max(floor(l_start/b), floor(r_start/b))``): exact-once
    output by arithmetic, no distinct shuffle. Bin width should be
    chosen ≳ the typical interval length so the explode fan-out stays
    O(1) per row; intervals spanning k bins emit k rows — bounded,
    linear, and skew-free as long as bins are sized to the data.
    """
    keys = list(keys)
    bin_ = F.lit(int(bin_seconds))

    def bins(s: str, e: str) -> F.Column:
        return F.explode(
            F.sequence(
                F.floor(F.col(s).cast("long") / bin_),
                F.floor(F.col(e).cast("long") / bin_),
            )
        )

    lb = left.withColumn("_bin", bins(l_start, l_end))
    rb = right.withColumn("_bin", bins(r_start, r_end))
    joined = lb.join(rb, keys + ["_bin"]).where(
        (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    )
    first_shared = F.greatest(
        F.floor(F.col(l_start).cast("long") / bin_),
        F.floor(F.col(r_start).cast("long") / bin_),
    )
    return joined.where(F.col("_bin") == first_shared).drop("_bin")
