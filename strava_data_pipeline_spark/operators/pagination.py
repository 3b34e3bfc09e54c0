"""Pagination operators: offset windows and keyset cursors.

The reference pages with LIMIT/OFFSET (/root/reference/internal/api/api.go:206).
OFFSET is fine for shallow pages but at 100 TB a deep offset forces the
engine to materialize and discard every preceding row, so we expose both:

- ``page_offset``  — row_number window over a total order (parity with the
  reference API; documented small-result-only).
- ``page_keyset``  — cursor predicate (``ts < last_seen``) that pushes
  straight into the parquet scan; O(page) at any depth. This is the scale
  path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(order_by: Sequence[tuple[str, bool]]) -> list[Column]:
    return [F.col(c).desc() if desc else F.col(c).asc() for c, desc in order_by]


def page_offset(
    df: DataFrame, order_by: Sequence[tuple[str, bool]], limit: int, offset: int
) -> DataFrame:
    """OFFSET-style page (reference parity), planned scale-safely.

    The naive shape — row_number over a global Window — funnels the
    ENTIRE table through one partition. Instead the global order is
    truncated first to its top ``offset+limit`` rows with
    ``orderBy().limit()``, which plans as TakeOrderedAndProject
    (per-partition heaps of size offset+limit, no global sort, no
    single-partition shuffle of the table); the row_number window then
    ranks only that offset+limit-row frame. Requires ``order_by`` to be
    a TOTAL order (include a unique tiebreak column) so the truncation
    is deterministic. Deep pagination should still use ``page_keyset``
    — per-partition heap size grows with offset here.

    OUTPUT CONTRACT: the global row number is returned as column
    ``rn`` (the activities_page oracle hashes it) — callers that don't
    want it drop it; an input column named ``rn`` is clobbered, so
    rename it first.
    """
    top = df.orderBy(*_order(order_by)).limit(offset + limit)
    w = Window.orderBy(*_order(order_by))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") > offset) & (F.col("rn") <= offset + limit))
    )


def page_keyset(
    df: DataFrame,
    order_by: Sequence[tuple[str, bool]],
    cursor: Column | None,
    limit: int,
) -> DataFrame:
    """Keyset page: filter past the cursor, then top-N.

    The cursor predicate is pushdown-able, and the top-N plans as
    TakeOrderedAndProject — no global sort, no offset scan.
    """
    if cursor is not None:
        df = df.where(cursor)
    return df.orderBy(*_order(order_by)).limit(limit)
