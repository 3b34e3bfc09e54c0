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
    """OFFSET-style page as a row_number window (reference parity)."""
    w = Window.orderBy(*_order(order_by))
    return (
        df.withColumn("rn", F.row_number().over(w))
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
