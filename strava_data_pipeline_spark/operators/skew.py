"""Skew mitigation: salted joins for deterministic hot keys.

First line of defense is AQE (``spark.sql.adaptive.skewJoin`` is on in
session.py): it splits oversized shuffle partitions at runtime.
Salting is the manual fallback for the case AQE can't fix — a single
join key so hot that even a split partition re-concentrates on one
reducer in a later stage, or a build side that must stay sort-merge.

``salted_join`` spreads each hot left key over ``n_salts`` shuffle
partitions by appending a deterministic salt derived from the whole
left row, and replicates the right side ``n_salts``× (explode of a
literal range — cheap when the right side is the smaller of two
big-table sides). Result is row-identical to the unsalted join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` (big, skewed on ``on``) to ``right`` (big), with
    the left side salted into ``n_salts`` sub-keys.

    The salt is ``hash(all left columns) % n_salts`` — deterministic
    per row, so retried tasks salt identically, while rows sharing a
    hot key scatter across salts. The right side is exploded to every
    salt value; its shuffle volume grows ``n_salts``×, which is the
    price of flattening the hot key (choose the smaller big side as
    ``right``; a dimension-sized right should be broadcast instead —
    no salting needed).
    """
    on = list(on)
    l = left.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    r = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return l.join(r, on + [_SALT], how).drop(_SALT)
