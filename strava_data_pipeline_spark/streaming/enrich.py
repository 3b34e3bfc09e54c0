"""Stream-static enrichment: join the live activity stream to dims.

The reference enriches responses by joining activities to users at
query time (/root/reference/internal/api/api.go:107); streaming-side,
the same join happens per micro-batch against a static (or
slowly-refreshed) dimension. Spark plans a broadcast hash join per
batch when the dim fits the threshold — the stream never shuffles.

At scale: re-read the dim per batch (it is re-resolved lazily each
micro-batch, so a refreshed snapshot dir is picked up automatically);
for a billion-row dim, pre-bucket both sides instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_users(
    stream: DataFrame,
    users: DataFrame,
    user_key: str = "c_custkey",
    name_col: str = "c_name",
) -> DataFrame:
    """Attach user attributes to each streamed activity (left join —
    an activity from an unknown athlete flows through with NULL
    attributes rather than vanishing)."""
    dim = users.select(
        F.col(user_key).alias("user_id"),
        F.col(name_col).alias("user_name"),
    )
    return stream.join(dim, "user_id", "left")
