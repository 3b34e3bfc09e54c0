"""Streaming deduplication: drop re-delivered activities in flight.

The reference tolerates re-delivery by upserting every row
(/root/reference/internal/db/activities.go:99 — ON CONFLICT DO
UPDATE); the streaming-native complement drops exact re-deliveries
*before* they reach the sink, so the merge only sees genuinely new or
changed rows. ``dropDuplicatesWithinWatermark`` keys state by
event_id and evicts it past the lateness bound — bounded state at any
scale, unlike an unwatermarked distinct whose state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    late_minutes: int = 60,
) -> DataFrame:
    """Keep the first delivery of each key within the watermark bound.

    A duplicate arriving within ``late_minutes`` of the first copy's
    event time is dropped; one arriving later than the watermark has
    already been merged upstream (the batch upsert stays latest-wins,
    so a missed drop degrades to a no-op update, never wrong data).
    """
    keys = keys or ["event_id"]
    return stream.withWatermark("ts", f"{late_minutes} minutes").dropDuplicatesWithinWatermark(
        keys
    )
