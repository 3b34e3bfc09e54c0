"""Watermarked windowed aggregation over the activity stream.

The streaming twin of ``sync_daily_counts``: tumbling windows with a
watermark so late activities (the reference re-fetches a 24h lookback
precisely because Strava delivers late data) are folded in up to the
lateness bound, and state is evicted beyond it — bounded state at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_type_counts(
    stream: DataFrame,
    window_minutes: int = 10,
    late_minutes: int = 60,
) -> DataFrame:
    """Per-(window, event_type) counts/sums with late-data tolerance."""
    return (
        stream.withWatermark("ts", f"{late_minutes} minutes")
        .groupBy(
            F.window("ts", f"{window_minutes} minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
