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


def session_window_stats(
    stream: DataFrame,
    gap_minutes: int = 30,
    late_minutes: int = 60,
) -> DataFrame:
    """Per-(user, session) rollup with NATIVE session windows — the
    engine-managed twin of streaming/stateful.py's
    ``applyInPandasWithState`` sessionizer and of the batch
    ``operators/sessionize.py``. ``F.session_window`` merges events
    into dynamic gap-bounded windows inside the streaming state store:
    no Python state function, state evicted once the watermark passes a
    closed session's end, output rows appended exactly once per closed
    session. Prefer this when the session semantics ARE the gap rule;
    the custom stateful path stays for logic session_window can't
    express (per-event sequencing, custom timeouts)."""
    return (
        stream.withWatermark("ts", f"{late_minutes} minutes")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
