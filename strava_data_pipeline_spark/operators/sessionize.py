"""Gap-based sessionization over an event stream.

Not in the reference's SQL surface, but the canonical downstream query
over the activity/event stream it ingests. Pure window functions: one
shuffle on the user key, everything else stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a session breaks when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    Session id = running count of session breaks per user (lag + windowed
    sum) — a single hash-partition by user, no self-join.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_s = gap_minutes * 60
    with_break = df.withColumn(
        "_new_session",
        F.when(
            F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
            > gap_s,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    return with_break.withColumn(
        "session_seq", F.sum("_new_session").over(w).cast("bigint")
    ).drop("_new_session")


def session_stats(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: event count, span, total value."""
    s = sessionize(df, gap_minutes=gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
