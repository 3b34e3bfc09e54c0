"""Custom stateful streaming: session tracking with applyInPandasWithState.

The stateful-operator pattern for semantics Structured Streaming's
built-ins can't express: per-user session accumulation with an
inactivity timeout. State is one small tuple per user; the timeout
closes and emits the session — bounded memory per key, arbitrary key
cardinality across the cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

# state: (n_events, total_value, start_epoch_us, end_epoch_us)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)


def track_sessions(stream: DataFrame, timeout_minutes: int = 30) -> DataFrame:
    """Emit a row per closed user session (inactivity > timeout)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, start_us, end_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                }
            )
            return
        n, total, start_us, end_us = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            # a null ts carries no event time: it can't place the event
            # in a session, and NaT.astype(int64) either raises (pandas
            # >=1.x) or yields a year-1677 sentinel — drop such rows
            # instead of crash-looping the query on replay
            pdf = pdf[pdf["ts"].notna()]
            if pdf.empty:
                continue
            ts_us = pdf["ts"].astype("int64") // 1000
            n += len(pdf)
            total += float(pdf["value"].sum())
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
        if n == 0:
            # the whole group was null-ts rows: no event time, no
            # session — leaving no state avoids a timeout later trying
            # to build timestamps from None
            return
        state.update((n, total, start_us, end_us))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            columns=[
                "user_id",
                "n_events",
                "total_value",
                "session_start",
                "session_end",
            ]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
