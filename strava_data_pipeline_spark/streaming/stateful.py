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


GAP_SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_cents", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

# open session: (n_events, total_cents, start_us, end_us)
GAP_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", IntegerType()),
        StructField("total_cents", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)


def track_sessions_event_time(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-sessionization as a custom stateful operator with EVENT-TIME
    timeouts — the deterministic twin of ``track_sessions``: where the
    ProcessingTimeTimeout variant closes sessions on wall-clock trigger
    cadence (pytest-only by design; no oracle can reproduce wall-clock),
    this one closes them when the WATERMARK passes session_end + gap,
    a pure function of the feed. Committed output is therefore
    hash-checkable against the batch gap-sessionize SQL — the
    ``stateful_session_audit`` registry face.

    Semantics (matches the batch sessionizer contract exactly):
    - boundary: a new session starts when ts - prev_ts > gap; an
      EXACT-gap arrival merges.
    - session_end is the LAST EVENT's ts (not last + gap — that is the
      native session_window convention, covered by its own face).
    - values accumulate in exact BIGINT cents (round(value*100)), so no
      float partial-sum order can leak into a hash.

    Mechanics: within a micro-batch the group's rows are materialized
    with pd.concat and sorted by (ts, event_id) — the ewma.py chunk-
    order lesson — then split vectorized on gap breaks; all sessions
    but the last emit immediately, the last stays in state with an
    event-time timeout at end + gap. If the current watermark already
    passed end + gap (possible when a batch carries a user's OLD tail),
    the session closes in the data path instead — Spark rejects timeout
    timestamps behind the watermark. State per key is one 4-field
    tuple; timeouts fire for every stored key once the watermark
    advances, whether or not the key sees more data."""
    gap_us = gap_minutes * 60_000_000

    def _emit(user_id, sessions) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "n_events": [s[0] for s in sessions],
                "total_cents": [s[1] for s in sessions],
                "session_start": [
                    pd.Timestamp(s[2], unit="us") for s in sessions
                ],
                "session_end": [
                    pd.Timestamp(s[3], unit="us") for s in sessions
                ],
            }
        )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, cents, start_us, end_us = state.get
            state.remove()
            yield _emit(user_id, [(n, cents, start_us, end_us)])
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf[pdf["ts"].notna()].sort_values(["ts", "event_id"])
        if pdf.empty:
            return
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        cents = (
            (pdf["value"].astype("float64") * 100).round().astype("int64")
        ).to_numpy()
        # vectorized gap split: break where the gap STRICTLY exceeds
        breaks = [0] + [
            i for i in range(1, len(ts_us)) if ts_us[i] - ts_us[i - 1] > gap_us
        ] + [len(ts_us)]
        sessions = [
            (
                int(b - a),
                int(cents[a:b].sum()),
                int(ts_us[a]),
                int(ts_us[b - 1]),
            )
            for a, b in zip(breaks[:-1], breaks[1:])
        ]
        if state.exists:
            n, c, s_us, e_us = state.get
            first = sessions[0]
            if first[2] - e_us > gap_us:  # state session closed by gap
                sessions = [(n, c, s_us, e_us)] + sessions
            else:  # merge into the open session
                sessions[0] = (
                    n + first[0],
                    c + first[1],
                    min(s_us, first[2]),
                    max(e_us, first[3]),
                )
        closed, tail = sessions[:-1], sessions[-1]
        wm_ms = state.getCurrentWatermarkMs()
        if tail[3] // 1000 + gap_us // 1000 <= wm_ms:
            # the watermark already proved no event can extend it
            closed = closed + [tail]
            if state.exists:
                state.remove()
        else:
            state.update(tail)
            state.setTimeoutTimestamp(tail[3] // 1000 + gap_us // 1000)
        if closed:
            yield _emit(user_id, closed)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=GAP_SESSION_OUTPUT_SCHEMA,
            stateStructType=GAP_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
