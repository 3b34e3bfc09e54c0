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
    ArrayType,
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

# ALL unfinalized sessions (parallel arrays, one element per session
# still inside the watermark horizon) — holding only the newest session
# would glue any out-of-order-across-batches event into the wrong
# session and could never repair an eagerly-emitted one (r8 ADVICE).
GAP_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", ArrayType(IntegerType())),
        StructField("total_cents", ArrayType(LongType())),
        StructField("start_us", ArrayType(LongType())),
        StructField("end_us", ArrayType(LongType())),
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
    - boundary: a new session starts when floor-second(ts) -
      floor-second(prev_ts) > gap; an EXACT-gap arrival merges. Gap
      arithmetic is on WHOLE SECONDS (``ts_us // 1_000_000``) — the
      ``cast(ts AS long)`` truncation every session oracle and
      operators/sessionize.py use. Comparing raw microseconds split
      pairs whose floor-gap was exactly the threshold but whose µs gap
      exceeded it (r8 ADVICE-high; such pairs exist in the rehearsal
      feeds).
    - session_end is the LAST EVENT's ts (not last + gap — that is the
      native session_window convention, covered by its own face).
    - values accumulate in exact BIGINT cents (round(value*100)), so no
      float partial-sum order can leak into a hash.
    - ANY within-watermark disorder is handled, across batches too: a
      session is emitted only once the watermark PROVES no admissible
      event can extend or bridge it. Until then every unfinalized
      session rides in state (parallel arrays), and each batch re-merges
      stored sessions with the batch's own — a late event landing
      inside or within gap of an old session merges; one landing
      between two stored sessions can bridge them into one.

    Close rule: an event merges into a session ending at end_sec iff
    its floor-second <= end_sec + gap_sec, i.e. iff ts_us <
    (end_sec + gap_sec + 1) * 1e6. Spark admits ts >= watermark
    (only ts < watermark is late), so the session is provably closed
    iff wm_ms >= (end_sec + gap_sec + 1) * 1000 — closing at
    ``end + gap <= wm`` would split an exact-boundary arrival (r8
    ADVICE-low). Each batch emits the provably-closed prefix in the
    data path and parks the rest with an event-time timeout at the
    earliest remaining close bound; the timeout handler re-applies the
    same rule. State per key stays bounded: sessions are > gap apart,
    so only sessions inside the (watermark - gap) horizon can remain.

    Mechanics: within a micro-batch the group's rows are materialized
    with pd.concat and sorted by (ts, event_id) — the ewma.py chunk-
    order lesson — then split vectorized on floor-second gap breaks.
    Stored sessions merge with batch sessions by interval merge on
    (start, end): a session's internal gaps are all <= gap, so an
    event (or session) overlapping its span is always within gap of
    one of its events — interval merge on the 4-tuples is EXACTLY
    event-level sessionization of the union."""
    gap_sec = gap_minutes * 60

    def _close_at_ms(s: tuple) -> int:
        # first wm_ms at which nothing admissible can merge into s
        return (s[3] // 1_000_000 + gap_sec + 1) * 1000

    def _merge(sessions: list) -> list:
        """Interval-merge sessions sorted by start; floor-second gap."""
        sessions = sorted(sessions, key=lambda s: (s[2], s[3]))
        out = [sessions[0]]
        for s in sessions[1:]:
            last = out[-1]
            if s[2] // 1_000_000 - last[3] // 1_000_000 <= gap_sec:
                out[-1] = (
                    last[0] + s[0],
                    last[1] + s[1],
                    min(last[2], s[2]),
                    max(last[3], s[3]),
                )
            else:
                out.append(s)
        return out

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

    def _settle(sessions, state: GroupState) -> list:
        """Park not-provably-closed sessions with a timeout; return the
        provably-closed ones for emission. Eager (no generator) so the
        state mutations never ride on consumer laziness."""
        wm_ms = state.getCurrentWatermarkMs()
        closed = [s for s in sessions if _close_at_ms(s) <= wm_ms]
        kept = [s for s in sessions if _close_at_ms(s) > wm_ms]
        if kept:
            state.update(
                (
                    [s[0] for s in kept],
                    [s[1] for s in kept],
                    [s[2] for s in kept],
                    [s[3] for s in kept],
                )
            )
            # earliest close bound; > wm_ms by the kept predicate, as
            # setTimeoutTimestamp requires
            state.setTimeoutTimestamp(min(_close_at_ms(s) for s in kept))
        elif state.exists:
            state.remove()
        return closed

    def _stored(state: GroupState) -> list:
        if not state.exists:
            return []
        ns, cs, ss, es = state.get
        return [
            (int(n), int(c), int(s), int(e))
            for n, c, s, e in zip(ns, cs, ss, es)
        ]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            closed = _settle(_stored(state), state)
            if closed:
                yield _emit(user_id, closed)
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf[pdf["ts"].notna()].sort_values(["ts", "event_id"])
        if pdf.empty:
            return
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        sec = ts_us // 1_000_000
        cents = (
            (pdf["value"].astype("float64") * 100).round().astype("int64")
        ).to_numpy()
        # vectorized gap split: break where the floor-second gap
        # STRICTLY exceeds the threshold
        breaks = [0] + [
            i for i in range(1, len(sec)) if sec[i] - sec[i - 1] > gap_sec
        ] + [len(sec)]
        sessions = [
            (
                int(b - a),
                int(cents[a:b].sum()),
                int(ts_us[a]),
                int(ts_us[b - 1]),
            )
            for a, b in zip(breaks[:-1], breaks[1:])
        ]
        closed = _settle(_merge(_stored(state) + sessions), state)
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
