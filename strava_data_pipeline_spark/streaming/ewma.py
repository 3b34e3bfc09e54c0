"""Streaming twin of the batch ``events_ewma`` query: per-user EWMA-8
smoothing as a custom stateful operator (applyInPandasWithState).

The batch operator (plans/timeseries_queries.py:events_ewma) computes
an exact-rational EWMA over the 8 most recent values per user via lag
windows; here the same arithmetic runs incrementally — state is the
user's trailing 7 cent-values (most recent first), each arriving event
emits its (num, den) pair and shifts the state. Semantics contract:
within a micro-batch rows are ordered by the SAME (ts, event_id) total
order the batch operator uses; across micro-batches the feed is
append-ordered (the incremental-sync landing contract all streaming
operators here share). Under that contract — which additionally
requires ``ts IS NOT NULL`` (the stream drops null-ts rows; the batch
query emits them with window-order placement, so the equivalence holds
only for feeds the upstream quality gate has already screened; see
streaming/quality_gate.py) — the streaming output is ROW-IDENTICAL to
the batch query — pinned by the chunked-replay equivalence test in
tests/test_streaming_ewma.py, including a mid-stream checkpoint-resume
and a multi-Arrow-chunk group (the update fn materializes each group
with ``pd.concat`` before sorting, because chunk-local sorts do not
establish a group total order).

State is 7 BIGINTs per user — bounded per key, arbitrary key
cardinality across the cluster, checkpoint-recovered on restart.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_LAGS = 8  # total horizon including the current value

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ewma_num", LongType()),
        StructField("ewma_den", LongType()),
        StructField("ewma_cents", DoubleType()),
    ]
)

# trailing values, most recent first; absent slots are NULL
EWMA_STATE_SCHEMA = StructType(
    [StructField(f"l{i}", LongType()) for i in range(1, _LAGS)]
)


def ewma_stream(stream: DataFrame) -> DataFrame:
    """Per-event EWMA-8 rows over a streaming events frame with
    (event_id, ts, user_id, value) columns."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        hist: list[int] = (
            [v for v in state.get if v is not None] if state.exists else []
        )
        out: dict[str, list] = {
            "event_id": [],
            "user_id": [],
            "ewma_num": [],
            "ewma_den": [],
            "ewma_cents": [],
        }
        # A group's micro-batch rows can span multiple Arrow chunks
        # (spark.sql.execution.arrow.maxRecordsPerBatch), and the
        # groupBy shuffle gives no intra-group order — so the (ts,
        # event_id) total order must be established over the WHOLE
        # group, not per chunk. State is 7 ints/key, so concatenating
        # the group is bounded by the micro-batch size, not the stream.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf[pdf["ts"].notna()].sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            vc = int(round(float(row["value"]) * 100))
            window = [vc] + hist[: _LAGS - 1]
            num = sum(
                w << (_LAGS - 1 - j) for j, w in enumerate(window)
            )
            den = sum(
                1 << (_LAGS - 1 - j) for j in range(len(window))
            )
            out["event_id"].append(int(row["event_id"]))
            out["user_id"].append(user_id)
            out["ewma_num"].append(num)
            out["ewma_den"].append(den)
            out["ewma_cents"].append(round(num / den, 6))
            hist = window[: _LAGS - 1]
        state.update(
            tuple(hist + [None] * (_LAGS - 1 - len(hist)))
        )
        yield pd.DataFrame(out)

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_ewma_sink(
    stream: DataFrame, target_dir: str, checkpoint_dir: str
):
    """availableNow parquet sink for the EWMA stream."""
    return (
        ewma_stream(stream)
        .writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
