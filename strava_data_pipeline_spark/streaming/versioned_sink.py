"""Exactly-once streaming sink into the versioned snapshot store.

``foreachBatch`` gives at-least-once batch delivery: after a crash
between the sink's write and the checkpoint advance, Structured
Streaming re-runs the last batch with the SAME ``batch_id``. The
parquet-dir sink in streaming/sync.py tolerates that because its merge
is idempotent; this sink upgrades the guarantee to exactly-once
*snapshot history*: every applied batch produces exactly one committed
version, replays are detected by the batch marker and skipped, and a
crash at any point leaves the previous version fully readable
(sources/versioned.py's marker-file commit protocol).

Commit order per batch: snapshot data dir → version marker → batch
marker. A crash
- before the version marker: half-written ``v=N`` dir is invisible,
  replay re-merges from v=N-1 — same contents, version numbering
  unchanged;
- between version and batch marker: replay sees the batch unmarked and
  merges AGAIN on top of v=N — latest-wins merge of the same rows is a
  no-op by value, so v=N+1 equals v=N (one redundant but harmless
  version, still exactly-once by contents);
- after the batch marker: replay is skipped entirely.

This is the miniature of what a Delta/Iceberg ``txnAppId``/``txnVersion``
idempotent-writer option does; the reference's sync ticker
(/root/reference/internal/strava/strava.go:261) has no restart story at
all — it refetches a 24h lookback and relies on ON CONFLICT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from strava_data_pipeline_spark.operators.upsert import merge_latest_wins
from strava_data_pipeline_spark.sources.versioned import (
    batch_committed,
    commit_snapshot,
    current_version,
    mark_batch,
    read_snapshot,
)


def start_versioned_sink(
    stream: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    key: str = "event_id",
    ts_col: str = "ts",
) -> StreamingQuery:
    """Stream → versioned store: each micro-batch merges latest-wins
    into the current snapshot and publishes the result as the next
    committed version. Restart-safe (see module docstring); readers
    always see a complete, committed snapshot — never a half-merged
    table."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch_committed(spark, store_root, batch_id):
            return
        if current_version(spark, store_root) is None:
            merged = merge_latest_wins(
                batch.limit(0), batch, keys=[key], order_by=[ts_col]
            )
        else:
            base = read_snapshot(spark, store_root)
            merged = merge_latest_wins(base, batch, keys=[key], order_by=[ts_col])
        commit_snapshot(merged, store_root)
        mark_batch(spark, store_root, batch_id)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
