"""Per-batch data-quality gate: publish-or-quarantine ingestion.

The streaming face of the batch ``data_quality_checks`` query
(plans/planner_queries.py): every micro-batch is audited with the same
conditional-aggregate expectation pass BEFORE it is published — a batch
with any violation diverts whole to a quarantine directory (keyed by
batch id, replay-idempotent) together with a one-row audit record per
check, and never touches the target. Clean batches append to the
target. This is the landed-data contract a 100 TB ingest runs on:
nothing enters the serving tables unchecked, bad batches are preserved
byte-complete for diagnosis, and the audit trail is itself queryable.

Scale shape: the expectation pass is ONE conditional aggregate over
the batch (O(batch), map-side combinable — the same plan as the batch
query's per-table scan); routing is a single write either way. BOTH
routes are replay-idempotent under foreachBatch's at-least-once
contract: clean batches land under ``target_dir/batch_id=N`` with
overwrite (a crash between the parquet commit and the checkpoint
commit re-runs the batch into the same directory, replacing — not
duplicating — it), and quarantined batches mirror the same keying
under ``quarantine_dir/batch_id=N``. Readers see ``batch_id`` as a
discovered partition column on the target — the same layout the
versioned sink (versioned_sink.py) publishes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from strava_data_pipeline_spark.functions.local_frames import one_slice_frame

def _checks() -> list[tuple[str, F.Column]]:
    """(check_name, violation predicate) pairs over the event schema."""
    return [
        ("event_id_not_null", F.col("event_id").isNull()),
        ("user_id_not_null", F.col("user_id").isNull()),
        ("ts_not_null", F.col("ts").isNull()),
        ("value_non_negative", F.col("value") < 0),
    ]


def audit_batch(batch: DataFrame) -> DataFrame:
    """One-pass expectation audit of a batch: (check_name, n_violations)."""
    aggs = [
        F.coalesce(F.sum(F.when(pred, F.lit(1))), F.lit(0))
        .cast("bigint")
        .alias(name)
        for name, pred in _checks()
    ]
    one = batch.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("check_name"),
            F.col(name).alias("n_violations"),
        )
        for name, _ in _checks()
    ]
    return one.select(F.explode(F.array(*structs)).alias("c")).select(
        "c.check_name", "c.n_violations"
    )


def start_quality_gated_sink(
    stream: DataFrame,
    target_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
):
    """availableNow sink: clean batches publish under
    ``target_dir/batch_id=N/`` (overwrite — replay-idempotent); a
    batch with ANY violation lands whole under
    ``quarantine_dir/batch_id=N/`` (rows + audit), never in the target."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        audit = audit_batch(batch)
        rows = audit.collect()  # bounded: one row per check
        if any(r["n_violations"] > 0 for r in rows):
            bdir = os.path.join(quarantine_dir, f"batch_id={batch_id}")
            batch.write.mode("overwrite").parquet(
                os.path.join(bdir, "rows")
            )
            one_slice_frame(
                batch.sparkSession,
                rows,
                "check_name string, n_violations bigint",
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(bdir, "audit")
            )
            return
        # batch_id-keyed overwrite mirrors the quarantine path: a
        # foreachBatch replay (crash between parquet commit and
        # checkpoint commit) rewrites the same directory instead of
        # appending a duplicate copy of the whole batch.
        batch.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
