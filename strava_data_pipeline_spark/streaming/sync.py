"""Structured-Streaming activity sync.

The reference syncs by polling the Strava API on a ticker and upserting
row-at-a-time (/root/reference/internal/strava/strava.go:261). The
Spark-native shape is a file-source stream: each micro-batch of newly
landed activity files is merged latest-wins into the target table via
``foreachBatch`` — idempotent, incremental, and restartable from the
checkpoint. ``Trigger.AvailableNow`` gives the same "catch up then
stop" semantics as the reference's manual `/admin/sync`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from strava_data_pipeline_spark.operators.upsert import merge_latest_wins

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def read_event_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over newly landed activity parquet files.

    ``maxFilesPerTrigger`` bounds micro-batch size so a backlog of
    landed files can't blow out one batch at cluster scale.
    """
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(landing_dir)
    )


def start_incremental_sync(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
):
    """Merge each micro-batch into the parquet target, latest-wins.

    foreachBatch gets a *batch* DataFrame, so the merge reuses the exact
    batch operator (operators/upsert.py) — one code path for batch and
    streaming ingestion.
    """
    spark = stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(target_dir):
            base = batch.sparkSession.read.schema(EVENT_SCHEMA).parquet(target_dir)
            merged = merge_latest_wins(base, batch, keys=["event_id"], order_by=["ts"])
        else:
            merged = batch
        # overwrite into a staging dir then swap would be the cluster
        # pattern; local filesystem overwrite suffices here
        merged.write.mode("overwrite").parquet(target_dir + "_stage")
        stage = batch.sparkSession.read.parquet(target_dir + "_stage")
        stage.write.mode("overwrite").parquet(target_dir)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
