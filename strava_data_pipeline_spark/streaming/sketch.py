"""Streaming count-min sketch: per-micro-batch counter deltas into an
append-only store, merged by additivity.

The batch operator (plans/mining_queries.py::cms_heavy_hitters) builds
one D x W counter table in a single pass; the streaming shape exploits
the sketch's defining property — counters are SUMS, so per-batch DELTA
sketches merge by addition in any order. Each micro-batch writes its
own delta partition (no read-modify-write, no ordering requirement, a
crash-replayed batch overwrites its own partition idempotently); the
reader sums deltas per (j, b) to materialize the live sketch. That is
the production streaming-sketch layout: cheap blind appends on the hot
path, compaction whenever convenient, and ANY prefix of batches yields
a valid sketch of the data seen so far.

The ``cms_merge_audit`` registry face proves the mergeability ON DISK:
an id-split feed through this sink must yield byte-identical estimates
to the one-pass batch sketch — a lost delta, a double-applied replay,
or a non-additive merge is a hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_data_pipeline_spark.functions.hashing import md5_u32

CMS_D = 4
CMS_W = 256


def cms_delta(batch: DataFrame, key_col: str = "user_id") -> DataFrame:
    """The D x W delta sketch of one batch: per-key counts hashed into
    (j, b) buckets — the same bucket function as the batch operator, so
    summed deltas equal its counters exactly."""
    c = batch.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    js = F.array(*[F.lit(j) for j in range(CMS_D)])
    return (
        c.select(key_col, "cnt", F.explode(js).alias("j"))
        .withColumn(
            "b",
            md5_u32(
                F.concat(
                    F.lit("cms"),
                    F.col("j").cast("string"),
                    F.lit("#"),
                    F.col(key_col).cast("string"),
                )
            )
            % CMS_W,
        )
        .groupBy("j", "b")
        .agg(F.sum("cnt").cast("bigint").alias("v"))
    )


def start_cms_sink(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
):
    """availableNow foreachBatch sink: one delta-partition per batch
    (``delta=<batch_id>``), overwritten in place on replay so a crash
    between write and commit cannot double-count."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        (
            cms_delta(batch, key_col)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{target_dir}/delta={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_counters(spark: SparkSession, target_dir: str) -> DataFrame:
    """Materialize the live sketch: sum every committed delta per
    (j, b). Any subset of batches yields a valid sketch of the rows
    those batches carried — the additivity contract."""
    return (
        spark.read.parquet(f"{target_dir}/delta=*")
        .groupBy("j", "b")
        .agg(F.sum("v").cast("bigint").alias("v"))
    )
