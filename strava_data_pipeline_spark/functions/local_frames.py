"""Driver-local row lists as DataFrames, without the per-core Python
round-trip tax.

``spark.createDataFrame(list, schema)`` shards even a 2-row sentinel
list across ``defaultParallelism`` pickled-RDD slices. Any downstream
single-task action (``coalesce(1).write`` — the streaming faces' flush
landings) then evaluates every parent slice inside that one task,
paying one Python-worker round trip PER SLICE: measured 5.5s per
2-row flush write at local[32] vs 0.34s with one slice. The fix is a
single explicit slice — row order, schema and values are identical,
only the RDD's partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def one_slice_frame(spark: SparkSession, rows: list, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with the pickled RDD in
    ONE slice instead of ``defaultParallelism`` — for small driver-side
    row lists (sentinel/flush batches, bounded audit rows) whose
    consumers run single-task actions over them."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
