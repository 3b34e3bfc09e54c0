"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``);
the same config block is what we would ship to a 1000-executor cluster —
AQE handles runtime coalescing/skew, shuffle partitions are env-tunable
so the cluster deployment sets them to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "strava-data-pipeline-spark") -> SparkSession:
    """Build (or fetch) the session.

    Settings chosen for 100 TB readiness, not just local runs:
    - AQE on: runtime partition coalescing + skew-join splitting.
    - Arrow on: every pandas interchange (multimodal/ANN UDF paths) is
      columnar-batched instead of per-row pickled.
    - ``maxPartitionBytes`` kept at 128m so a 100 TB scan yields ~800k
      input splits that schedule independently.
    - shuffle partition count from env so cluster deploys size it to the
      executor fleet; AQE coalesces down when partitions run small.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
