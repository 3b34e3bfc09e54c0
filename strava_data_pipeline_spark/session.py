"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``);
the same config block is what we would ship to a 1000-executor cluster —
AQE handles runtime coalescing/skew, shuffle partitions are env-tunable
so the cluster deployment sets them to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from strava_data_pipeline_spark.config import Config, load_config


def get_spark(
    app_name: str = "strava-data-pipeline-spark", config: Config | None = None
) -> SparkSession:
    """Build (or fetch) the session.

    Settings chosen for 100 TB readiness, not just local runs:
    - AQE on: runtime partition coalescing + skew-join splitting.
    - Arrow on: every pandas interchange (multimodal/ANN UDF paths) is
      columnar-batched instead of per-row pickled.
    - ``maxPartitionBytes`` kept at 128m so a 100 TB scan yields ~800k
      input splits that schedule independently.
    - shuffle partition count from env so cluster deploys size it to the
      executor fleet; AQE coalesces down when partitions run small.

    Resource knobs resolve through the layered config
    (config.py: YAML file + SPARK_GRAFT_SPARK_* env); the original
    short-form env vars (SPARK_GRAFT_CPUS / _SHUFFLE_PARTITIONS /
    _DRIVER_MEM, the driver's contract) keep highest precedence.
    """
    cfg = config if config is not None else load_config()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", cfg.spark.cpus)
    shuffle = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cfg.spark.shuffle_partitions)
    )
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", cfg.spark.driver_memory)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", cfg.spark.broadcast_threshold)
        .config("spark.driver.memory", driver_mem)
        # the repo's queries never collect large results (driver-side
        # discipline is pinned by tests), but the VERIFY harness
        # legitimately collects full tables for hashing — at rehearsal
        # scale that exceeds the 1g default, and the gate must not be
        # the thing that can't scale
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_DRIVER_MAX_RESULT_SIZE", "8g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # RDD-level parallelism (parallelize slices, keyless repartition()
    # defaults, _spread targets). Unset = Spark's local default (total
    # cores). Cluster deploys size it to the fleet; tiny-data harnesses
    # (the unit-test session) cap it so per-slice fixed costs — one
    # Python-worker round trip per pickled slice — don't dominate
    # millisecond-sized jobs.
    default_par = os.environ.get("SPARK_GRAFT_DEFAULT_PARALLELISM")
    if default_par:
        builder = builder.config("spark.default.parallelism", default_par)
    return builder.getOrCreate()
