"""Strava-activity ingestion source: JSON payloads → typed DataFrame.

The reference marshals each API activity through JSON into a map and
inserts row-at-a-time (/root/reference/internal/strava/strava.go:86 and
internal/db/activities.go:99). The Spark-native shape: land raw JSON
(files/stream), apply ``from_json`` with the full 38-field activity
schema once, and merge set-based. Schema-on-read means a Strava API
field addition is a one-line schema change, not a table migration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Mirrors the reference's activities table (internal/db/activities.go:8)
ACTIVITY_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("description", StringType()),
        StructField("type", StringType()),
        StructField("distance", DoubleType()),
        StructField("moving_time", IntegerType()),
        StructField("elapsed_time", IntegerType()),
        StructField("total_elevation_gain", DoubleType()),
        StructField("start_date", TimestampType()),
        StructField("start_date_local", TimestampType()),
        StructField("timezone", StringType()),
        StructField("start_latlng", StringType()),
        StructField("end_latlng", StringType()),
        StructField("achievement_count", IntegerType()),
        StructField("kudos_count", IntegerType()),
        StructField("comment_count", IntegerType()),
        StructField("athlete_count", IntegerType()),
        StructField("photo_count", IntegerType()),
        StructField("map_id", StringType()),
        StructField("map_polyline", StringType()),
        StructField("trainer", BooleanType()),
        StructField("commute", BooleanType()),
        StructField("manual", BooleanType()),
        StructField("private", BooleanType()),
        StructField("visibility", StringType()),
        StructField("flagged", BooleanType()),
        StructField("workout_type", IntegerType()),
        StructField("average_speed", DoubleType()),
        StructField("max_speed", DoubleType()),
        StructField("has_heartrate", BooleanType()),
        StructField("average_heartrate", DoubleType()),
        StructField("max_heartrate", DoubleType()),
        StructField("elev_high", DoubleType()),
        StructField("elev_low", DoubleType()),
        StructField("upload_id", LongType()),
        StructField("upload_id_str", StringType()),
        StructField("external_id", StringType()),
        StructField("athlete_id", LongType()),
    ]
)


def parse_activity_json(raw: DataFrame, json_col: str = "json") -> DataFrame:
    """Raw JSON strings → typed activity rows (the set-based
    activityToMap). Unparseable payloads surface as NULL ids and are
    quarantined by the caller, not silently dropped."""
    return raw.select(
        F.from_json(F.col(json_col), ACTIVITY_SCHEMA).alias("a")
    ).select("a.*")


def read_activity_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch-load landed JSON activity files with the fixed schema
    (no runaway schema inference over 100 TB of landings)."""
    return spark.read.schema(ACTIVITY_SCHEMA).json(path)


def incremental_filter(activities: DataFrame, after) -> DataFrame:
    """FetchActivities(after)-equivalent pushdown filter."""
    return activities.where(F.col("start_date") >= F.lit(after))
