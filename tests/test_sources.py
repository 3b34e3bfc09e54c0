"""JSON activity-ingestion source tests (schema-on-read, quarantine,
incremental filter)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from strava_data_pipeline_spark.sources.strava_api import (
    ACTIVITY_SCHEMA,
    incremental_filter,
    parse_activity_json,
    read_activity_json,
)

ACT = {
    "id": 101,
    "name": "Morning Run",
    "type": "Run",
    "distance": 5012.3,
    "moving_time": 1500,
    "elapsed_time": 1600,
    "start_date": "2024-01-10T06:30:00.000Z",
    "average_speed": 3.34,
    "has_heartrate": True,
    "athlete_id": 7,
}


def test_parse_typed_fields(spark):
    raw = spark.createDataFrame([(json.dumps(ACT),)], "json string")
    row = parse_activity_json(raw).collect()[0]
    assert row["id"] == 101 and row["athlete_id"] == 7
    assert row["distance"] == pytest.approx(5012.3)
    assert row["has_heartrate"] is True
    assert row["start_date"].year == 2024
    # absent fields surface as NULL, not errors (38-field schema)
    assert row["max_heartrate"] is None


def test_malformed_payload_quarantined_not_dropped(spark):
    raw = spark.createDataFrame(
        [(json.dumps(ACT),), ("{not valid json",)], "json string"
    )
    parsed = parse_activity_json(raw)
    assert parsed.count() == 2  # nothing silently dropped
    assert parsed.where(F.col("id").isNull()).count() == 1  # quarantine filter


def test_read_json_files_fixed_schema(spark, tmp_path):
    p = tmp_path / "landing"
    p.mkdir()
    acts = [dict(ACT, id=i, start_date=f"2024-01-{10+i:02d}T06:00:00Z") for i in range(5)]
    (p / "batch1.jsonl").write_text("\n".join(json.dumps(a) for a in acts))
    df = read_activity_json(spark, str(p))
    assert df.schema == ACTIVITY_SCHEMA
    assert df.count() == 5
    recent = incremental_filter(df, "2024-01-12 00:00:00")
    assert recent.count() == 3  # FetchActivities(after) inclusive bound
