"""As-of / interval join operator tests on planted fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from strava_data_pipeline_spark.operators.temporal import asof_join, interval_join


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, ts("2024-01-01 00:00:00"), 10),
        (2, ts("2024-01-05 12:00:00"), 10),
        (3, ts("2024-01-09 00:00:00"), 10),
        (4, ts("2024-01-02 00:00:00"), 20),
    ]
    return spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint")


@pytest.fixture(scope="module")
def profiles(spark):
    rows = [
        (10, ts("2024-01-01 00:00:00"), "A"),
        (10, ts("2024-01-05 12:00:00"), "B"),  # exactly at fact 2's ts
        (10, ts("2024-01-08 00:00:00"), "C"),
        (20, ts("2024-01-03 00:00:00"), "Z"),  # after user 20's only fact
    ]
    return spark.createDataFrame(rows, "user_id bigint, valid_from timestamp, tier string")


def test_asof_backward_inclusive(spark, facts, profiles):
    out = {
        r["event_id"]: r["tier"]
        for r in asof_join(
            facts, profiles, on=["user_id"], left_ts="ts",
            right_ts="valid_from", payload=["tier"],
        ).collect()
    }
    assert out[1] == "A"          # exact match at equal ts (inclusive)
    assert out[2] == "B"          # boundary: version landing at fact ts wins
    assert out[3] == "C"          # latest earlier version
    assert out[4] is None         # no version yet -> left semantics, NULL


def test_asof_keeps_every_left_row(spark, facts, profiles):
    joined = asof_join(
        facts, profiles, on=["user_id"], left_ts="ts",
        right_ts="valid_from", payload=["tier"],
    )
    assert joined.count() == facts.count()
    assert set(joined.columns) == set(facts.columns) | {"tier"}


def test_interval_join_overlapping_windows(spark, facts):
    windows = spark.createDataFrame(
        [
            (100, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
            (101, ts("2024-01-02 00:00:00"), ts("2024-01-06 00:00:00")),  # overlaps 100
        ],
        "win_id bigint, win_start timestamp, win_end timestamp",
    )
    out = interval_join(facts, windows, ts_col="ts")
    hits = {(r["event_id"], r["win_id"]) for r in out.collect()}
    # fact 4 (Jan 2) lands in BOTH overlapping windows; end bound exclusive
    assert hits == {(1, 100), (4, 100), (4, 101), (2, 101)}
