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


class TestFunnelGapfillPlantedEdges:
    """Planted-fixture edge cases routed through the REGISTRY builders
    (a tmp sf_dir with a synthetic events.parquet), covering orderings
    the generated corpus can't guarantee to contain."""

    @pytest.fixture()
    def edge_sf_dir(self, spark, tmp_path):
        from datetime import datetime as dt

        rows = [
            # u1: purchase BEFORE any view → must not convert
            (1, dt(2024, 1, 1, 9, 0), 1, "purchase", 5.0),
            (2, dt(2024, 1, 1, 10, 0), 1, "view", 0.0),
            # u2: click at the EXACT ts of the first view → strict
            # 'after' excludes it; the later click qualifies
            (3, dt(2024, 1, 1, 10, 0), 2, "view", 0.0),
            (4, dt(2024, 1, 1, 10, 0), 2, "click", 0.0),
            (5, dt(2024, 1, 1, 11, 0), 2, "click", 0.0),
            (6, dt(2024, 1, 1, 11, 30), 2, "purchase", 9.0),
            # u3: single event, single day → gapfill span is one row
            (7, dt(2024, 1, 5, 8, 0), 3, "view", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        sf = str(tmp_path / "edge_sf")
        df.coalesce(1).write.parquet(f"{sf}/events.parquet")
        return sf

    def test_funnel_strict_ordering(self, spark, edge_sf_dir):
        from strava_data_pipeline_spark.plans import registry

        got = {
            r["user_id"]: r
            for r in registry.all_queries()["events_funnel"](
                spark, edge_sf_dir
            ).collect()
        }
        assert not got[1]["converted"]          # purchase preceded the view
        assert got[1]["t_click"] is None
        assert got[2]["converted"]
        assert got[2]["t_click"].hour == 11     # the tie-ts click was skipped
        assert not got[3]["converted"]

    def test_gapfill_single_day_span(self, spark, edge_sf_dir):
        from strava_data_pipeline_spark.plans import registry

        rows = [
            r
            for r in registry.all_queries()["events_gapfill"](
                spark, edge_sf_dir
            ).collect()
            if r["user_id"] == 3
        ]
        assert len(rows) == 1                   # span collapses to one day
        assert not rows[0]["is_gap"]
        assert rows[0]["locf_value"] == 1.0


class TestOverlapJoin:
    """overlap_join must equal the naive range join, exactly once per
    pair, including intervals spanning many bins and touching ends."""

    @pytest.fixture(scope="class")
    def sides(self, spark):
        from strava_data_pipeline_spark.operators.temporal import overlap_join

        left = spark.createDataFrame(
            [
                (1, ts("2024-01-01 06:00:00"), ts("2024-01-01 07:00:00")),
                (2, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")),  # bin-crossing
                (3, ts("2024-01-03 00:00:00"), ts("2024-01-07 00:00:00")),  # 5 bins
                (4, ts("2024-02-01 00:00:00"), ts("2024-02-01 01:00:00")),  # no match
            ],
            "l_id bigint, l_start timestamp, l_end timestamp",
        )
        right = spark.createDataFrame(
            [
                (10, ts("2024-01-01 06:30:00"), ts("2024-01-04 00:00:00")),  # hits 1,2,3
                (11, ts("2024-01-02 00:30:00"), ts("2024-01-02 02:00:00")),  # hits 2
                (12, ts("2024-01-01 07:00:00"), ts("2024-01-01 08:00:00")),  # touches 1's end
                (13, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")),  # no match
            ],
            "r_id bigint, r_start timestamp, r_end timestamp",
        )
        got = overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end"
        ).select("l_id", "r_id")
        naive = left.join(
            right,
            (F.col("l_start") <= F.col("r_end")) & (F.col("r_start") <= F.col("l_end")),
        ).select("l_id", "r_id")
        return got, naive

    def test_matches_naive_range_join(self, sides):
        got, naive = sides
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))

    def test_multi_bin_pairs_emitted_exactly_once(self, sides):
        got, _ = sides
        rows = [tuple(r) for r in got.collect()]
        assert len(rows) == len(set(rows))
        # the 5-bin × 3-day pair appears, once
        assert rows.count((3, 10)) == 1
        # closed-interval touch counts as overlap
        assert (1, 12) in rows
