"""Semantic tests for the r6 product pack (plans/product_queries.py):
attribution against a python reference on planted trails (duplicate
timestamps, cold trails, expired lookbacks), A/B moment exactness and
assignment consistency, and DAU/MAU against a python reference."""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import product_queries as P
from strava_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _plant(spark, tmp_path, rows):
    d = str(tmp_path / "planted")
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/events.parquet")
    return d


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


class TestAttributionLastTouch:
    def test_planted_trails(self, spark, tmp_path):
        day = 86400
        rows = [
            # user 1: view -> purchase (gap 60s) -> purchase (gap 120s,
            # still attributes to the same view: last NON-purchase)
            (10, _ts(0), 1, "view", 1.0, "{}"),
            (11, _ts(60), 1, "purchase", 5.0, "{}"),
            (12, _ts(120), 1, "purchase", 5.0, "{}"),
            # user 2: cold trail — purchase with no prior event
            (20, _ts(0), 2, "purchase", 5.0, "{}"),
            # user 3: touch expired (8 days before purchase)
            (30, _ts(0), 3, "click", 1.0, "{}"),
            (31, _ts(8 * day), 3, "purchase", 5.0, "{}"),
            # user 4: duplicate-timestamp touches — event_id order wins
            (40, _ts(0), 4, "view", 1.0, "{}"),
            (41, _ts(0), 4, "click", 1.0, "{}"),
            (42, _ts(30), 4, "purchase", 5.0, "{}"),
        ]
        got = {
            r["purchase_event_id"]: (r["touch_event_id"], r["gap_sec"])
            for r in P.attribution_last_touch(
                spark, _plant(spark, tmp_path, rows)
            ).collect()
        }
        assert got == {
            11: (10, 60),
            12: (10, 120),
            20: (None, None),
            31: (None, None),
            42: (41, 30),  # ties break by event_id: 41 is the later row
        }

    def test_sf_invariants(self, spark):
        rows = P.attribution_last_touch(spark, SF).collect()
        n_purchases = (
            load_table(spark, SF, "events")
            .where(F.col("event_type") == "purchase")
            .count()
        )
        assert len(rows) == n_purchases
        for r in rows:
            if r["touch_event_id"] is not None:
                assert 0 <= r["gap_sec"] <= P._ATTR_WINDOW_SEC


def _arm(user_id: int) -> str:
    h = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    return "control" if h % 2 == 0 else "treatment"


class TestAbTestEval:
    def test_moments_match_python(self, spark):
        events = load_table(spark, SF, "events").where(
            F.col("event_type") == "purchase"
        )
        by_arm = defaultdict(list)
        for r in events.collect():
            by_arm[_arm(r["user_id"])].append(round(r["value"] * 100))
        got = {r["arm"]: r for r in P.ab_test_eval(spark, SF).collect()}
        assert set(got) == set(by_arm)
        for arm, vals in by_arm.items():
            r = got[arm]
            assert r["n"] == len(vals)
            assert r["sum_cents"] == sum(vals)
            assert r["sumsq_cents"] == sum(v * v for v in vals)
            mean = sum(vals) / len(vals)
            var = sum(v * v for v in vals) / len(vals) - mean * mean
            assert abs(r["mean_cents"] - mean) < 1e-5
            assert abs(r["var_cents"] - var) < 1e-3

    def test_assignment_is_per_user_consistent(self, spark):
        # every user lands in exactly one arm (hash of the id, not the row)
        e = load_table(spark, SF, "events").select(
            "user_id",
            F.when(
                P.md5_u32(F.col("user_id").cast("string")) % 2 == 0, "control"
            )
            .otherwise("treatment")
            .alias("arm"),
        )
        n_users = e.select("user_id").distinct().count()
        assert e.select("user_id", "arm").distinct().count() == n_users


class TestDauMauStickiness:
    def test_matches_python(self, spark):
        events = load_table(spark, SF, "events").select(
            "user_id",
            F.expr("cast(unix_timestamp(ts) div 86400 as bigint)").alias("day"),
        )
        days = defaultdict(set)
        buckets = defaultdict(set)
        for r in events.collect():
            days[r["day"]].add(r["user_id"])
            buckets[r["day"] // 30].add(r["user_id"])
        got = {r["day"]: r for r in P.dau_mau_stickiness(spark, SF).collect()}
        assert set(got) == set(days)
        for day, users in days.items():
            r = got[day]
            assert r["dau"] == len(users)
            assert r["mau"] == len(buckets[day // 30])
            assert abs(r["stickiness"] - len(users) / r["mau"]) < 1e-5
            assert 0 < r["stickiness"] <= 1.0
