"""Semantic tests for the r6 time-series pack
(plans/timeseries_queries.py): EWMA against a pure-python reference on
planted sequences, median/MAD against numpy brute force, transition
conservation laws, and CUSUM peak localization on a planted level
shift."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import timeseries_queries as T
from strava_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _plant(spark, tmp_path, rows):
    """Write a tiny events table and return its sf_dir."""
    d = str(tmp_path / "planted")
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/events.parquet")
    return d


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def _ewma_ref(cents: list[int]) -> list[tuple[int, int]]:
    """(num, den) per position, weights 2^(7-j) over last 8 values."""
    out = []
    for i in range(len(cents)):
        num = den = 0
        for j in range(T._EWMA_LAGS):
            if i - j >= 0:
                w = 1 << (T._EWMA_LAGS - 1 - j)
                num += cents[i - j] * w
                den += w
        out.append((num, den))
    return out


class TestEventsEwma:
    def test_matches_python_reference_on_planted_series(self, spark, tmp_path):
        vals_a = [1.00, 2.00, 4.00, 1.50, 0.25, 9.99, 3.33, 1.11, 2.22, 5.00]
        vals_b = [10.00, 20.00]
        rows = [
            (i, _ts(i), 1, "click", v, "{}") for i, v in enumerate(vals_a)
        ] + [
            (100 + i, _ts(i), 2, "view", v, "{}")
            for i, v in enumerate(vals_b)
        ]
        out = {
            r["event_id"]: (r["ewma_num"], r["ewma_den"])
            for r in T.events_ewma(spark, _plant(spark, tmp_path, rows)).collect()
        }
        for base, vals in ((0, vals_a), (100, vals_b)):
            cents = [round(v * 100) for v in vals]
            for i, (num, den) in enumerate(_ewma_ref(cents)):
                assert out[base + i] == (num, den), (base, i)

    def test_partial_history_denominator(self, spark, tmp_path):
        # a user's very first event must weight ONLY itself: den = 128
        rows = [(1, _ts(0), 7, "click", 3.00, "{}")]
        r = T.events_ewma(spark, _plant(spark, tmp_path, rows)).collect()[0]
        assert r["ewma_den"] == 1 << (T._EWMA_LAGS - 1)
        assert r["ewma_num"] == 300 * (1 << (T._EWMA_LAGS - 1))
        assert r["ewma_cents"] == 300.0


def _lower_median(sorted_vals: list[int]) -> int:
    # first v where 2*cum >= n == element at ceil(n/2)-1
    n = len(sorted_vals)
    return sorted_vals[(n + 1) // 2 - 1]


class TestMadOutliers:
    def test_matches_bruteforce(self, spark):
        events = load_table(spark, SF, "events").select(
            "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
        )
        by_type: dict[str, list[int]] = {}
        for r in events.collect():
            by_type.setdefault(r["event_type"], []).append(r["v"])
        got = {r["event_type"]: r for r in T.mad_outliers(spark, SF).collect()}
        assert set(got) == set(by_type)
        for t, vals in by_type.items():
            vals.sort()
            med = _lower_median(vals)
            mad = _lower_median(sorted(abs(v - med) for v in vals))
            n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
            r = got[t]
            assert r["n"] == len(vals), t
            assert r["med_cents"] == med, t
            assert r["mad_cents"] == mad, t
            assert r["n_outliers"] == n_out, t


class TestEventTransitions:
    def test_conservation_and_normalization(self, spark):
        rows = T.event_transitions(spark, SF).collect()
        events = load_table(spark, SF, "events")
        n_events = events.count()
        n_users = events.select("user_id").distinct().count()
        # every event except each user's first contributes one transition
        assert sum(r["n"] for r in rows) == n_events - n_users
        from collections import defaultdict

        by_from = defaultdict(list)
        for r in rows:
            by_from[r["from_type"]].append(r)
        for f, grp in by_from.items():
            tot = grp[0]["total_from"]
            assert all(g["total_from"] == tot for g in grp), f
            assert sum(g["n"] for g in grp) == tot, f
            assert abs(sum(g["p"] for g in grp) - 1.0) < 1e-4, f


class TestCusumChangepoint:
    def test_planted_level_shift_peaks_at_boundary(self, spark, tmp_path):
        vals = [1.00] * 10 + [5.00] * 10
        rows = [(i, _ts(i), 1, "click", v, "{}") for i, v in enumerate(vals)]
        r = T.cusum_changepoint(spark, _plant(spark, tmp_path, rows)).collect()
        assert len(r) == 1
        assert r[0]["peak_k"] == 10  # last pre-shift event
        assert r[0]["n"] == 20
        # score at the boundary: |n*prefix - k*S| = |20*1000 - 10*6000|
        assert r[0]["peak_score"] == abs(20 * 1000 - 10 * 6000)

    def test_constant_series_scores_zero(self, spark, tmp_path):
        rows = [(i, _ts(i), 3, "view", 2.00, "{}") for i in range(5)]
        r = T.cusum_changepoint(spark, _plant(spark, tmp_path, rows)).collect()
        assert r[0]["peak_score"] == 0
        # ties on score break to the earliest event_id
        assert r[0]["peak_event_id"] == 0

    def test_invariants_at_sf(self, spark):
        for r in T.cusum_changepoint(spark, SF).collect():
            assert r["peak_score"] >= 0
            assert 1 <= r["peak_k"] <= r["n"]


class TestGroupwiseQuantiles:
    def test_matches_bruteforce_lower_quantiles(self, spark):
        events = load_table(spark, SF, "events").select(
            "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
        )
        by_type: dict[str, list[int]] = {}
        for r in events.collect():
            by_type.setdefault(r["event_type"], []).append(r["v"])
        got = {
            r["event_type"]: r
            for r in T.groupwise_quantiles(spark, SF).collect()
        }
        assert set(got) == set(by_type)
        for t, vals in by_type.items():
            vals.sort()
            n = len(vals)
            r = got[t]
            assert r["n"] == n
            for k, col in ((1, "p25_cents"), (2, "p50_cents"), (3, "p75_cents")):
                # first v with 4*cum >= k*n == element at ceil(k*n/4)-1
                want = vals[-(-k * n // 4) - 1]
                assert r[col] == want, (t, col)
            assert r["p25_cents"] <= r["p50_cents"] <= r["p75_cents"]
