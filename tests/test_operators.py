"""Operator-semantics tests (mirrors the reference's CRUD round-trip
test style — internal/db/activities_test.go)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from strava_data_pipeline_spark.operators.pagination import page_keyset, page_offset
from strava_data_pipeline_spark.operators.sessionize import sessionize
from strava_data_pipeline_spark.operators.upsert import merge_latest_wins


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )


class TestUpsert:
    def test_update_wins_on_newer_ts(self, spark):
        base = _events(spark, [(1, datetime(2024, 1, 1), 10, 1.0)])
        upd = _events(spark, [(1, datetime(2024, 1, 2), 10, 2.0)])
        out = merge_latest_wins(base, upd, ["event_id"], ["ts"]).collect()
        assert len(out) == 1 and out[0]["value"] == 2.0

    def test_stale_update_loses(self, spark):
        base = _events(spark, [(1, datetime(2024, 1, 5), 10, 1.0)])
        upd = _events(spark, [(1, datetime(2024, 1, 2), 10, 2.0)])
        out = merge_latest_wins(base, upd, ["event_id"], ["ts"]).collect()
        assert out[0]["value"] == 1.0

    def test_tie_goes_to_update(self, spark):
        """Same version ts: incoming row replaces stored (ON CONFLICT
        semantics — the reference always overwrites on conflict)."""
        base = _events(spark, [(1, datetime(2024, 1, 1), 10, 1.0)])
        upd = _events(spark, [(1, datetime(2024, 1, 1), 10, 2.0)])
        out = merge_latest_wins(base, upd, ["event_id"], ["ts"]).collect()
        assert out[0]["value"] == 2.0

    def test_insert_new_key(self, spark):
        base = _events(spark, [(1, datetime(2024, 1, 1), 10, 1.0)])
        upd = _events(spark, [(2, datetime(2024, 1, 1), 10, 2.0)])
        out = merge_latest_wins(base, upd, ["event_id"], ["ts"])
        assert out.count() == 2


class TestPagination:
    def _df(self, spark):
        return _events(
            spark,
            [(i, datetime(2024, 1, 1 + i), 1, float(i)) for i in range(10)],
        )

    def test_offset_page(self, spark):
        out = page_offset(
            self._df(spark), [("ts", True), ("event_id", True)], limit=3, offset=2
        ).collect()
        assert [r["event_id"] for r in out] == [7, 6, 5]

    def test_offset_past_end_empty(self, spark):
        out = page_offset(
            self._df(spark), [("ts", True), ("event_id", True)], limit=5, offset=100
        )
        assert out.count() == 0

    def test_keyset_matches_offset(self, spark):
        df = self._df(spark)
        first = page_keyset(df, [("ts", True), ("event_id", True)], None, 3).collect()
        assert [r["event_id"] for r in first] == [9, 8, 7]
        cursor = F.col("ts") < F.lit(first[-1]["ts"])
        second = page_keyset(df, [("ts", True), ("event_id", True)], cursor, 3).collect()
        assert [r["event_id"] for r in second] == [6, 5, 4]


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        rows = [
            (1, datetime(2024, 1, 1, 10, 0), 7, 1.0),
            (2, datetime(2024, 1, 1, 10, 10), 7, 1.0),
            (3, datetime(2024, 1, 1, 12, 0), 7, 1.0),  # > 30 min gap
        ]
        out = sessionize(_events(spark, rows)).orderBy("event_id").collect()
        assert [r["session_seq"] for r in out] == [0, 0, 1]

    def test_users_independent(self, spark):
        rows = [
            (1, datetime(2024, 1, 1, 10, 0), 7, 1.0),
            (2, datetime(2024, 1, 1, 18, 0), 8, 1.0),
        ]
        out = sessionize(_events(spark, rows)).collect()
        assert all(r["session_seq"] == 0 for r in out)


def test_cdc_merge_applies_deletes_and_updates(spark):
    from datetime import datetime

    from strava_data_pipeline_spark.operators.upsert import merge_cdc

    base = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10), 5.0),
            (2, datetime(2024, 1, 1, 10), 6.0),
            (3, datetime(2024, 1, 1, 10), 7.0),
        ],
        "id bigint, ts timestamp, value double",
    )
    changes = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 2, 10), 50.0, "U"),   # update wins (newer)
            (2, datetime(2024, 1, 2, 10), None, "D"),   # delete wins (newer)
            (3, datetime(2023, 12, 1, 10), 0.0, "D"),   # stale delete loses
            (4, datetime(2024, 1, 1, 10), 9.0, "U"),    # brand-new insert
        ],
        "id bigint, ts timestamp, value double, op string",
    )
    out = {
        r["id"]: r["value"]
        for r in merge_cdc(base, changes, keys=["id"], order_by=["ts"]).collect()
    }
    assert out == {1: 50.0, 3: 7.0, 4: 9.0}


def test_approx_paths_within_tolerance(spark, sf_dir):
    # Since r5 the sketch registrations emit exact anchor columns plus
    # an earned in-tolerance flag (so the driver can full-hash them);
    # this test asserts the flags are actually TRUE — i.e. the HLL
    # estimate is within the 10%/±2 band and every percentile_approx
    # estimate landed inside its exact rank window — and that the
    # anchors agree with the exact twins.
    from strava_data_pipeline_spark.plans import registry

    qs = registry.all_queries()
    exact_prof = {
        r["column_name"]: r for r in qs["events_profile"](spark, sf_dir).collect()
    }
    approx_prof = {
        r["column_name"]: r
        for r in qs["events_profile_approx"](spark, sf_dir).collect()
    }
    assert set(exact_prof) == set(approx_prof)
    for col, ex in exact_prof.items():
        ap = approx_prof[col]
        assert ap["n_rows"] == ex["n_rows"] and ap["n_nulls"] == ex["n_nulls"]
        assert ap["n_distinct"] == ex["n_distinct"]  # exact anchor column
        assert ap["hll_ok"] is True, col  # the sketch earned its flag

    exact_pct = {
        r["event_type"]: r for r in qs["percentile_stats"](spark, sf_dir).collect()
    }
    approx_pct = {
        r["event_type"]: r
        for r in qs["percentile_stats_approx"](spark, sf_dir).collect()
    }
    assert set(exact_pct) == set(approx_pct)
    for et, ex in exact_pct.items():
        ap = approx_pct[et]
        assert ap["n"] == ex["n"]
        for q in ("p50", "p90", "p99"):
            assert ap[f"{q}_lo"] <= ap[f"{q}_hi"], (et, q)
            assert ap[f"{q}_ok"] is True, (et, q)  # estimate in rank window
            # the exact continuous quantile also sits in (or at most a
            # rounding step outside) the discrete rank window
            assert ap[f"{q}_lo"] - 1e-4 <= ex[q] <= ap[f"{q}_hi"] + 1e-4, (et, q)


class TestObservedIngest:
    """observe-based quality counters ride the existing plan."""

    def test_counters_free_on_the_same_action(self, spark):
        from strava_data_pipeline_spark.operators.monitor import observed_ingest

        df = spark.createDataFrame(
            [(1, 5.0), (2, -3.0), (3, None), (None, 2.0)],
            "event_id long, value double",
        )
        monitored, obs = observed_ingest(
            df, not_null=["event_id", "value"], non_negative=["value"]
        )
        assert monitored.count() == 4  # frame unchanged
        got = obs.get
        assert got["n_rows"] == 4
        assert got["null_event_id"] == 1
        assert got["null_value"] == 1
        assert got["neg_value"] == 1

    def test_clean_batch_all_zero(self, spark):
        from strava_data_pipeline_spark.operators.monitor import observed_ingest

        df = spark.range(10).select(
            F.col("id").alias("event_id"), F.lit(1.5).alias("value")
        )
        monitored, obs = observed_ingest(
            df, not_null=["event_id"], non_negative=["value"]
        )
        monitored.write.format("noop").mode("overwrite").save()
        got = obs.get
        assert got == {"n_rows": 10, "null_event_id": 0, "neg_value": 0}


class TestEdgeInputHardening:
    """r4 review: edge inputs the oracle corpus never exercises."""

    def test_asof_join_carries_whole_row_not_stitched_columns(self, spark):
        from strava_data_pipeline_spark.operators.temporal import asof_join

        right = spark.createDataFrame(
            [(7, 1, "A", "X"), (7, 2, "B", None)],
            "user_id long, valid_from long, tier string, region string",
        )
        left = spark.createDataFrame([(7, 3)], "user_id long, ts long")
        out = asof_join(
            left, right, on=["user_id"], payload=["tier", "region"]
        ).collect()
        assert len(out) == 1
        # the latest right ROW is (B, NULL) — per-column carry would
        # stitch (B, X), a combination that never existed
        assert out[0]["tier"] == "B" and out[0]["region"] is None

    def test_asof_join_rejects_payload_collision_with_left(self, spark):
        import pytest as _pytest

        from strava_data_pipeline_spark.operators.temporal import asof_join

        right = spark.createDataFrame(
            [(7, 1, 9.0)], "user_id long, valid_from long, value double"
        )
        left = spark.createDataFrame(
            [(7, 3, 1.0)], "user_id long, ts long, value double"
        )
        with _pytest.raises(ValueError, match="payload columns"):
            asof_join(left, right, on=["user_id"], payload=["value"])

    def test_merge_cdc_null_op_is_upsert_not_delete(self, spark):
        from strava_data_pipeline_spark.operators.upsert import merge_cdc

        base = spark.createDataFrame([(7, 1, "old")], "id long, v long, s string")
        changes = spark.createDataFrame(
            [(7, 2, "new", None)], "id long, v long, s string, op string"
        )
        out = merge_cdc(base, changes, keys=["id"], order_by=["v"]).collect()
        assert len(out) == 1 and out[0]["s"] == "new", (
            "NULL op must upsert, never silently delete the key"
        )

    def test_sampling_rate_rounds_not_truncates(self, spark):
        from strava_data_pipeline_spark.operators.sampling import (
            _rate_buckets,
            assign_split,
        )

        assert _rate_buckets(0.7 + 0.1) == 800  # int() gave 799
        df = spark.createDataFrame(
            [(i,) for i in range(4000)], "doc_id long"
        )
        splits = {
            r["split"]: r["n"]
            for r in assign_split(df, train=0.7, val=0.1)
            .groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # val covers buckets [700, 800) exactly — ~10%, not ~9.9%
        assert abs(splits["val"] / 4000 - 0.1) < 0.02

    def test_sampling_null_keys_kept_deterministically(self, spark):
        from strava_data_pipeline_spark.operators.sampling import (
            assign_split,
            sample_fraction,
        )

        df = spark.createDataFrame([(None,), (1,)], "doc_id long")
        assert sample_fraction(df, 1.0).count() == 2, (
            "rate=1.0 must keep NULL-key rows"
        )
        labels = {
            (r["doc_id"], r["split"]) for r in assign_split(df).collect()
        }
        assert len(labels) == 2  # null key gets a stable label, not dropped

    def test_weighted_mixture_empty_weights_is_identity(self, spark):
        from strava_data_pipeline_spark.operators.sampling import weighted_mixture

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        assert weighted_mixture(df, {}).count() == 1

    def test_profile_empty_and_hostile_column_names(self, spark):
        from strava_data_pipeline_spark.operators.profiling import profile

        df = spark.createDataFrame([(1, "x")], ["id", "it's"])
        assert profile(df, []).count() == 0
        rows = {r["column_name"]: r for r in profile(df, ["id", "it's"]).collect()}
        assert rows["it's"]["n_nulls"] == 0 and rows["it's"]["n_distinct"] == 1


class TestSessionizeBucketed:
    """sessionize_bucketed must be ROW-IDENTICAL to sessionize — the
    boundary-repair pass has to reproduce exactly the global per-user
    running break count, whatever the bucket layout."""

    def _both(self, spark, rows, bucket_hours=24):
        from strava_data_pipeline_spark.operators.sessionize import (
            sessionize_bucketed,
        )

        df = _events(spark, rows)
        plain = {
            r["event_id"]: r["session_seq"] for r in sessionize(df).collect()
        }
        bucketed = {
            r["event_id"]: r["session_seq"]
            for r in sessionize_bucketed(
                df, bucket_hours=bucket_hours
            ).collect()
        }
        return plain, bucketed

    def test_session_spanning_bucket_boundary(self, spark):
        # events at 23:50 and 00:05 next day: 15-min gap, ONE session
        # crossing the day-bucket edge — the boundary term must not fire
        rows = [
            (1, datetime(2024, 1, 1, 23, 50), 7, 1.0),
            (2, datetime(2024, 1, 2, 0, 5), 7, 1.0),
            (3, datetime(2024, 1, 2, 0, 10), 7, 1.0),
        ]
        plain, bucketed = self._both(spark, rows)
        assert bucketed == plain
        assert set(bucketed.values()) == {0}

    def test_break_exactly_at_bucket_boundary(self, spark):
        # 2h gap across midnight: the bucket's first event IS a break,
        # carried by the boundary term (intra lag sees null there)
        rows = [
            (1, datetime(2024, 1, 1, 22, 0), 7, 1.0),
            (2, datetime(2024, 1, 2, 0, 0), 7, 1.0),
        ]
        plain, bucketed = self._both(spark, rows)
        assert bucketed == plain == {1: 0, 2: 1}

    def test_gap_longer_than_bucket_skips_empty_buckets(self, spark):
        # 3-day silence: intermediate calendar buckets have no rows;
        # lag over existing summaries must still pair the right edges
        rows = [
            (1, datetime(2024, 1, 1, 10, 0), 7, 1.0),
            (2, datetime(2024, 1, 1, 10, 10), 7, 1.0),
            (3, datetime(2024, 1, 4, 10, 0), 7, 1.0),
            (4, datetime(2024, 1, 4, 10, 5), 7, 1.0),
        ]
        plain, bucketed = self._both(spark, rows)
        assert bucketed == plain == {1: 0, 2: 0, 3: 1, 4: 1}

    def test_multi_break_cascade_matches(self, spark):
        # breaks inside buckets AND at boundaries, two users, odd
        # 5-hour buckets so bucket edges don't align with days
        rows = []
        eid = 0
        for u in (7, 8):
            t = datetime(2024, 1, 1, 0, 0)
            for step_min in (0, 10, 200, 15, 45, 1000, 5, 31, 29, 2000):
                from datetime import timedelta

                t = t + timedelta(minutes=step_min)
                eid += 1
                rows.append((eid, t, u, 1.0))
        plain, bucketed = self._both(spark, rows, bucket_hours=5)
        assert bucketed == plain
        assert max(plain.values()) >= 3  # the cascade actually happened

    def test_random_timelines_match(self, spark):
        import random
        from datetime import timedelta

        rng = random.Random(0x5E55)
        rows = []
        eid = 0
        for u in range(5):
            t = datetime(2024, 1, 1)
            for _ in range(40):
                t = t + timedelta(minutes=rng.choice((1, 5, 29, 31, 61, 600, 1500)))
                eid += 1
                rows.append((eid, t, u, 1.0))
        for bh in (1, 7, 24):
            plain, bucketed = self._both(spark, rows, bucket_hours=bh)
            assert bucketed == plain, bh
