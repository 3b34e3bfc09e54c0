"""Streaming quality gate: clean batches publish, violating batches
quarantine whole with an audit record, replays stay idempotent."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from strava_data_pipeline_spark.streaming.quality_gate import (
    audit_batch,
    start_quality_gated_sink,
)
from strava_data_pipeline_spark.streaming.sync import (
    EVENT_SCHEMA,
    read_event_stream,
)


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


CLEAN = [(1, _ts(1), 10, "click", 1.0), (2, _ts(2), 11, "view", 2.0)]
DIRTY = [(3, _ts(3), None, "click", 1.0), (4, _ts(4), 12, "view", -5.0)]


class TestQualityGate:
    def _run(self, spark, landing, target, quarantine, ckpt):
        q = start_quality_gated_sink(
            read_event_stream(spark, landing), target, quarantine, ckpt
        )
        q.awaitTermination()

    def test_routes_clean_and_dirty_batches(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        target = str(tmp_path / "target")
        quarantine = str(tmp_path / "quarantine")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(landing)
        spark.createDataFrame(CLEAN, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        self._run(spark, landing, target, quarantine, ckpt)
        spark.createDataFrame(DIRTY, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        self._run(spark, landing, target, quarantine, ckpt)

        published = {
            r["event_id"] for r in spark.read.parquet(target).collect()
        }
        assert published == {1, 2}
        bdirs = [d for d in os.listdir(quarantine) if d.startswith("batch_id=")]
        assert len(bdirs) == 1
        qrows = spark.read.parquet(
            os.path.join(quarantine, bdirs[0], "rows")
        ).collect()
        assert {r["event_id"] for r in qrows} == {3, 4}
        audit = {
            r["check_name"]: r["n_violations"]
            for r in spark.read.parquet(
                os.path.join(quarantine, bdirs[0], "audit")
            ).collect()
        }
        assert audit["user_id_not_null"] == 1
        assert audit["value_non_negative"] == 1
        assert audit["event_id_not_null"] == 0

        # replay with the same checkpoint: no new work, no duplicates
        self._run(spark, landing, target, quarantine, ckpt)
        assert {
            r["event_id"] for r in spark.read.parquet(target).collect()
        } == {1, 2}

    def test_clean_publish_replay_idempotent(self, spark, tmp_path):
        # Simulate foreachBatch's at-least-once replay on the CLEAN
        # path: run a clean batch, then wipe the checkpoint so the same
        # landing replays under the same batch_id. The batch_id-keyed
        # overwrite must replace, not duplicate, the published rows.
        import shutil

        landing = str(tmp_path / "landing")
        target = str(tmp_path / "target")
        quarantine = str(tmp_path / "quarantine")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(landing)
        spark.createDataFrame(CLEAN, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        self._run(spark, landing, target, quarantine, ckpt)
        assert {
            r["event_id"] for r in spark.read.parquet(target).collect()
        } == {1, 2}
        shutil.rmtree(ckpt)  # lose the offset commit → replay batch 0
        self._run(spark, landing, target, quarantine, ckpt)
        published = spark.read.parquet(target).collect()
        assert {r["event_id"] for r in published} == {1, 2}
        assert len(published) == 2  # replaced, not appended

    def test_audit_batch_counts_per_check(self, spark):
        batch = spark.createDataFrame(
            [
                (1, _ts(1), None, "x", -1.0),
                (None, None, 2, "y", 3.0),
            ],
            EVENT_SCHEMA,
        )
        audit = {
            r["check_name"]: r["n_violations"]
            for r in audit_batch(batch).collect()
        }
        assert audit == {
            "event_id_not_null": 1,
            "user_id_not_null": 1,
            "ts_not_null": 1,
            "value_non_negative": 1,
        }
