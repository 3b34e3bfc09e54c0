"""Streaming EWMA: chunked-replay equivalence against the batch
events_ewma query, including a checkpoint resume between chunks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans.timeseries_queries import events_ewma
from strava_data_pipeline_spark.sources.catalog import load_table
from strava_data_pipeline_spark.streaming.ewma import start_ewma_sink
from strava_data_pipeline_spark.streaming.sync import read_event_stream

SF = "/root/testdata/sf0.001"


class TestStreamingEwmaEquivalence:
    def test_chunked_replay_matches_batch(self, spark, tmp_path):
        events = load_table(spark, SF, "events").orderBy("ts", "event_id")
        rows = events.collect()
        # three chronological chunks — per-user order is preserved, so
        # the append-ordered feed contract holds
        cuts = [len(rows) // 3, 2 * len(rows) // 3, len(rows)]
        landing = str(tmp_path / "landing")
        target = str(tmp_path / "target")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(landing)
        start = 0
        for i, end in enumerate(cuts):
            chunk = spark.createDataFrame(rows[start:end], events.schema)
            chunk.coalesce(1).write.mode("append").parquet(landing)
            # each run is a fresh query resuming from the checkpoint —
            # the cross-batch state path is exercised twice
            q = start_ewma_sink(
                read_event_stream(spark, landing), target, ckpt
            )
            q.awaitTermination()
            start = end
        got = {
            r["event_id"]: (r["ewma_num"], r["ewma_den"], r["ewma_cents"])
            for r in spark.read.parquet(target).collect()
        }
        want = {
            r["event_id"]: (r["ewma_num"], r["ewma_den"], r["ewma_cents"])
            for r in events_ewma(spark, SF).collect()
        }
        assert len(got) == len(want)
        assert got == want

    def test_group_spanning_multiple_arrow_chunks(self, spark, tmp_path):
        # One user, 100 rows, ONE micro-batch, Arrow batch size forced
        # to 8 — the group arrives as ~13 chunks and in shuffle (not
        # time) order. A chunk-local sort would apply EWMA state out of
        # order; the group-materializing update fn must still match the
        # batch query exactly.
        import datetime as dt
        import random

        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 1,
             "click", float((i * 37) % 250) / 2.0, "{}")
            for i in range(100)
        ]
        random.Random(7).shuffle(rows)  # landing order != time order
        schema = (
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
        try:
            target = str(tmp_path / "target")
            q = start_ewma_sink(
                read_event_stream(spark, landing),
                target,
                str(tmp_path / "ckpt"),
            )
            q.awaitTermination()
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
        got = {
            r["event_id"]: (r["ewma_num"], r["ewma_den"], r["ewma_cents"])
            for r in spark.read.parquet(target).collect()
        }
        # batch twin over the same rows
        events = spark.createDataFrame(rows, schema)
        events.createOrReplaceTempView("_ewma_chunk_events")
        from strava_data_pipeline_spark.plans import timeseries_queries as tq
        from pyspark.sql import Window
        from pyspark.sql import functions as FF

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        vc = FF.round(FF.col("value") * 100).cast("bigint")
        lagged = events.select(
            "event_id",
            "user_id",
            *[
                (vc if j == 0 else FF.lag(vc, j).over(w)).alias(f"l{j}")
                for j in range(tq._EWMA_LAGS)
            ],
        )
        num = sum(
            FF.coalesce(FF.col(f"l{j}"), FF.lit(0))
            * FF.lit(1 << (tq._EWMA_LAGS - 1 - j))
            for j in range(tq._EWMA_LAGS)
        )
        den = sum(
            FF.when(
                FF.col(f"l{j}").isNotNull(),
                FF.lit(1 << (tq._EWMA_LAGS - 1 - j)),
            ).otherwise(FF.lit(0))
            for j in range(tq._EWMA_LAGS)
        )
        want = {
            r["event_id"]: (r["n"], r["d"], r["c"])
            for r in lagged.select(
                "event_id",
                num.cast("bigint").alias("n"),
                den.cast("bigint").alias("d"),
                FF.round(num * FF.lit(1.0) / den, 6).alias("c"),
            ).collect()
        }
        assert len(got) == 100
        assert got == want

    def test_state_bounded_to_seven_values(self, spark, tmp_path):
        # 20 events for one user: every output row's denominator caps
        # at the full 8-term weight sum once history is saturated
        import datetime as dt

        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 1,
             "click", float(i), "{}")
            for i in range(20)
        ]
        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(landing)
        target = str(tmp_path / "target")
        q = start_ewma_sink(
            read_event_stream(spark, landing),
            target,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination()
        out = sorted(
            spark.read.parquet(target).collect(), key=lambda r: r["event_id"]
        )
        assert len(out) == 20
        full = sum(1 << j for j in range(8))
        for r in out[7:]:
            assert r["ewma_den"] == full
        assert out[0]["ewma_den"] == 1 << 7
