"""SQL-surface parity: the engine is equally queryable through
``spark.sql`` over registered views — the DataFrame builders in
plans/ and hand-written Spark SQL must agree row-for-row (a user of
the reference can bring either API)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import registry
from strava_data_pipeline_spark.sources.catalog import register_views

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_DIR)
    return spark


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_q1_sql_matches_dataframe(views):
    got = views.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               round(round(sum(l_quantity), 2) / count(*), 4) AS avg_qty,
               round(round(sum(l_extendedprice), 2) / count(*), 4) AS avg_price,
               round(round(sum(l_discount), 4) / count(*), 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    want = registry.all_queries()["q1_pricing_summary"](views, SF_DIR)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_q5_sql_matches_dataframe(views):
    got = views.sql(
        """
        SELECT n.n_name AS nation,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN supplier s ON s.s_nationkey = n.n_nationkey
        JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
                       AND c.c_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        """
    )
    want = registry.all_queries()["q5_local_supplier"](views, SF_DIR)
    assert _rows(got) == _rows(want)


def test_window_sql_matches_dataframe(views):
    got = views.sql(
        """
        SELECT event_id, user_id, event_type, ts, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT event_id, user_id, event_type, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn <= 3
        """
    )
    want = registry.all_queries()["events_latest_n"](views, SF_DIR)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_keyset_pagination_survives_duplicate_timestamps(spark, sf_dir):
    # the cursor must mirror the full (ts DESC, event_id DESC) order:
    # ts < T alone skips rows sharing the boundary timestamp
    from strava_data_pipeline_spark.api.service import PipelineService
    from strava_data_pipeline_spark.sources.catalog import load_table

    svc = PipelineService(spark, sf_dir)
    all_rows = (
        load_table(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select("ts", "event_id")
        .limit(40)
        .collect()
    )
    boundary = all_rows[19]
    page2 = svc.list_activities_after(
        boundary["ts"], cursor_id=boundary["event_id"], limit=20
    ).collect()
    got = [(r["ts"], r["event_id"]) for r in page2]
    want = [(r["ts"], r["event_id"]) for r in all_rows[20:40]]
    assert got == want, "page 2 must start exactly after the boundary row"
