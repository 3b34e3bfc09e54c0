"""Semantic tests for the r6 traversal pack
(plans/traversal_queries.py): BFS distances against a pure-python BFS,
join-delta algebra against a from-scratch recompute difference, skyline
against an O(n^2) dominance scan, and interval coverage against a
python sweep-line union."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import traversal_queries as T
from strava_data_pipeline_spark.plans.graph_queries import _copurchase_edges
from strava_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


class TestBfsDistance:
    def test_matches_python_bfs(self, spark):
        adj = defaultdict(set)
        for r in _copurchase_edges(spark, SF).collect():
            adj[r["a"]].add(r["b"])
            adj[r["b"]].add(r["a"])
        seeds = [
            r["p_partkey"]
            for r in load_table(spark, SF, "part")
            .where(F.col("p_partkey") % T._BFS_MOD == 1)
            .collect()
        ]
        assert seeds
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            v = q.popleft()
            if dist[v] == T._BFS_ROUNDS:
                continue
            for n in adj[v]:
                if n not in dist:
                    dist[n] = dist[v] + 1
                    q.append(n)
        got = {
            r["partkey"]: r["dist"]
            for r in T.bfs_distance(spark, SF).collect()
        }
        spark.catalog.clearCache()
        assert got == dist

    def test_seed_isolated_part_still_emits_dist_zero(self, spark):
        # seeds are dist-0 rows whether or not they have edges
        got = T.bfs_distance(spark, SF).collect()
        spark.catalog.clearCache()
        zero = {r["partkey"] for r in got if r["dist"] == 0}
        seeds = {
            r["p_partkey"]
            for r in load_table(spark, SF, "part")
            .where(F.col("p_partkey") % T._BFS_MOD == 1)
            .collect()
        }
        assert zero == seeds


class TestJoinDeltaMaintenance:
    def test_equals_recompute_difference(self, spark):
        got = {
            r["custkey"]: (r["delta_rows"], r["delta_rev_e4"])
            for r in T.join_delta_maintenance(spark, SF).collect()
        }
        li = load_table(spark, SF, "lineitem").select(
            "l_orderkey",
            (F.col("l_shipdate") >= F.lit(T._JD_L_CUT).cast("timestamp")).alias(
                "l_new"
            ),
            (
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
            ).alias("r"),
        )
        o = load_table(spark, SF, "orders").select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_orderdate") >= F.lit(T._JD_O_CUT).cast("timestamp")).alias(
                "o_new"
            ),
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)

        def agg(df):
            return {
                r["o_custkey"]: (r["n"], r["rev"])
                for r in df.groupBy("o_custkey")
                .agg(
                    F.count("*").cast("bigint").alias("n"),
                    F.sum("r").cast("bigint").alias("rev"),
                )
                .collect()
            }

        full = agg(j)
        old = agg(j.where(~F.col("l_new") & ~F.col("o_new")))
        want = {}
        for ck, (n, rev) in full.items():
            on, orev = old.get(ck, (0, 0))
            if n - on > 0:
                want[ck] = (n - on, rev - orev)
        assert got == want


class TestSkylinePareto:
    def test_matches_bruteforce_dominance(self, spark):
        parts = [
            (r["p_partkey"], round(r["p_retailprice"] * 100), r["p_size"])
            for r in load_table(spark, SF, "part").collect()
        ]

        def dominated(p):
            _, pc, sz = p
            return any(
                qc <= pc and qs >= sz and (qc < pc or qs > sz)
                for _, qc, qs in parts
            )

        want = {pk for pk, _, _ in (p for p in parts if not dominated(p))}
        got = {r["partkey"] for r in T.skyline_pareto(spark, SF).collect()}
        assert got == want

    def test_equal_point_twins_all_survive(self, spark, tmp_path):
        # two parts with identical (price, size) don't dominate each
        # other (no strict dimension): both must be on the frontier
        d = str(tmp_path / "planted")
        spark.createDataFrame(
            [
                (1, "a a", "B", "T", 10, 5.00),
                (2, "b b", "B", "T", 10, 5.00),
                (3, "c c", "B", "T", 3, 7.00),
            ],
            "p_partkey bigint, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        ).coalesce(1).write.mode("overwrite").parquet(d + "/part.parquet")
        got = {r["partkey"] for r in T.skyline_pareto(spark, d).collect()}
        assert got == {1, 2}


class TestIntervalCoverage:
    def test_matches_python_sweepline(self, spark):
        events = load_table(spark, SF, "events").select(
            "user_id", F.unix_timestamp("ts").cast("bigint").alias("s")
        )
        by_user = defaultdict(list)
        for r in events.collect():
            by_user[r["user_id"]].append((r["s"], r["s"] + T._COV_WIN_SEC))
        want = {}
        for u, ivs in by_user.items():
            ivs.sort()
            islands = []
            for s, e in ivs:
                if islands and s <= islands[-1][1]:
                    islands[-1][1] = max(islands[-1][1], e)
                else:
                    islands.append([s, e])
            want[u] = (len(islands), sum(e - s for s, e in islands))
        got = {
            r["user_id"]: (r["n_islands"], r["covered_sec"])
            for r in T.interval_coverage(spark, SF).collect()
        }
        assert got == want

    def test_coverage_bounds(self, spark):
        for r in T.interval_coverage(spark, SF).collect():
            # union length is at least one window and at most n * window
            assert r["covered_sec"] >= T._COV_WIN_SEC
            assert r["covered_sec"] <= r["n_islands"] * 10**9
