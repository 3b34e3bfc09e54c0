"""Semantic tests for the r6 ops pack (plans/ops_queries.py):
equi-depth balance of the range-partition planner, additive-merge
exactness of incremental view maintenance, linkage completeness of the
fuzzy dictionary match (plus a Spark/DuckDB levenshtein parity pin),
weighted-sample determinism and rate, retrieval-metric invariants, and
table-stats conservation against direct per-column aggregates."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import ops_queries as O
from strava_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


class TestRangePartitionPlan:
    def test_boundaries_are_balanced_and_monotonic(self, spark):
        rows = sorted(
            O.range_partition_plan(spark, SF).collect(),
            key=lambda r: r["bucket"],
        )
        n = (
            load_table(spark, SF, "lineitem").count()
        )
        b = O._RANGE_B
        assert [r["bucket"] for r in rows] == list(range(1, b))
        # boundary values strictly increase with bucket id
        vals = [r["upper_cents"] for r in rows]
        assert vals == sorted(vals) and len(set(vals)) == len(vals)
        for r in rows:
            k = r["bucket"]
            # cum_rows is the FIRST cumulative count reaching k*N/B:
            # it is >= the target, and the previous value (cum - its own
            # group) is < target — verified via the defining inequality
            assert r["cum_rows"] * b >= k * n

    def test_bucket_assignment_splits_within_one_value_group(self, spark):
        # every row of the fact table falls in exactly one range:
        # count rows <= each boundary and check the equi-depth property
        # within the granularity of a single duplicated value group
        rows = sorted(
            O.range_partition_plan(spark, SF).collect(),
            key=lambda r: r["bucket"],
        )
        li = load_table(spark, SF, "lineitem").select(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v")
        )
        n = li.count()
        b = O._RANGE_B
        first = rows[0]
        got = li.where(F.col("v") <= first["upper_cents"]).count()
        assert got == first["cum_rows"]
        assert got >= n / b  # at least its equi-depth share


class TestViewDeltaMaintenance:
    def test_additive_merge_is_exact(self, spark):
        rows = O.view_delta_maintenance(spark, SF).collect()
        assert rows, "delta slice is empty — cutoff no longer splits orders"
        for r in rows:
            assert r["new_rev_e4"] == r["old_rev_e4"] + r["delta_rev_e4"]
            assert r["delta_items"] >= 1

    def test_matches_full_recompute(self, spark):
        # the maintained view must equal a from-scratch recompute over
        # ALL rows, for every customer the delta touches
        out = {
            r["custkey"]: r["new_rev_e4"]
            for r in O.view_delta_maintenance(spark, SF).collect()
        }
        li = load_table(spark, SF, "lineitem").select(
            "l_orderkey",
            (
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
            ).alias("r"),
        )
        orders = load_table(spark, SF, "orders")
        full = {
            r["o_custkey"]: r["rev"]
            for r in li.join(
                orders, li.l_orderkey == orders.o_orderkey
            )
            .groupBy("o_custkey")
            .agg(F.sum("r").cast("bigint").alias("rev"))
            .collect()
        }
        for ck, rev in out.items():
            assert full[ck] == rev


class TestFuzzyDictMatch:
    def test_levenshtein_parity_with_duckdb(self, spark):
        cases = [
            ("small ring", "small rng"),
            ("red widget", "red widgets"),
            ("ab", "ba"),
            ("", "abc"),
            ("same", "same"),
            ("hot gear", "hot bear"),
        ]
        df = spark.createDataFrame(cases, "a string, b string")
        got = {
            (r["a"], r["b"]): r["d"]
            for r in df.select(
                "a", "b", F.levenshtein("a", "b").alias("d")
            ).collect()
        }
        con = duckdb.connect()
        for a, b in cases:
            want = con.execute(
                "SELECT levenshtein(?, ?)", [a, b]
            ).fetchone()[0]
            assert got[(a, b)] == want, (a, b)

    def test_every_probe_finds_its_origin(self, spark):
        # each probe is name-with-one-deletion, so its origin name must
        # appear among its matches at distance exactly 1 (or 0 when the
        # deletion collapses to another valid name)
        part = load_table(spark, SF, "part")
        origin = {
            r["p_partkey"]: r["p_name"]
            for r in part.where(F.col("p_partkey") % 97 == 1).collect()
        }
        assert origin, "probe set empty at this SF"
        matches: dict[int, set[str]] = {}
        for r in O.fuzzy_dict_match(spark, SF).collect():
            matches.setdefault(r["probe_id"], set()).add(r["match_name"])
            assert r["dist"] <= 1
        for pid, name in origin.items():
            assert name in matches.get(pid, set()), (pid, name)


class TestWeightedSample:
    def test_deterministic_and_rate_bounded(self, spark):
        a = {r["doc_id"] for r in O.weighted_sample(spark, SF).collect()}
        b = {r["doc_id"] for r in O.weighted_sample(spark, SF).collect()}
        assert a == b
        n_docs = load_table(spark, SF, "documents").count()
        # expected inclusion rate is E[w]/CAP <= 1; just pin non-trivial
        # and non-total
        assert 0 < len(a) < n_docs

    def test_ht_weights_are_exact_rationals(self, spark):
        for r in O.weighted_sample(spark, SF).collect():
            assert r["ht_num"] == O._WS_CAP
            assert 1 <= r["ht_den"] <= O._WS_CAP
            assert r["w"] == r["ht_den"]


class TestAnnMrrNdcg:
    def test_metric_invariants(self, spark):
        rows = O.ann_mrr_ndcg(spark, SF).collect()
        assert len(rows) == 8  # one per query vector
        for r in rows:
            assert 0 <= r["first_hit_rank"] <= O._NDCG_K
            assert 0 <= r["dcg_e9"] <= r["idcg_e9"] == O._IDCG
            assert 0.0 <= r["ndcg"] <= 1.0
            if r["first_hit_rank"] == 0:
                assert r["rr_e9"] == 0 and r["dcg_e9"] == 0
            else:
                assert r["rr_e9"] == O._RRS[r["first_hit_rank"] - 1]
                # the first hit alone contributes its gain
                assert r["dcg_e9"] >= O._GAINS[r["first_hit_rank"] - 1]

    def test_gain_tables_are_shared_constants(self):
        # the literal tables embedded in the oracle must be the ones
        # the Spark side uses (a drift here silently skews both sums)
        assert str(O._GAINS[1]) in O._MRR_ORACLE
        assert str(O._RRS[2]) in O._MRR_ORACLE
        assert str(O._IDCG) in O._MRR_ORACLE


class TestTableStats:
    def test_row_conservation_and_direct_aggregates(self, spark):
        li = load_table(spark, SF, "lineitem")
        n = li.count()
        rows = {r["col_name"]: r for r in O.table_stats(spark, SF).collect()}
        assert set(rows) == {c for c, _, _ in O._LI_CANON}
        for c, r in rows.items():
            assert r["n_rows"] == n, c
            assert r["n_nulls"] == 0, c
            assert 1 <= r["n_distinct"] <= n, c
            assert r["min_val"] <= r["max_val"], c
        # spot-check NDV against a direct distinct count
        assert (
            rows["l_returnflag"]["n_distinct"]
            == li.select("l_returnflag").distinct().count()
        )
        assert (
            rows["l_orderkey"]["n_distinct"]
            == li.select("l_orderkey").distinct().count()
        )

    def test_canonical_encoding_preserves_numeric_order(self, spark):
        # zero-padded cents: string min/max must equal the numeric ones
        li = load_table(spark, SF, "lineitem")
        rows = {r["col_name"]: r for r in O.table_stats(spark, SF).collect()}
        lo, hi = li.select(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")),
            F.max(F.round(F.col("l_extendedprice") * 100).cast("bigint")),
        ).first()
        assert int(rows["l_extendedprice"]["min_val"]) == lo
        assert int(rows["l_extendedprice"]["max_val"]) == hi
