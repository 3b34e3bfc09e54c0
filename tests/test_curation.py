"""Semantic tests for the r5 curation pack (plans/curation_queries.py):
planted-graph triangle counts, bloom no-false-negatives, novelty
conservation, classifier/DSIR arithmetic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.operators.graph import triangle_participation
from strava_data_pipeline_spark.plans import curation_queries as C

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a bigint, b bigint"
    )


class TestTriangleParticipation:
    def test_k4_every_node_in_three_triangles(self, spark):
        # K4 has C(4,3)=4 triangles; each node sits in 3 of them
        k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        got = {
            r["node"]: r["n_triangles"]
            for r in triangle_participation(_edges(spark, k4)).collect()
        }
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_path_graph_has_no_triangles(self, spark):
        path = [(i, i + 1) for i in range(6)]
        assert triangle_participation(_edges(spark, path)).count() == 0

    def test_hub_plus_one_closing_edge(self, spark):
        # star hub 0 with leaves 1..5 plus one leaf-leaf edge (1,2):
        # exactly one triangle (0,1,2) — counts 1 for those three only.
        # Exercises the orientation: the hub's edges all point INTO it.
        star = [(0, i) for i in range(1, 6)] + [(1, 2)]
        got = {
            r["node"]: r["n_triangles"]
            for r in triangle_participation(_edges(spark, star)).collect()
        }
        assert got == {0: 1, 1: 1, 2: 1}

    def test_two_disjoint_triangles(self, spark):
        tri2 = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
        got = triangle_participation(_edges(spark, tri2)).collect()
        assert {r["node"] for r in got} == {0, 1, 2, 10, 11, 12}
        assert all(r["n_triangles"] == 1 for r in got)

    def test_broadcast_gate_covers_degree_and_adjacency(self, spark):
        # The degree dim and the adjacency frames are BOTH node-sized,
        # so BOTH must honor broadcast_adj_max: under the bound the
        # plan broadcasts (zero extra exchanges), past it every join
        # degrades to a partitioned strategy — no forced broadcast of
        # an unbounded frame may survive (r5 ADVICE: the ungated
        # degree broadcast would OOM before the adjacency gate fired).
        k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        edges = _edges(spark, k4)
        # disable size-based auto-broadcast so the plan shows only the
        # operator's OWN hint decision (a 6-row frame would otherwise
        # broadcast regardless of the gate)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            small = triangle_participation(edges, broadcast_adj_max=10**6)
            plan_small = small._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan_small
            spark.catalog.clearCache()
            big = triangle_participation(edges, broadcast_adj_max=0)
            plan_big = big._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan_big
            assert "BroadcastNestedLoopJoin" not in plan_big
            # r10: the two ADJACENCY joins must be shuffle-HASH, never
            # sort-merge — SMJ sorts the fat edge+array intermediate
            # and spilled O(m·deg) bytes to death at the uniform
            # mult=100 rehearsal (SPILL_OUT_OF_MEMORY)
            assert plan_big.count("ShuffledHashJoin") >= 2
            # the partitioned-join mode computes the same answer
            want = {0: 3, 1: 3, 2: 3, 3: 3}
            assert {r["node"]: r["n_triangles"] for r in big.collect()} == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.catalog.clearCache()


@pytest.fixture(scope="module")
def bloom_rows(spark):
    return C.decontaminate_bloom(spark, SF).collect()


class TestDecontaminateBloom:
    def test_no_false_negatives(self, bloom_rows):
        # the bloom property: every exact hit IS a bloom hit
        assert bloom_rows
        for r in bloom_rows:
            assert r["bloom_hits"] >= r["exact_hits"], r

    def test_flag_matches_counts(self, bloom_rows):
        for r in bloom_rows:
            assert r["has_false_positive"] == (
                r["bloom_hits"] > r["exact_hits"]
            )

    def test_eval_docs_excluded(self, bloom_rows):
        assert all(r["doc_id"] % 97 != 0 for r in bloom_rows)

    def test_exact_hits_agree_with_decontaminate(self, spark):
        # the exact column must equal the broadcast-set scrub's n_shared
        from strava_data_pipeline_spark.plans.llm_queries import decontaminate

        exact = {
            r["doc_id"]: r["n_shared"]
            for r in decontaminate(spark, SF).collect()
        }
        for r in C.decontaminate_bloom(spark, SF).collect():
            assert exact[r["doc_id"]] == r["exact_hits"]


class TestNgramNovelty:
    def test_novel_counts_conserve_distinct_shingles(self, spark):
        # each distinct corpus shingle has exactly one first occurrence:
        # sum(n_novel) == corpus-wide distinct shingle count
        from strava_data_pipeline_spark.functions import text as T
        from strava_data_pipeline_spark.functions.hashing import md5_u32
        from strava_data_pipeline_spark.sources.catalog import load_table

        rows = C.ngram_novelty(spark, SF).collect()
        total_novel = sum(r["n_novel"] for r in rows)
        distinct_shingles = (
            load_table(spark, SF, "documents")
            .select(
                F.explode(
                    T.word_shingles(T.tokens(F.col("text")))
                ).alias("s")
            )
            .select(md5_u32(F.col("s")).alias("h"))
            .distinct()
            .count()
        )
        assert total_novel == distinct_shingles
        for r in rows:
            assert 0 <= r["n_novel"] <= r["n_shingles"]


class TestClassifierScore:
    def test_score_and_gate_derive_from_exact_sum(self, spark):
        rows = C.classifier_quality_score(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["keep"] == (r["sum_w_milli"] > 0)
            # EXACT equality: score_q6 is integer floor(sum*1000/n) via
            # the shifted DIV (the double round-to-6 it replaced
            # diverged cross-engine at a half-ulp boundary)
            num = r["sum_w_milli"] * 1000
            assert r["score_q6"] == num // r["n_tokens"]  # python // floors

    def test_deterministic(self, spark):
        a = {
            r["doc_id"]: r["sum_w_milli"]
            for r in C.classifier_quality_score(spark, SF).collect()
        }
        b = {
            r["doc_id"]: r["sum_w_milli"]
            for r in C.classifier_quality_score(spark, SF).collect()
        }
        assert a == b


class TestDsirWeights:
    def test_target_source_excluded_and_quantized(self, spark):
        from strava_data_pipeline_spark.sources.catalog import load_table

        rows = C.dsir_weights(spark, SF).collect()
        docs = {
            r["doc_id"]: r["source"]
            for r in load_table(spark, SF, "documents").collect()
        }
        assert rows
        for r in rows:
            assert docs[r["doc_id"]] != "src0"
            assert abs(r["logw"] - round(r["logw_q4"] / 10000, 4)) < 1e-9

    def test_covers_every_raw_doc(self, spark):
        # tokens() yields [''] even for empty text, so every raw doc
        # has >= 1 token occurrence and must be scored
        from strava_data_pipeline_spark.sources.catalog import load_table

        n_raw = (
            load_table(spark, SF, "documents")
            .where(F.col("source") != "src0")
            .count()
        )
        assert C.dsir_weights(spark, SF).count() == n_raw


class TestBpePairCounts:
    def test_rank_contract(self, spark):
        rows = C.bpe_pair_counts(spark, SF).collect()
        assert 0 < len(rows) <= C._BPE_TOPK
        by_rank = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in by_rank] == list(range(1, len(rows) + 1))
        for prev, cur in zip(by_rank, by_rank[1:]):
            assert prev["cnt"] > cur["cnt"] or (
                prev["cnt"] == cur["cnt"] and prev["pair"] < cur["pair"]
            )
        assert all(len(r["pair"]) == 2 for r in rows)


class TestDomainKl:
    def test_token_mass_conserved(self, spark):
        from strava_data_pipeline_spark.functions import text as T
        from strava_data_pipeline_spark.sources.catalog import load_table

        rows = C.domain_kl(spark, SF).collect()
        total = (
            load_table(spark, SF, "documents")
            .select(F.size(T.tokens(F.col("text"))).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        assert sum(r["n_tokens"] for r in rows) == total
        for r in rows:
            assert abs(r["kl"] - round(r["kl_q9"] / 1e9, 6)) < 1e-9


class TestEmbeddingPowerIteration:
    def test_matches_numpy_integer_recurrence(self, spark):
        # independent reimplementation of the exact integer recurrence
        # in numpy (object dtype = unbounded Python ints, no float
        # drift) — the Spark plan must reproduce it bit-for-bit
        import numpy as np
        import pandas as pd

        from strava_data_pipeline_spark.sources.catalog import load_table

        pdf = (
            load_table(spark, SF, "embeddings")
            .select("vec_id", "embedding")
            .toPandas()
            .sort_values("vec_id")
        )
        import hashlib

        def u32(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        def tdiv(x: int, y: int) -> int:
            # truncation toward zero: the engines' (x - (x % y)) // y
            # identity uses C-style % (dividend sign); Python's % takes
            # the divisor's sign, so spell truncation explicitly
            return -((-x) // y) if x < 0 else x // y

        Q = np.array(
            [
                [int(np.floor(float(v) * 1_000_000 + 0.5)) for v in row]
                for row in pdf["embedding"]
            ],
            dtype=object,
        )
        w = np.array(
            [u32(f"pw#{d}") % 2001 - 1000 for d in range(1, 65)], dtype=object
        )
        for _ in range(2):
            s = Q @ w
            sp = np.array([tdiv(int(x), 65536) for x in s], dtype=object)
            u = Q.T @ sp
            m = max(max(abs(int(x)) for x in u), 1)
            w = np.array([tdiv(int(x) * 1000, m) for x in u], dtype=object)
        expect = dict(zip(pdf["vec_id"], Q @ w))
        got = {
            r["vec_id"]: r["proj_q"]
            for r in C.embedding_power_iteration(spark, SF).collect()
        }
        assert got == {k: int(v) for k, v in expect.items()}


class TestMinhashErrorEval:
    def test_error_is_consistent_and_bounded(self, spark):
        rows = C.minhash_error_eval(spark, SF).collect()
        spark.catalog.clearCache()  # minhash_lsh_pairs persists sig
        assert rows
        for r in rows:
            assert 0.0 <= r["est_jaccard"] <= 1.0
            assert 0.0 <= r["exact_jaccard"] <= 1.0
            assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1.1e-4


class TestCorpusShardPlan:
    """Token-budget shard planner (r8, row 208): boundary-doc spill
    bound and conservation, through the real two-phase plan."""

    def test_conservation_and_size_bounds(self, spark, sf_dir):
        from strava_data_pipeline_spark.functions import text as T
        from strava_data_pipeline_spark.plans.curation_queries import (
            _SHARD_TARGET,
            corpus_shard_plan,
        )
        from strava_data_pipeline_spark.sources.catalog import load_table

        from pyspark.sql import functions as F

        plan = corpus_shard_plan(spark, sf_dir).collect()
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select(
            F.size(T.tokens(F.col("text"))).cast("bigint").alias("n")
        )
        total, max_doc, n_docs = tok.agg(
            F.sum("n"), F.max("n"), F.count("*")
        ).first()
        # every doc lands in exactly one shard; every token is counted
        assert sum(r["n_docs"] for r in plan) == n_docs
        assert sum(r["n_tokens"] for r in plan) == total
        # shard ids are a dense prefix 0..k-1
        ids = sorted(r["shard_id"] for r in plan)
        assert ids == list(range(len(ids)))
        # split-at-document-boundary bound: every shard except the last
        # holds > target - max_doc tokens, and none exceeds
        # target + max_doc - 1
        by_id = {r["shard_id"]: r for r in plan}
        for sid in ids:
            r = by_id[sid]
            assert r["n_tokens"] <= _SHARD_TARGET + max_doc - 1
            if sid != ids[-1]:
                assert r["n_tokens"] > _SHARD_TARGET - max_doc


class TestQualityCalibration:
    """Per-source quantile calibration (r8, row 206): the fairness
    property the raw-threshold filter lacks, plus the single-doc edge
    the synthetic corpus never exercises."""

    def test_each_source_keeps_about_half(self, spark, sf_dir):
        from strava_data_pipeline_spark.plans.curation_queries import (
            quality_calibration,
        )

        rows = quality_calibration(spark, sf_dir).collect()
        by_src: dict[str, list] = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src) > 1
        for src, rs in by_src.items():
            n = len(rs)
            kept = sum(1 for r in rs if r["keep"])
            if n == 1:
                assert kept == 1
                continue
            # exact boundary: (rank-1)*1e6 // (n-1) >= 5e5
            # <=> 2*(rank-1) >= n-1 <=> rank-1 >= ceil((n-1)/2) = n//2
            expect = n - n // 2
            assert kept == expect, (src, n, kept, expect)
            # ranks are a permutation of 1..n
            assert sorted(r["src_rank"] for r in rs) == list(range(1, n + 1))

    def test_single_doc_source_pins_full_rank(self, spark, tmp_path):
        import shutil

        from strava_data_pipeline_spark.plans.curation_queries import (
            quality_calibration,
        )

        from pyspark.sql import functions as F  # noqa: F401

        # a planted sf-dir whose documents table has ONE doc in one
        # source and three in another: the n_src == 1 branch must pin
        # pr_u6 = 1e6 / keep = TRUE instead of dividing by zero
        src = str(tmp_path / "mini")
        import os

        os.makedirs(src)
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma", "en", "solo", 16),
                (2, "a b", "en", "many", 3),
                (3, "c d e f g h", "en", "many", 11),
                (4, "i j k l", "en", "many", 7),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.parquet(f"{src}/documents.parquet")
        rows = {r["doc_id"]: r for r in quality_calibration(spark, src).collect()}
        assert rows[1]["pr_u6"] == 1_000_000 and rows[1]["keep"]
        many = [rows[i] for i in (2, 3, 4)]
        assert sorted(r["src_rank"] for r in many) == [1, 2, 3]
        shutil.rmtree(src, ignore_errors=True)
