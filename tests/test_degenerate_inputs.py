"""Degenerate-input hardening for the r6 packs: an empty table or a
whitespace-only document is what a stray partition of a 100 TB corpus
actually hands an operator — every query must return an empty (or
degenerate-but-typed) result, never throw.

The oracle gate only exercises sf0.01; these tests pin the edges the
driver's data never reaches (empty aggregations feeding 1-row
broadcasts, argmax-of-nothing merge rounds, graphs with no edges)."""

from __future__ import annotations

import pytest

from strava_data_pipeline_spark.plans import graph_queries as GQ
from strava_data_pipeline_spark.plans import lm_queries as LM
from strava_data_pipeline_spark.plans import tokenizer_queries as TQ


def _empty_docs(spark, tmpdir):
    df = spark.createDataFrame(
        [],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return str(tmpdir)


def _ws_docs(spark, tmpdir):
    rows = [(0, "   ", "en", "src", 3), (1, "", "de", "src", 0)]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return str(tmpdir)


def _empty_lineitem(spark, tmpdir):
    df = spark.createDataFrame(
        [], "l_orderkey bigint, l_partkey bigint, l_shipdate bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/lineitem.parquet")
    return str(tmpdir)


_DOC_QUERIES = [
    LM.bigram_kneser_ney,
    LM.bpe_merge_rounds,
    TQ.wordpiece_vocab,
    TQ.wordpiece_encode,
    TQ.tokenizer_fertility,
]


class TestEmptyCorpus:
    @pytest.mark.parametrize("q", _DOC_QUERIES, ids=lambda q: q.__name__)
    def test_empty_documents_yield_empty_result(self, spark, tmp_path, q):
        sf = _empty_docs(spark, tmp_path)
        assert q(spark, sf).count() == 0

    @pytest.mark.parametrize("q", _DOC_QUERIES, ids=lambda q: q.__name__)
    def test_whitespace_only_documents_yield_empty_result(
        self, spark, tmp_path, q
    ):
        # the tokenizer contract maps whitespace-only text to [''];
        # every word-level builder filters the empty token, so the
        # corpus is empty from the packs' point of view
        sf = _ws_docs(spark, tmp_path)
        assert q(spark, sf).count() == 0


class TestEmptyGraph:
    def test_kcore_on_edgeless_graph(self, spark, tmp_path):
        sf = _empty_lineitem(spark, tmp_path)
        assert GQ.kcore_peel(spark, sf).count() == 0

    def test_degree_histogram_on_edgeless_graph(self, spark, tmp_path):
        sf = _empty_lineitem(spark, tmp_path)
        assert GQ.degree_histogram(spark, sf).count() == 0

    def test_single_order_single_part_has_no_edges(self, spark, tmp_path):
        # one item per order -> no co-purchase pairs at all
        df = spark.createDataFrame(
            [(1, 10, 0), (2, 20, 0)],
            "l_orderkey bigint, l_partkey bigint, l_shipdate bigint",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/lineitem.parquet"
        )
        assert GQ.kcore_peel(spark, str(tmp_path)).count() == 0
        assert GQ.degree_histogram(spark, str(tmp_path)).count() == 0


class TestRetrievalDegenerate:
    """r7 pack edges: empty corpus, no-match corpus, whitespace-only
    text through BM25 / fusion / sampled caps."""

    def test_bm25_empty_corpus(self, spark, tmp_path):
        from strava_data_pipeline_spark.plans import retrieval_queries as R

        sf = _empty_docs(spark, tmp_path)
        assert R.bm25_topk(spark, sf).count() == 0

    def test_bm25_no_matching_terms(self, spark, tmp_path):
        from strava_data_pipeline_spark.plans import retrieval_queries as R

        rows = [(0, "totally unrelated words", "en", "s", 23)]
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        assert R.bm25_topk(spark, str(tmp_path)).count() == 0

    def test_bm25_whitespace_only_corpus(self, spark, tmp_path):
        from strava_data_pipeline_spark.plans import retrieval_queries as R

        sf = _ws_docs(spark, tmp_path)
        assert R.bm25_topk(spark, sf).count() == 0

    def test_fusion_dense_arm_only(self, spark, tmp_path):
        # no lexical matches at all: fusion must still emit the dense
        # arm's top-k with NULL bm25 ranks
        from strava_data_pipeline_spark.plans import retrieval_queries as R

        rows = [
            (i, "unrelated filler words", "en", "s", 22) for i in range(3)
        ]
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        vecs = [(i, [1.0, float(i), 0.0, 0.0], 0) for i in range(3)]
        spark.createDataFrame(
            vecs, "vec_id bigint, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/embeddings.parquet"
        )
        rows_out = R.hybrid_rank_fusion(spark, str(tmp_path)).collect()
        assert len(rows_out) == 2  # vec 0 is the query, excluded
        assert all(r["bm25_rank"] is None for r in rows_out)
        assert all(r["rrf_micro"] > 0 for r in rows_out)

    def test_source_caps_sampled_empty_corpus(self, spark, tmp_path):
        import strava_data_pipeline_spark.plans.llm_queries as L

        sf = _empty_docs(spark, tmp_path)
        assert L.source_caps_sampled(spark, sf).count() == 0


class TestSessionizeBucketedDegenerate:
    def test_empty_events(self, spark, tmp_path):
        from strava_data_pipeline_spark.operators.sessionize import (
            sessionize_bucketed,
        )

        df = spark.createDataFrame(
            [], "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        assert sessionize_bucketed(df).count() == 0

    def test_single_event_is_session_zero(self, spark):
        from datetime import datetime

        from strava_data_pipeline_spark.operators.sessionize import (
            sessionize_bucketed,
        )

        df = spark.createDataFrame(
            [(1, datetime(2024, 1, 1), 7, 1.0)],
            "event_id bigint, ts timestamp, user_id bigint, value double",
        )
        out = sessionize_bucketed(df).collect()
        assert len(out) == 1 and out[0]["session_seq"] == 0
