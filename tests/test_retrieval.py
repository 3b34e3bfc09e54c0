"""Semantic tests for the r7 retrieval pack (plans/retrieval_queries.py):
BM25 scoring against a pure-python reference on a planted corpus, and
reciprocal-rank-fusion arithmetic/truncation semantics.

Planted corpora are written as real documents.parquet /
embeddings.parquet and the registry queries read them through their
normal (spark, sf_dir) entry — same harness discipline as
tests/test_graph_pack.py."""

from __future__ import annotations

import math

from strava_data_pipeline_spark.plans import retrieval_queries as R

K1, B = 1.2, 0.75
TERMS = ("hash", "scan", "window")


def _mkcorpus(spark, tmpdir, texts, embeddings=None):
    docs = [
        (i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmpdir}/documents.parquet"
    )
    if embeddings is not None:
        spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in enumerate(embeddings)],
            "vec_id bigint, embedding array<float>, label int",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmpdir}/embeddings.parquet"
        )
    return str(tmpdir)


def _ref_bm25(texts):
    """Python reference: {doc_id: (n_terms, dl, score)} for docs
    matching >= 1 query term, with the query's rounding discipline."""
    toks = [t.lower().strip().split() if t.strip() else [""] for t in texts]
    dls = [len(tk) for tk in toks]
    n = len(texts)
    avgdl = sum(dls) / n
    df = {
        q: sum(1 for tk in toks if q in tk) for q in TERMS
    }
    out = {}
    for i, tk in enumerate(toks):
        contribs = []
        for q in TERMS:
            tf = tk.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            c = idf * (tf * (K1 + 1) / (tf + K1 * (1 - B + B * dls[i] / avgdl)))
            contribs.append(round(c, 6))
        if contribs:
            out[i] = (len(contribs), dls[i], round(sum(contribs), 6))
    return out


class TestBm25:
    def test_scores_match_python_reference(self, spark, tmp_path):
        texts = [
            "hash join beats sort merge",             # 1 term
            "scan scan scan the window",              # 2 terms, tf=3
            "no matching words at all here",          # 0 terms -> absent
            "window hash scan",                       # all 3, short doc
            "a very long document padded " * 10 + "hash",  # long dl
        ]
        sf = _mkcorpus(spark, tmp_path, texts)
        got = {
            r["doc_id"]: (r["n_terms"], r["dl"], r["score"])
            for r in R.bm25_topk(spark, sf).collect()
        }
        assert got == _ref_bm25(texts)

    def test_ranking_rewards_tf_and_penalizes_length(self, spark, tmp_path):
        # same tf=1 for 'hash': the SHORTER doc must score higher
        # (length normalization), and tf=3 beats tf=1 at equal length
        texts = [
            "hash a b c d e f g h i j k l m n o p",
            "hash a",
            "hash hash hash a",
            "filler text with no query words",
        ]
        sf = _mkcorpus(spark, tmp_path, texts)
        rows = R.bm25_topk(spark, sf).collect()
        order = [r["doc_id"] for r in rows]
        assert set(order) == {0, 1, 2}
        score = {r["doc_id"]: r["score"] for r in rows}
        assert score[1] > score[0]          # shorter doc wins at tf=1
        assert score[2] > score[1]          # tf=3 wins at short length

    def test_topk_truncates_to_20_with_id_tiebreak(self, spark, tmp_path):
        # 30 identical docs: identical scores, so the top-20 must be
        # doc_ids 0..19 by the deterministic tiebreak
        texts = ["hash table scan" for _ in range(30)]
        sf = _mkcorpus(spark, tmp_path, texts)
        rows = R.bm25_topk(spark, sf).collect()
        assert sorted(r["doc_id"] for r in rows) == list(range(20))
        assert len({r["score"] for r in rows}) == 1


class TestHybridRankFusion:
    def test_rrf_fuses_both_arms_exactly(self, spark, tmp_path):
        # 4 docs: doc1 strong lexically + nearest to the query vector;
        # doc2 lexical only; doc3 vector only; doc0 is the query vector
        # (excluded from the dense arm by self-match, no query terms).
        texts = [
            "nothing relevant zero",
            "hash scan window hash",
            "hash scan window",
            "irrelevant filler words",
        ]
        vecs = [
            [1.0, 0.0, 0.0, 0.0],
            [0.9, 0.1, 0.0, 0.0],
            [-1.0, 0.0, 0.0, 0.0],
            [0.8, 0.2, 0.0, 0.0],
        ]
        sf = _mkcorpus(spark, tmp_path, texts, embeddings=vecs)
        # the oracle string hard-codes DIM=64; the Spark side is
        # dimension-agnostic, so the planted 4-dim corpus exercises it
        rows = {
            r["doc_id"]: (r["bm25_rank"], r["vec_rank"], r["rrf_micro"])
            for r in R.hybrid_rank_fusion(spark, sf).collect()
        }
        # dense arm ranks by cosine to vec 0: doc1 (0.994) > doc3
        # (0.970) > doc2 (-1); lexical arm: doc1 (tf 2+1+1) > doc2
        assert rows[1][0] == 1 and rows[1][1] == 1
        assert rows[2][0] == 2 and rows[2][1] == 3
        assert rows[3][0] is None and rows[3][1] == 2
        for doc_id, (ra, rv, micro) in rows.items():
            want = 0
            if ra is not None:
                want += round(1e9 / (60 + ra))
            if rv is not None:
                want += round(1e9 / (60 + rv))
            assert micro == want, doc_id
        # fusion order: doc1 (both arms, both rank 1) first
        assert max(rows.values(), key=lambda v: v[2]) == rows[1]

    def test_no_half_boundary_in_rank_range(self):
        # round(1e9/(60+r)) is engine-independent only if no r in 1..50
        # lands on an exact .5: assert it by arithmetic
        for r in range(1, 51):
            num = 2 * 10**9
            d = 60 + r
            assert not (num % d == 0 and (num // d) % 2 == 1), r


class TestSourceCapsSampled:
    """source_caps_sampled must be ROW-IDENTICAL to source_caps (the
    sampled threshold is an exact witness filter, not an estimate) and
    must actually PRUNE when the sample covers K rows of a source."""

    def _mk(self, spark, tmpdir, rows):
        # rows: (doc_id, source, n_chars); text filler keeps the schema
        docs = [(i, "x", "en", s, n) for i, s, n in rows]
        spark.createDataFrame(
            docs,
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmpdir}/documents.parquet"
        )
        return str(tmpdir)

    def _collect(self, spark, fn, sf):
        return sorted(
            (r["doc_id"], r["source"], r["n_chars"], r["rk"])
            for r in fn(spark, sf).collect()
        )

    def test_identical_on_hot_source_with_ties(self, spark, tmp_path):
        import strava_data_pipeline_spark.plans.llm_queries as L

        # hot source: 600 rows, heavy ties straddling the K=15 cut
        # (n_chars cycles 0..49, so the threshold value repeats — the
        # >= keep + doc_id tiebreak discipline is what's under test);
        # small source: 5 rows < K, must survive whole with no pruning
        rows = [(i, "hot", i % 50) for i in range(600)]
        rows += [(1000 + i, "tiny", 10 + i) for i in range(5)]
        sf = self._mk(spark, tmp_path, rows)
        exact = self._collect(spark, L.source_caps, sf)
        sampled = self._collect(spark, L.source_caps_sampled, sf)
        assert sampled == exact
        tiny = [t for t in sampled if t[1] == "tiny"]
        assert len(tiny) == 5

    def test_prune_engages_when_sample_covers_k(self, spark, tmp_path):
        import strava_data_pipeline_spark.plans.llm_queries as L
        from pyspark.sql import functions as F

        rows = [(i, "hot", i % 50) for i in range(600)]
        sf = self._mk(spark, tmp_path, rows)
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n_sample = docs.where(
            F.pmod(F.xxhash64("doc_id"), F.lit(L._SRC_SAMPLE_MOD)) == 0
        ).count()
        assert n_sample >= L._SRC_CAP  # the witness precondition holds
        # rebuild the internal pruned frame: threshold exists -> the
        # window's input must be strictly smaller than the corpus
        w = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
            "source"
        ).orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        thr = (
            docs.select("doc_id", "source", "n_chars")
            .where(
                F.pmod(F.xxhash64("doc_id"), F.lit(L._SRC_SAMPLE_MOD)) == 0
            )
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == L._SRC_CAP)
        )
        assert thr.count() == 1
        t = thr.first()["n_chars"]
        kept = docs.where(F.col("n_chars") >= t).count()
        assert kept < 600  # the pre-drop removes real rows
        # and everything source_caps keeps survives the pre-drop
        top = L.source_caps(spark, sf).agg(F.min("n_chars")).first()[0]
        assert top >= t


class TestCorpusDiagnostics:
    """r7 diagnostics trio: coverage curve, per-source dup rates, and
    arm rank-agreement — python references on planted corpora."""

    def test_token_coverage_curve_exact(self, spark, tmp_path):
        from collections import Counter

        from strava_data_pipeline_spark.plans import lm_queries as LM

        texts = [
            "a a a a b b b c c d",
            "a b c d e",
            "a a e e e",
        ]
        sf = _mkcorpus(spark, tmp_path, texts)
        counts = Counter(w for t in texts for w in t.split())
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(counts.values())
        cum = 0
        want = {}
        for i, (w, c) in enumerate(ranked, 1):
            cum += c
            want[i] = (w, c, cum, cum * 1000000 // total)
        got = {
            r["rank"]: (
                r["term"],
                r["cnt"],
                r["cum_cnt"],
                r["coverage_millionths"],
            )
            for r in LM.token_coverage_curve(spark, sf).collect()
        }
        assert got == want
        assert got[len(ranked)][3] == 1000000  # full curve reaches 100%

    def test_dedup_rate_by_source(self, spark, tmp_path):
        import strava_data_pipeline_spark.plans.llm_queries as L

        # src0: 3 identical docs (2 removals) + 1 unique; src1: all
        # unique; a CROSS-source duplicate of a src0 text lands in
        # src1 — its removal attributes to src1 (higher doc_id loses)
        rows = [
            (0, "dup text", "en", "src0", 8),
            (1, "dup text", "en", "src0", 8),
            (2, "dup text", "en", "src0", 8),
            (3, "unique zero", "en", "src0", 11),
            (4, "solo one", "en", "src1", 8),
            (5, "dup text", "en", "src1", 8),
        ]
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        got = {
            r["source"]: (r["n_docs"], r["n_removed"], r["removal_millionths"])
            for r in L.dedup_rate_by_source(spark, str(tmp_path)).collect()
        }
        assert got["src0"] == (4, 2, 500000)
        assert got["src1"] == (2, 1, 500000)

    def test_rank_agreement_counts(self, spark, tmp_path):
        from strava_data_pipeline_spark.plans import retrieval_queries as R

        # lexical order (by tf): 1 > 2 > 3 ; dense order (cosine to
        # vec 0): 3 > 2 > 1 — a perfect inversion: all pairs discordant
        texts = [
            "no query terms here",
            "hash hash hash",
            "hash hash",
            "hash",
        ]
        vecs = [
            [1.0, 0.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0, 0.0],
            [0.5, 0.5, 0.0, 0.0],
            [0.9, 0.1, 0.0, 0.0],
        ]
        sf = _mkcorpus(spark, tmp_path, texts, embeddings=vecs)
        row = R.retrieval_rank_agreement(spark, sf).collect()[0]
        assert row["n_common"] == 3
        assert row["overlap_at_10"] == 3
        assert row["concordant"] == 0
        assert row["discordant"] == 3

    def test_rank_agreement_empty_intersection(self, spark, tmp_path):
        from strava_data_pipeline_spark.plans import retrieval_queries as R

        # no doc matches any query term -> bm25 arm is empty -> zero
        # common ids, zero pairs; the one-row contract must hold
        texts = ["nothing here", "still nothing", "nope"]
        vecs = [
            [1.0, 0.0, 0.0, 0.0],
            [0.5, 0.5, 0.0, 0.0],
            [0.9, 0.1, 0.0, 0.0],
        ]
        sf = _mkcorpus(spark, tmp_path, texts, embeddings=vecs)
        row = R.retrieval_rank_agreement(spark, sf).collect()[0]
        assert row["n_common"] == 0
        assert row["concordant"] == 0 and row["discordant"] == 0
