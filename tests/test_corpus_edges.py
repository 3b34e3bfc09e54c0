"""Planted-fixture edge cases for the corpus-hygiene and vector-search
queries (boilerplate_prune, vocab_oov_rate, kmeans_lloyd, ann_filtered),
routed through the REGISTRY builders against a tmp sf_dir — covering
behaviors the generated corpus can't guarantee to contain (exact
threshold boundaries, all-boilerplate docs, duplicate-vector clusters,
a high-cosine neighbor excluded by metadata)."""

from __future__ import annotations

import pytest

from strava_data_pipeline_spark.plans import registry


def _write_documents(spark, sf, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")


def _write_embeddings(spark, sf, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    df.coalesce(1).write.parquet(f"{sf}/embeddings.parquet")


class TestBoilerplatePlanted:
    @pytest.fixture()
    def sf_dir(self, spark, tmp_path):
        # 'common' in 4/5 docs (80% > 78% → boilerplate); 'rare' in 1.
        # doc 5 consists ONLY of boilerplate → prunes to empty text.
        rows = [
            (1, "common alpha beta", "en", "s", 17),
            (2, "common gamma", "en", "s", 12),
            (3, "common delta rare", "en", "s", 17),
            (4, "epsilon zeta", "en", "s", 12),
            (5, "common common", "en", "s", 13),
        ]
        sf = str(tmp_path / "sf")
        _write_documents(spark, sf, rows)
        return sf

    def test_threshold_and_full_prune(self, spark, sf_dir):
        got = {
            r["doc_id"]: r
            for r in registry.all_queries()["boilerplate_prune"](
                spark, sf_dir
            ).collect()
        }
        assert got[1]["pruned_text"] == "alpha beta"
        assert got[1]["n_removed"] == 1
        assert got[3]["pruned_text"] == "delta rare"  # rare token survives
        assert got[4]["n_removed"] == 0  # no boilerplate present
        assert got[5]["pruned_text"] == "" and got[5]["n_removed"] == 2

    def test_exact_boundary_not_pruned(self, spark, tmp_path):
        # a token in exactly 78% of docs (39/50) must NOT prune —
        # the contract is strict 'greater than'
        rows = [(i, "edge filler%d" % i, "en", "s", 10) for i in range(39)]
        rows += [(i, "filler%d only" % i, "en", "s", 10) for i in range(39, 50)]
        sf = str(tmp_path / "sf_boundary")
        _write_documents(spark, sf, rows)
        got = registry.all_queries()["boilerplate_prune"](spark, sf).collect()
        assert all(r["n_removed"] == 0 for r in got)


class TestVocabOOVPlanted:
    def test_small_vocab_all_covered_and_unique_token(self, spark, tmp_path):
        # corpus vocabulary < K=20 → every repeated token is in-vocab;
        # only doc 3's hapax can be OOV — and it IS in the top-20 too
        # (vocab smaller than K), so oov must be zero everywhere
        rows = [
            (1, "aa bb cc", "en", "s", 8),
            (2, "aa bb", "en", "s", 5),
            (3, "aa zz", "en", "s", 5),
        ]
        sf = str(tmp_path / "sf")
        _write_documents(spark, sf, rows)
        got = {
            r["doc_id"]: r
            for r in registry.all_queries()["vocab_oov_rate"](spark, sf).collect()
        }
        assert got[1]["n_tokens"] == 3
        assert all(r["n_oov"] == 0 for r in got.values())

    def test_oov_counted_beyond_topk(self, spark, tmp_path):
        # 20 heavy tokens fill the vocabulary; doc 21's hapax 'outside'
        # ranks 21st and must count as OOV
        heavy = " ".join(f"t{i:02d}" for i in range(20))
        rows = [(d, heavy, "en", "s", 99) for d in range(1, 4)]
        rows.append((4, "t00 outside", "en", "s", 11))
        sf = str(tmp_path / "sf_topk")
        _write_documents(spark, sf, rows)
        got = {
            r["doc_id"]: r
            for r in registry.all_queries()["vocab_oov_rate"](spark, sf).collect()
        }
        assert got[4]["n_oov"] == 1
        assert abs(got[4]["oov_rate"] - 0.5) < 1e-12
        assert got[1]["n_oov"] == 0


class TestKMeansPlanted:
    def test_duplicate_vectors_collapse_to_init_centroid(self, spark, tmp_path):
        # vecs 8..15 duplicate vec 0 exactly → they assign to cluster 0
        # both rounds; cluster 0's centroid stays vec 0's quantized
        # coords and counts 9 members; clusters 1..7 stay singletons
        base = [0.5] + [0.0] * 63
        rows = [(0, [float(x) for x in base], "a")]
        for cid in range(1, 8):
            v = [0.0] * 64
            v[cid] = -1.0 + 0.25 * cid  # well-separated singleton poles
            rows.append((cid, [float(x) for x in v], "a"))
        for dup in range(8, 16):
            rows.append((dup, [float(x) for x in base], "a"))
        sf = str(tmp_path / "sf")
        _write_embeddings(spark, sf, rows)
        out = registry.all_queries()["kmeans_lloyd"](spark, sf).collect()
        members = {r["cluster_id"]: r["n_members"] for r in out}
        assert members[0] == 9
        assert all(members[c] == 1 for c in range(1, 8))
        c0 = {r["dim"]: r["centroid_micro"] for r in out if r["cluster_id"] == 0}
        assert c0[1] == 500000 and c0[2] == 0


class TestANNFilteredPlanted:
    def test_high_cosine_neighbor_excluded_by_metadata(self, spark, tmp_path):
        # vec 10 is IDENTICAL to query vec 0 (cosine 1.0) but its doc
        # fails the source predicate → must not appear; vec 11 is
        # orthogonal-ish but allowed → it ranks instead
        q = [1.0, 0.5] + [0.0] * 62
        near = list(q)
        other = [0.0, 0.1, 1.0] + [0.0] * 61
        erows = [(i, [float(x) for x in ([0.0] * 63 + [float(i + 1)])], "a") for i in range(8)]
        erows[0] = (0, [float(x) for x in q], "a")
        erows.append((10, [float(x) for x in near], "a"))
        erows.append((11, [float(x) for x in other], "a"))
        drows = [
            (i, "query doc vector", "en", "src0", 10) for i in range(8)
        ]
        drows.append((10, "blocked vector text", "en", "srcX", 10))
        drows.append((11, "allowed vector text", "en", "src1", 10))
        sf = str(tmp_path / "sf")
        _write_embeddings(spark, sf, erows)
        _write_documents(spark, sf, drows)
        got = [
            (r["neighbor_id"], r["rank"])
            for r in registry.all_queries()["ann_filtered"](spark, sf).collect()
            if r["query_id"] == 0
        ]
        ids = {n for n, _ in got}
        assert 10 not in ids  # cosine-1.0 neighbor excluded by metadata
        assert 11 in ids
