"""Semantic tests for the r6 rewrite pack (plans/rewrite_queries.py):
block segmentation parity with a python reference, planted-corpus
rewrite outcomes (who survives, who is cut, byte-exact reassembly),
and entropy closed-form values.

The planted corpus is written as a real documents.parquet and the
registry queries read it through their normal (spark, sf_dir) entry —
end-to-end through the same load_table path the driver uses.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import rewrite_queries as R

W = R._BLOCK_W


def _mkdocs(spark, tmpdir, rows):
    """rows = [(doc_id, text)] -> sf_dir with a documents.parquet."""
    df = spark.createDataFrame(
        [
            (i, t, "en", "src", len(t))
            for i, t in rows
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmpdir}/documents.parquet"
    )
    return str(tmpdir)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestBlocks:
    def test_matches_python_reference(self, spark):
        texts = [
            _words("a", 20),          # 2 full blocks + a 4-token tail
            _words("b", 8),           # exactly one block
            "one two three",          # single partial block
            "solo",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = sorted(
            (r["doc_id"], r["blk"], r["block_text"])
            for r in R._blocks(df).collect()
        )
        want = []
        for i, t in enumerate(texts):
            toks = t.lower().split()
            for b in range((len(toks) + W - 1) // W):
                want.append((i, b, " ".join(toks[b * W : (b + 1) * W])))
        assert got == sorted(want)


class TestSpanRewrite:
    def test_first_occurrence_survives(self, spark, tmp_path):
        blk_a = _words("dup", W)
        blk_b = _words("bee", W)
        blk_c = _words("sea", W)
        sf = _mkdocs(
            spark,
            tmp_path,
            [
                (1, f"{blk_a} {blk_b}"),   # A first occurrence (doc 1, blk 0)
                (2, f"{blk_c} {blk_a}"),   # A again -> cut; C survives
                (3, _words("uniq", 11)),   # no duplication -> unchanged
            ],
        )
        out = {
            r["doc_id"]: r
            for r in R.dedup_span_rewrite(spark, sf).collect()
        }
        assert out[1]["pruned_text"] == f"{blk_a} {blk_b}"
        assert out[1]["n_dropped"] == 0
        assert out[2]["pruned_text"] == blk_c
        assert out[2]["n_dropped"] == 1 and out[2]["n_blocks"] == 2
        assert out[3]["pruned_text"] == _words("uniq", 11)
        assert out[3]["n_blocks"] == 2 and out[3]["n_dropped"] == 0

    def test_intra_doc_repeat_cut(self, spark, tmp_path):
        blk = _words("rep", W)
        sf = _mkdocs(spark, tmp_path, [(1, f"{blk} {blk}")])
        row = R.dedup_span_rewrite(spark, sf).collect()[0]
        assert row["pruned_text"] == blk
        assert row["n_blocks"] == 2 and row["n_dropped"] == 1


class TestDecontaminateSpan:
    def test_contaminated_block_cut(self, spark, tmp_path):
        # doc 0 (0 % 97 == 0) is the eval doc; doc 5 quotes an eval
        # 3-shingle inside its SECOND block, doc 6 is clean
        eval_text = "alpha beta gamma delta"
        clean = _words("clean", W)
        dirty = "x1 x2 x3 x4 x5 alpha beta gamma"
        sf = _mkdocs(
            spark,
            tmp_path,
            [
                (0, eval_text),
                (5, f"{clean} {dirty}"),
                (6, _words("pure", W)),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in R.decontaminate_span(spark, sf).collect()
        }
        assert 0 not in out, "eval docs are excluded from the result"
        assert out[5]["pruned_text"] == clean
        assert out[5]["n_cut"] == 1 and out[5]["n_blocks"] == 2
        assert out[6]["pruned_text"] == _words("pure", W)
        assert out[6]["n_cut"] == 0

    def test_fully_contaminated_doc_survives_empty(self, spark, tmp_path):
        eval_text = "alpha beta gamma"
        sf = _mkdocs(
            spark,
            tmp_path,
            [(0, eval_text), (5, "alpha beta gamma pad1 pad2")],
        )
        out = {
            r["doc_id"]: r
            for r in R.decontaminate_span(spark, sf).collect()
        }
        assert out[5]["pruned_text"] == "" and out[5]["n_cut"] == 1


class TestEntropy:
    def test_closed_forms(self, spark, tmp_path):
        sf = _mkdocs(
            spark,
            tmp_path,
            [
                (1, "same same same same"),          # entropy 0
                (2, "a b c d"),                      # uniform -> ln(4)
                (3, "a a b b"),                      # uniform 2 -> ln(2)
            ],
        )
        out = {r["doc_id"]: r for r in R.entropy_score(spark, sf).collect()}
        assert out[1]["entropy"] == 0.0
        assert out[1]["n_distinct"] == 1
        assert out[2]["entropy"] == round(math.log(4), 4)
        assert out[3]["entropy"] == round(math.log(2), 4)

    def test_quantized_terms_are_exact(self, spark, tmp_path):
        # clnc_q9 must equal the python-side quantization exactly —
        # the cross-engine determinism contract
        sf = _mkdocs(spark, tmp_path, [(1, "w w w x x y")])
        row = R.entropy_score(spark, sf).collect()[0]
        want = sum(
            math.floor(c * math.log(c) * 1e9 + 0.5) for c in (3, 2, 1)
        )
        assert row["clnc_q9"] == want
        assert row["n_tokens"] == 6 and row["n_distinct"] == 3
