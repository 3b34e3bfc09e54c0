"""Semantic tests for the r6 LM pack (plans/lm_queries.py):
Kneser-Ney values against a python reference, BPE merge-fold parity
(including chained merges), and split-leakage composition.

Planted corpora are written as real documents.parquet and the registry
queries read them through their normal (spark, sf_dir) entry."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans import lm_queries as M


def _mkdocs(spark, tmpdir, texts):
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return str(tmpdir)


def _kn_reference(texts, d=0.75):
    bigrams = Counter()
    for t in texts:
        toks = t.lower().split()
        bigrams.update(zip(toks, toks[1:]))
    c_left = Counter()
    n1f = Counter()
    n1r = Counter()
    for (a, b), c in bigrams.items():
        c_left[a] += c
        n1f[a] += 1
        n1r[b] += 1
    n_types = len(bigrams)
    out = {}
    for (a, b), c in bigrams.items():
        if c < 2:
            continue
        p = (max(c - d, 0.0) + d * n1f[a] * (n1r[b] * 1.0 / n_types)) / c_left[a]
        out[(a, b)] = (c, c_left[a], n1f[a], n1r[b], round(p, 6))
    return out


class TestKneserNey:
    def test_matches_python_reference(self, spark, tmp_path):
        texts = [
            "san francisco is foggy",
            "san francisco is windy",
            "new york is big",
            "york is new and york is old",
        ]
        sf = _mkdocs(spark, tmp_path, texts)
        got = {
            (r["w1"], r["w2"]): (
                r["c_big"], r["c_left"], r["n1f"], r["n1r"], r["p_kn"]
            )
            for r in M.bigram_kneser_ney(spark, sf).collect()
        }
        assert got == _kn_reference(texts)

    def test_continuation_beats_frequency(self, spark, tmp_path):
        # "francisco" only ever follows "san" (one context) while "is"
        # follows many contexts: for an UNSEEN-ish (c==2 vs high-c)
        # comparison the continuation mass must penalize francisco.
        texts = ["san francisco " * 3, "a is b is c is d is e is f is"]
        sf = _mkdocs(spark, tmp_path, texts)
        rows = {
            (r["w1"], r["w2"]): r for r in M.bigram_kneser_ney(spark, sf).collect()
        }
        fran = rows[("san", "francisco")]
        assert fran["n1r"] == 1  # only one left context ever


def _bpe_reference(texts, rounds=3):
    words = []
    for t in texts:
        words.extend(t.lower().split())
    syms = [list(w) for w in words]
    out = []
    for r in range(1, rounds + 1):
        pairs = Counter()
        for s in syms:
            pairs.update(zip(s, s[1:]))
        if not pairs:
            break
        top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = top
        out.append((r, a, b, cnt))
        new_syms = []
        for s in syms:
            acc = s[:1]
            for x in s[1:]:
                if acc and acc[-1] == a and x == b:
                    acc = acc[:-1] + [acc[-1] + x]
                else:
                    acc.append(x)
            new_syms.append(acc)
        syms = new_syms
    return out


class TestBpeMergeRounds:
    def test_matches_python_reference(self, spark, tmp_path):
        texts = [
            "the theater the thesis there then",
            "other leather weather feather",
            "aaaa aaab abab",
        ]
        sf = _mkdocs(spark, tmp_path, texts)
        got = sorted(
            (r["round"], r["sym_a"], r["sym_b"], r["cnt"])
            for r in M.bpe_merge_rounds(spark, sf).collect()
        )
        assert got == sorted(_bpe_reference(texts))

    def test_chained_merge_left_to_right(self, spark, tmp_path):
        # 'aaaa': after merging (a,a) greedily left-to-right the word
        # becomes [aa, aa] (NOT [a, aa, a] or [aaa, a]); round 2's top
        # pair must then see (aa, aa). The fold's greedy restart
        # (merged symbol can't re-merge with the next char in the same
        # round) is the property pinned here.
        texts = ["aaaa aaaa aaaa xy"]
        sf = _mkdocs(spark, tmp_path, texts)
        got = {
            r["round"]: (r["sym_a"], r["sym_b"], r["cnt"])
            for r in M.bpe_merge_rounds(spark, sf).collect()
        }
        assert got == {
            r: (a, b, c) for r, a, b, c in _bpe_reference(texts)
        }
        # round 1: (a,a) appears 3x per 'aaaa' word = 9; merge leaves
        # [aa, aa] so round 2 sees (aa, aa) exactly 3 times
        assert got[1] == ("a", "a", 9)
        assert got[2] == ("aa", "aa", 3)


class TestSplitLeakage:
    def test_composes_pairs_and_labels(self, spark, tmp_path):
        # 40 docs: 20 near-dup pairs (i, i+20) whose texts differ by
        # one word; hash-split will scatter them across splits, and
        # every cross-split near-dup pair must be reported
        base = (
            "the quick brown fox jumps over the lazy dog near the old "
            "stone bridge while rain falls softly on the quiet village"
        )
        texts = [f"{base} marker{i:02d}" for i in range(20)]
        texts += [f"{base} marker{i:02d} extra" for i in range(20)]
        sf = _mkdocs(spark, tmp_path, texts)
        from strava_data_pipeline_spark.operators import dedup as D
        from strava_data_pipeline_spark.operators.sampling import assign_split
        from strava_data_pipeline_spark.sources.catalog import load_table

        docs = load_table(spark, sf, "documents")
        labels = {
            r["doc_id"]: r["split"] for r in assign_split(docs).collect()
        }
        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(docs).collect()
        }
        expect = {
            (a, b, j, labels[a], labels[b])
            for (a, b), j in pairs.items()
            if labels[a] != labels[b]
        }
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"], r["split_a"], r["split_b"])
            for r in M.split_leakage(spark, sf).collect()
        }
        assert got == expect
        assert len({(a, b) for a, b, *_ in got}) >= 1  # leakage planted
