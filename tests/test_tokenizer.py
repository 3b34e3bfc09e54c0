"""Semantic tests for the r6 tokenizer pack (plans/tokenizer_queries.py):
vocabulary learning + greedy longest-match encoding against a python
reference, and the fertility arithmetic.

Planted corpora are written as real documents.parquet and the registry
queries read them through their normal (spark, sf_dir) entry."""

from __future__ import annotations

from collections import Counter

from strava_data_pipeline_spark.plans import tokenizer_queries as TQ


def _mkdocs(spark, tmpdir, rows):
    """rows: list of (text, lang)."""
    data = [(i, t, lg, "src", len(t)) for i, (t, lg) in enumerate(rows)]
    df = spark.createDataFrame(
        data,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return str(tmpdir)


def _ref_vocab(texts, k=TQ._VOCAB_K, max_sub=TQ._MAX_SUB):
    wf = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                wf[w] += 1
    subs = Counter()
    chars = Counter()
    for w, c in wf.items():
        for ln in range(2, max_sub + 1):
            for i in range(len(w) - ln + 1):
                subs[w[i : i + ln]] += c
        for ch in w:
            chars[ch] += c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return wf, dict(top), dict(chars)


def _ref_encode(w, vocab, max_sub=TQ._MAX_SUB):
    toks = []
    pos = 0
    while pos < len(w):
        for ln in range(max_sub, 0, -1):
            cand = w[pos : pos + ln]
            if len(cand) == ln and (ln == 1 or cand in vocab):
                toks.append(cand)
                pos += ln
                break
    return toks


class TestWordpieceVocab:
    def test_matches_python_reference(self, spark, tmp_path):
        texts = [
            "interchangeable internationalization the theme there",
            "intern inter inert train strain terrain",
        ]
        sf = _mkdocs(spark, tmp_path, [(t, "en") for t in texts])
        _, top, chars = _ref_vocab(texts)
        got_multi = {}
        got_chars = {}
        for r in TQ.wordpiece_vocab(spark, sf).collect():
            (got_chars if r["is_char"] else got_multi)[r["token"]] = r["weight"]
        assert got_multi == top
        assert got_chars == chars

    def test_tie_break_is_lexicographic(self, spark, tmp_path):
        # one word repeated: every substring weight is a multiple of
        # the word count, lots of exact ties -> the top-K cut must be
        # the same deterministic (weight DESC, token ASC) order the
        # oracle uses (here K isn't binding, so ALL substrings appear
        # and the reference comparison pins the full tie group).
        texts = ["abcd abcd abcd"]
        sf = _mkdocs(spark, tmp_path, [(t, "en") for t in texts])
        _, top, _ = _ref_vocab(texts)
        got = {
            r["token"]: r["weight"]
            for r in TQ.wordpiece_vocab(spark, sf).collect()
            if not r["is_char"]
        }
        assert got == top


class TestWordpieceEncode:
    def test_matches_python_reference(self, spark, tmp_path):
        texts = [
            "banana bandana anagram nagging",
            "the then there theme an and band",
        ]
        sf = _mkdocs(spark, tmp_path, [(t, "en") for t in texts])
        wf, vocab, _ = _ref_vocab(texts)
        uses = Counter()
        types = Counter()
        for w, c in wf.items():
            enc = _ref_encode(w, vocab)
            for tok, n in Counter(enc).items():
                uses[tok] += c * n
                types[tok] += 1
        got = {
            r["token"]: (r["n_uses"], r["n_word_types"])
            for r in TQ.wordpiece_encode(spark, sf).collect()
        }
        assert got == {t: (uses[t], types[t]) for t in uses}

    def test_greedy_is_longest_match_first(self, spark, tmp_path):
        # 'aaaa' x3 -> 'aaaa' itself is a vocab entry (length 4 <= max)
        # so the greedy encoder must emit ONE token per word, never
        # [aa, aa] or chars.
        texts = ["aaaa aaaa aaaa"]
        sf = _mkdocs(spark, tmp_path, [(t, "en") for t in texts])
        got = {
            r["token"]: (r["n_uses"], r["n_word_types"])
            for r in TQ.wordpiece_encode(spark, sf).collect()
        }
        assert got == {"aaaa": (3, 1)}


class TestTokenizerFertility:
    def test_per_lang_arithmetic(self, spark, tmp_path):
        rows = [
            ("compression compression", "en"),
            ("zip zap", "de"),
        ]
        sf = _mkdocs(spark, tmp_path, rows)
        texts = [t for t, _ in rows]
        wf, vocab, _ = _ref_vocab(texts)
        enc_len = {w: len(_ref_encode(w, vocab)) for w in wf}
        got = {
            r["lang"]: (r["n_words"], r["n_subwords"], r["fertility"])
            for r in TQ.tokenizer_fertility(spark, sf).collect()
        }
        for lang in ("en", "de"):
            lw = Counter()
            for t, lg in rows:
                if lg == lang:
                    for w in t.lower().split():
                        if w:
                            lw[w] += 1
            n_words = sum(lw.values())
            n_sub = sum(c * enc_len[w] for w, c in lw.items())
            assert got[lang] == (
                n_words,
                n_sub,
                round(n_sub * 1.0 / n_words, 6),
            )
