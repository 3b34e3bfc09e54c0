"""Text-analysis primitives for the documents table.

All built-in ``pyspark.sql.functions`` — tokenization, n-gram
shingling, language-ID votes, and quality ratios stay JVM-side in
whole-stage codegen. Each primitive has a DuckDB-expressible twin used
by the oracles in plans/llm_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the heuristic language-ID vote.
# (The synthetic corpus is a shared vocabulary, so votes mostly land on
# the fallback — the operator contract is the deterministic rule, which
# both engines replicate verbatim.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "y"),
    "zh": ("de5", "shi4", "le5", "he2"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lower-cased text.

    CONTRACT: empty/whitespace-only text yields ``['']`` — one empty
    token — because split-on-regex does so in BOTH engines (Spark's
    ``split`` and DuckDB's ``string_split_regex`` agree). Every oracle
    pair is written against that shared semantic, so "fixing" one side
    to return ``[]`` would break ~30 hash contracts; downstream ratios
    treat an empty doc as a one-token doc consistently on both sides."""
    return F.split(F.lower(F.trim(text)), "\\s+")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles: the unit for minhash/jaccard dedup.

    Texts with fewer than ``n`` tokens yield an empty array (matching the
    oracle's ``range`` semantics). The ``size >= n`` guard is required:
    an unguarded ``sequence(1, size-n+1)`` on short input is
    ``sequence(1, 0)`` which Spark evaluates with step -1 as ``[1, 0]``,
    and the ``i = 0`` slice then aborts the job.
    """
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the lower-cased text.

    Texts shorter than ``n`` chars yield an empty array — same
    ``sequence(1, 0)`` guard as :func:`word_shingles`, and it keeps the
    cross-engine contract (DuckDB's ``range(1, len-n+2)`` is empty for
    short strings, an unguarded Spark plan would emit a short gram).
    """
    low = F.lower(text)
    return F.when(
        F.length(low) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(low) - (n - 1)),
                lambda i: F.substring(low, i, n),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def marker_hits(toks: Column, lang: str) -> Column:
    """How many tokens are marker stopwords of ``lang``."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def predict_lang(toks: Column) -> Column:
    """Deterministic argmax over marker votes; ties resolve in the fixed
    language order; zero votes → 'und' (undetermined)."""
    votes = {lang: marker_hits(toks, lang) for lang in LANG_MARKERS}
    best = F.greatest(*votes.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((votes[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def ws_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("bigint")


# ---------------------------------------------------------------------------
# PII redaction (corpus hygiene before training).
#
# The synthetic documents table contains no PII (no digits or '@' at
# all). The operator contract is pinned by planted-fixture tests
# (tests/test_text_multimodal.py); the registry query `pii_redact`
# (plans/llm_queries.py) additionally plants deterministic PII spans in
# both engines so its oracle row checks real redactions rather than a
# vacuous corpus-wide zero.
# ---------------------------------------------------------------------------

# Order matters: emails are matched before phone numbers so the digits
# of "user123@x.com" can't be half-claimed by the phone pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d().\-\s]{6,}\d\b", "[PHONE]"),
)


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tokens — all JVM-side ``regexp_replace``, no UDF.
    A chain of three replaces, applied in list order so earlier classes
    consume their text before later (greedier) patterns see it."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> Column:
    """Struct of per-class match counts (email/ipv4/phone), counted on
    the progressively-redacted text exactly as :func:`redact_pii` sees
    it, so the two functions always agree on what was redacted."""
    fields = []
    cur = text
    for name, pat, repl in PII_PATTERNS:
        fields.append(F.regexp_count(cur, F.lit(pat)).cast("bigint").alias(name))
        cur = F.regexp_replace(cur, pat, repl)
    return F.struct(*fields)


# Cleaning passes applied in order by normalize_text. Each is a plain
# (pattern, replacement) regexp_replace — JVM regex, codegen-resident.
# Order matters: control/zero-width stripping happens BEFORE whitespace
# collapse so a stripped char can't leave a double space behind.
NORMALIZE_PATTERNS = [
    # C0/C1 control chars except \t \n (those become whitespace next)
    ("ctrl", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
    # zero-width space/joiners and BOM
    ("zero_width", "[\\u200B\\u200C\\u200D\\uFEFF]", ""),
    # any whitespace run (incl. tab/newline) -> single space
    ("ws_run", "\\s+", " "),
]


def normalize_text(text: Column) -> Column:
    """Canonical cleaned form of raw scraped text: strip control and
    zero-width characters, collapse every whitespace run to one space,
    trim. Pure ``regexp_replace`` chain — the cleaning pass that runs
    before tokenization/dedup in a crawl pipeline. The synthetic corpus
    is already clean (single-spaced printable ASCII), so like
    :func:`redact_pii` this is contract-tested on planted fixtures
    rather than registered as a registry query (its registry twin would
    be vacuously identity)."""
    out = text
    for _, pat, repl in NORMALIZE_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)
