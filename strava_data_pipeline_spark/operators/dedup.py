"""Deduplication operators over the documents corpus.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup — the core of a
training-data pipeline. All candidate generation is blocked (hash
buckets / LSH bands), never O(n²) over the corpus; the only pairwise
work happens inside buckets, which is the property that survives a
100 TB corpus. Everything is built-in-function DataFrame code — no
Python UDFs anywhere in the hot path.

Determinism contract: integer hashing uses functions/hashing.py's
portable md5-prefix hash so the DuckDB oracles reproduce identical
signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from strava_data_pipeline_spark.functions.hashing import (
    MINHASH_PRIME,
    md5_u32,
    perm_params,
)
from strava_data_pipeline_spark.functions.text import char_ngrams, tokens, word_shingles
from strava_data_pipeline_spark.operators.skew import (
    cap_hot_buckets,
    spread_small_scan,
)

N_PERMS = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERMS // N_BANDS

# Per-bucket membership cap for LSH pair generation (see
# skew.cap_hot_buckets): bounds the quadratic work a degenerate band
# key can concentrate on one reducer. Mirrored verbatim in the DuckDB
# oracles (QUALIFY count(*) OVER bucket <= cap).
MAX_BUCKET = 500


# the split-count guard every explode-heavy operator applies to its
# input scan (moved to skew.py so the similarity tier shares it)
_spread = spread_small_scan


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    only_dups: bool = True,
) -> DataFrame:
    """Exact dedup: md5-hash groupBy; keep the minimum id as canonical.

    One shuffle on the 128-bit content hash; at 100 TB the hash (16
    bytes) shuffles instead of the document bodies. ``only_dups=False``
    returns the full hash→canonical mapping (the keep-list a downstream
    anti-join prunes against), not just the collision groups.
    """
    out = (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).cast("bigint").alias("canonical_doc_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )
    return out.where(F.col("n_copies") > 1) if only_dups else out


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_perms: int = N_PERMS
) -> DataFrame:
    """Per-document minhash signature (n_perms columns ``mh_j``).

    shingle → portable 32-bit hash → universal-hash permutations →
    min per permutation. Documents with fewer than 3 tokens produce no
    shingles and drop out (same as the oracle's unnest).
    """
    params = perm_params(n_perms)
    sh = _spread(df).select(
        F.col(id_col),
        F.explode(word_shingles(tokens(F.col(text_col)))).alias("shingle"),
    ).select(id_col, md5_u32(F.col("shingle")).alias("x"))
    aggs = [
        F.min((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh_{j}")
        for j, (a, b) in enumerate(params)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """LSH banding: docs sharing any band key become candidate pairs;
    est_jaccard = fraction of matching signature components.

    The band join shuffles on (band, key) — collisions only, never the
    cross product. Band buckets larger than ``max_bucket`` docs are
    dropped before the join (observed metric ``minhash_lsh_skew``) so a
    degenerate band key can't re-create the quadratic blowup inside one
    bucket.
    """
    # sig feeds the band explode and both est-jaccard joins; persist so
    # the shingle→hash→16-way min pipeline runs once, not three times.
    # Lifecycle is caller-owned (see minhash_incremental_pairs): loops
    # must clearCache() after materializing each result.
    sig = sig.persist()
    n_perms = n_bands * rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    bands = cap_hot_buckets(bands, ["band", "bkey"], max_bucket, "minhash_lsh_skew")
    a, b_ = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    eq_sum = sum(
        F.when(F.col(f"sa.mh_{j}") == F.col(f"sb.mh_{j}"), 1).otherwise(0)
        for j in range(n_perms)
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.round(eq_sum / F.lit(float(n_perms)), 4).alias("est_jaccard"),
        )
    )


def minhash_incremental_pairs(
    sig: DataFrame,
    new_col: str = "is_new",
    id_col: str = "doc_id",
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    max_bucket: int = MAX_BUCKET,
    persist_sig: bool = True,
    probe_prune: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs for a NEW BATCH against the full corpus
    — the production dedup shape: a 100 TB corpus's band index is built
    once (at scale: read from the stored index, not recomputed), and
    each incoming batch generates candidates from ITS bands only, so
    per-batch work is O(batch × bucket), never O(corpus).

    ``sig`` is a minhash signature frame (minhash_signatures) carrying
    a boolean ``new_col`` marking batch membership. Returns
    ``(new_doc, partner, est_jaccard)`` where ``partner`` is an index
    doc (any id) or an earlier batch doc (lower id) — index always
    wins, within the batch the lower id wins, so every batch doc gets
    a deterministic verdict and index docs are never re-judged.

    Buckets are capped over the FULL band table (index + batch) before
    the batch side splits off, identical to the oracle's QUALIFY —
    a hot band drops for both sides alike.

    ``sig`` feeds the band explode and both est-jaccard joins, so it is
    persisted here by default. The cached frame's lifecycle is CALLER-
    OWNED: a lazily returned result cannot unpersist behind itself, so
    a long-lived session looping this operator (bench loops, services)
    must drop the cache after materializing each result —
    ``spark.catalog.clearCache()`` (what bench.py does per query), or
    pass ``persist_sig=False`` and persist/unpersist the frame itself
    (what the streaming sink does between micro-batches).
    """
    if persist_sig:
        sig = sig.persist()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select(
        F.col(id_col), F.col(new_col), F.explode(band_structs).alias("bk")
    ).select(
        id_col, new_col, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    # Prune the corpus band table to the buckets the BATCH probes,
    # BEFORE the hot-bucket window: a bucket with no batch row can
    # produce no pair (side ``a`` is batch-only), and every batch row
    # is its own probe, so dropping unprobed buckets changes nothing —
    # while the per-bucket counts stay EXACT (the semi-join keeps every
    # corpus row of a probed bucket, so the window still counts
    # index + batch members alike, identical to the unpruned cap).
    # This turns the per-trigger/per-call corpus-side work from a full
    # band-table exchange + sort (the window) into a map-only scan
    # against a broadcast of O(batch) bucket keys — the corpus never
    # shuffles, which is the 100 TB shape (index O(corpus), batch
    # O(trigger)).
    if probe_prune:
        # no .distinct() on the build side: a semi-join only tests
        # containment, so duplicate probe keys are harmless and the
        # dedup exchange inside the broadcast build is pure overhead
        probe_keys = bands.where(F.col(new_col)).select("band", "bkey")
        bands = bands.join(
            F.broadcast(probe_keys), ["band", "bkey"], "left_semi"
        )
    bands = cap_hot_buckets(bands, ["band", "bkey"], max_bucket, "minhash_inc_skew")
    a, b_ = bands.where(F.col(new_col)).alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            # self-pairs must be excluded EXPLICITLY, not implied by the
            # batch/index split: a crash-replayed streaming batch sees
            # its own survivors already in the index under the same ids,
            # and without this guard every one of them would self-match
            # at est 1.0 and be dropped on replay (data loss)
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & (
                ~F.col(f"b.{new_col}")
                | (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("new_doc"),
            F.col(f"b.{id_col}").alias("partner"),
        )
        .distinct()
    )
    n_perms = n_bands * rows_per_band
    # ``new_doc`` is batch-only by construction (side ``a`` of the pair
    # join filters on ``new_col``), so the signature lookup for the
    # judged side never needs the corpus branch — filtering here prunes
    # the union to the batch subtree (one less full-corpus scan per
    # call; value-identical, the equi-join would drop corpus rows
    # anyway)
    sa = sig.where(F.col(new_col)).alias("sa")
    sb = sig.alias("sb")
    eq_sum = sum(
        F.when(F.col(f"sa.mh_{j}") == F.col(f"sb.mh_{j}"), 1).otherwise(0)
        for j in range(n_perms)
    )
    return (
        pairs.join(sa, F.col("new_doc") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("partner") == F.col(f"sb.{id_col}"))
        .select(
            "new_doc",
            "partner",
            F.round(eq_sum / F.lit(float(n_perms)), 4).alias("est_jaccard"),
        )
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash: per-token hash bit votes, weighted by occurrence.

    One explode + one groupBy; the 32 bit-vote sums are plain
    conditional aggregates that stay in codegen.
    """
    tok = _spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).select(id_col, md5_u32(F.col("token")).alias("x"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"v_{i}")
        for i in range(32)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sim = sum(
        F.when(F.col(f"v_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(32)
    )
    return voted.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def simhash_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 32 bits into 4 bytes — any
    pair within hamming ≤ 3 shares at least one byte band (pigeonhole),
    so the band join finds all of them without a cross product. Byte
    bands with more than ``max_bucket`` members are dropped before the
    join (observed metric ``simhash_skew``) — the hot-bucket guard."""
    bands = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("bkey"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    bands = cap_hot_buckets(bands, ["band", "bkey"], max_bucket, "simhash_skew")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash as TWO portable 32-bit halves (``simhash_lo``,
    ``simhash_hi``), each from an independent md5-derived token hash
    (the hi half salts the token with a fixed ``h2:`` prefix).

    Why two halves instead of one 64-bit hash: every bit-vote and
    shift stays inside the exact BIGINT arithmetic BOTH engines share —
    and 64 fingerprint bits fix the 32-bit variant's birthday ceiling
    (random 32-bit fingerprints start colliding at ~80k docs, turning
    hamming≤3 "near-dups" into noise at corpus scale; 2^32× lower odds
    at 64 bits). Same single explode + groupBy plan as 32-bit, just
    64 conditional aggregates.
    """
    tok = _spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).select(
        id_col,
        md5_u32(F.col("token")).alias("x_lo"),
        md5_u32(F.concat(F.lit("h2:"), F.col("token"))).alias("x_hi"),
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"x_{half}"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v_{half}_{i}")
        for half in ("lo", "hi")
        for i in range(32)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    halves = [
        sum(
            F.when(F.col(f"v_{half}_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(32)
        ).cast("bigint").alias(f"simhash_{half}")
        for half in ("lo", "hi")
    ]
    return voted.select(F.col(id_col), *halves)


def simhash64_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 7,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash: 8 byte-bands (4 per half) —
    a pair within hamming ≤ 7 leaves at least one of its 8 bands
    untouched (pigeonhole), so the band join finds every such pair
    without a cross product. Hot bands capped (``simhash64_skew``)."""
    band_structs = [
        F.struct(
            F.lit(4 * h + b).alias("band"),
            F.shiftright(F.col(f"simhash_{half}"), 8 * b)
            .bitwiseAND(F.lit(255))
            .alias("bkey"),
        )
        for h, half in enumerate(("lo", "hi"))
        for b in range(4)
    ]
    bands = sh.select(
        F.col(id_col),
        "simhash_lo",
        "simhash_hi",
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(
        id_col,
        "simhash_lo",
        "simhash_hi",
        F.col("bk.band").alias("band"),
        F.col("bk.bkey").alias("bkey"),
    )
    bands = cap_hot_buckets(bands, ["band", "bkey"], max_bucket, "simhash64_skew")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash_lo").bitwiseXOR(F.col("b.simhash_lo"))
    ) + F.bit_count(F.col("a.simhash_hi").bitwiseXOR(F.col("b.simhash_hi")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


#: docs in the order_by_rarity="auto" decision sample (the statistic is
#: sample-size-invariant: sample dfs shrink with the sample, the D/Ds
#: extrapolation grows by the same factor)
_RARITY_SAMPLE_DOCS = 1024
#: corpus-extrapolated candidate-savings-per-gram-row above which the
#: rarity order's df-count shuffle pays for itself (see docstring)
_RARITY_SAVINGS_THRESHOLD = 6000.0
#: above this many docs the gram-array and gram-df frames are
#: corpus-sized, never broadcast-sized: pin their joins to non-broadcast
#: strategies so AQE's post-shuffle size estimate (compressed bytes —
#: integer gram payloads compress 10-30x) can't pick a broadcast whose
#: in-memory build is GBs. Below the bound the frames are genuinely
#: small and AQE's broadcast is the faster plan — same gate shape as
#: graph.broadcast_adj_max. 50k docs x ~800 grams x 8B ~= 320 MB raw,
#: already past any sane driver budget; measured: the mult=100
#: rehearsal (500k docs, gram order 5) OOMed an 8g driver on a 2 GB
#: broadcast build of exactly these frames before this gate existed.
_HINT_DOCS_BOUND = 50_000


def auto_gram_order(n_docs: int) -> int:
    """Corpus-adaptive character-gram order: the smallest n >= 3 with
    26**n >= 3 * n_docs, capped at 7 (26^7 ~= 8e9 docs).

    Integer arithmetic — no float-log boundary wobble, so the choice
    is exactly reproducible across runs and engines. n=3 up to 5,858
    docs (every provided testdata SF is 500..5000), n=4 up to ~152k,
    n=5 up to ~3.9M (the 500k-doc rehearsal corpus lands here). See
    :func:`ngram_jaccard_pairs` for why the order must grow with the
    corpus (finite gram space saturates -> candidate volume turns
    quadratic by construction)."""
    n, space = 3, 26**3
    while space < 3 * n_docs and n < 7:
        n += 1
        space *= 26
    return n


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    order_by_rarity: bool | str = "auto",
    gram_order: int | str = "auto",
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs, blocked by
    (lang, length-bucket), found via an exact prefix-filtered
    similarity join (PPJoin-style).

    Gram ORDER is corpus-adaptive (``gram_order="auto"``, r6): the
    smallest n >= 3 with 26**n >= 3 * n_docs (capped at 7). Rationale:
    the char-n gram space is FINITE (26**3 ~= 17.6k), and once the
    corpus outgrows it every gram is hot — mean document frequency
    grows linearly with corpus size, prefix-filter selectivity
    collapses, and candidate volume turns quadratic BY SPACE
    EXHAUSTION, not by algorithm (the r6 mult=100 rehearsal measured
    exponent ~1.05 with n pinned at 3: 500k docs over a 17.6k space is
    ~30 occurrences per gram per doc-sized block). Growing the shingle
    with the corpus is the standard web-scale design (Broder's
    shingling uses word-level shingles precisely so the space dwarfs
    the corpus); the rule keeps expected per-gram df bounded, so
    candidate volume — and the exponent — track the TRUE near-dup
    structure instead of space saturation. The rule is a deterministic
    function of exact ``n_docs``, so plans are reproducible; at every
    provided testdata SF (500..5000 docs) it yields n=3, which is what
    the static 3-gram DuckDB oracle checks at sf0.01 — the bump to
    n=5 happens at the 500k-doc rehearsal scale the oracle never sees.
    Pass an int to pin the order explicitly (tests do).

    Grams travel as portable 32-bit hashes (md5_u32 — the same
    cross-engine hash every sketch operator uses): BIGINT sort,
    equi-join, and array_intersect run 5-8× cheaper than 3-char UTF8
    comparisons and the persisted index shrinks ~8×. Jaccard is
    computed over the hashed gram SETS — exact with respect to that
    space, identical in the oracle (which applies the same hash); a
    within-doc collision (~|G|²/2³³ ≈ 4e-5 per doc) merges two grams
    on both engines alike. The minhash/simhash operators estimate
    jaccard far more coarsely, so the trade is strictly better than
    the sketch tier while staying cheaper than raw-string verify.

    Result is IDENTICAL to the naive all-blocked-pairs join over the
    same hashed sets: order each document's grams under a global total
    order, index only the prefix of length |G| - ceil(t*|G|) + 1 — any
    pair with jaccard >= t must share a prefix gram (prefix-filter
    lemma), so nothing is missed. A block of B docs costs O(candidates)
    instead of O(B^2). The jaccard length filter (|Ga| >= t*|Gb|)
    prunes further before verification.

    The lemma holds for ANY total order, so the pair set is identical
    either way — the choice is pure cost, and it is corpus-dependent
    (measured r4, tools/rarity_bench.py + bench-protocol A/B):

    - numeric: zero-shuffle narrow index build. Wins on low-vocabulary
      corpora where gram frequencies are flat — on the stock sf0.1
      corpus (377 distinct grams) it beats rarity 7.8-9.7s vs
      13.3-18.8s single-shot, because the df-count shuffle + sort
      buys no candidate reduction.
    - ``order_by_rarity=True``: orders each prefix rarest-first by
      corpus document frequency (one df-count shuffle + join back).
      Wins when the gram distribution is skewed — 2× on a Zipf
      10k-word corpus (rare grams head the prefixes, hot grams stop
      generating candidates), 18% on the 10× mutated-replication
      corpus.
    - ``"auto"`` (default, r5): decide per-corpus from a cheap sampled
      cost model. A gram row (doc, g) in the prefix index matches
      df(g) other docs, so the expected join fan-out per shuffled row
      under numeric order is ``Σ_g df(g)² / N`` (occurrence-weighted
      mean document frequency); rarity order indexes only each doc's
      rarest grams, collapsing that to the bottom-of-the-distribution
      value (<3% of the numeric figure on every corpus measured). The
      auto statistic is Σdf²/N computed over the grams of the FIRST
      1024 docs (bounded limit+collect, python Counter — driver-side
      because a Spark job for a 1024-doc sample is ~all fixed
      overhead) and extrapolated by ``D/D_sample`` (sample dfs scale
      linearly with corpus size). Calibrated on three
      measured A/Bs (asymmetric-prefix build, warm, local[32]): stock
      sf0.1 stat 3.1e3 → numeric wins 6.7 vs 12.4s; Zipf-vocab stat
      1.3e3 → numeric 30.2 vs 36.9s; 10× mutated-replication stat
      1.3e4 → rarity wins 46.4 vs 57.0s. Threshold 6e3 (geometric
      middle); above it the df-count shuffle pays for itself, and the
      statistic grows with corpus size, so any 100 TB natural corpus
      lands deep in rarity territory — matching the Zipf-at-scale
      intuition, while small/flat corpora skip the extra shuffle.

    Candidate-generation cost (r5): the self-join is size-oriented —
    the pair's SMALLER document is the indexed side and indexes only
    its first ``n - ceil(2t/(1+t)·n) + 1`` grams (any partner is at
    least as large, so required overlap >= 2t/(1+t)·n), while the
    larger probing side keeps the standard ``n - ceil(t·n) + 1``
    prefix. At t=0.5 the indexed side shrinks from n/2 to n/3 — fewer
    index rows, fewer candidate rows, identical pair set (the
    first-shared-gram argument holds for both windows).

    Verification cost (r6 — it was the scaling bottleneck, mult=100
    exponent 1.03): three exact changes, pair set provably unchanged:

    - grams travel as 4-byte ints (md5_u32 − 2³¹, a monotone bijection
      of the u32 space): the verify join — which ships a gram ARRAY
      per candidate pair, the operator's largest byte mover — halves;
    - the pair ``distinct`` became a groupBy that counts each pair's
      shared prefix grams, feeding an aggregated suffix-bound filter
      (derivation at the filter site): candidates whose overlap
      provably can't reach the threshold die BEFORE the array join
      (rehearsal mult=10: 24.4M → 9.7M verified candidates, verify
      stage 2×);
    - the ``auto`` rarity stat samples UNIFORMLY instead of limit(k) —
      a head sample reads one contiguous slice of the corpus and
      extrapolates its dense gram space to all of it, flipping the
      order choice to rarity on corpora where numeric is measured
      1.3-1.7× faster (the mult=100 rehearsal; any source-contiguous
      crawl layout).
    """
    # one exact count feeds both adaptive decisions (gram order +
    # rarity-order extrapolation); parquet row-count is metadata-cheap
    n_docs = (
        df.count() if "auto" in (gram_order, order_by_rarity) else 0
    )
    if gram_order == "auto":
        gram_order = auto_gram_order(n_docs)
    # past the bound, corpus-sized frames must not be broadcast —
    # see _HINT_DOCS_BOUND. The hint changes the physical strategy
    # only; the pair set and the oracle hash are join-order-invariant.
    big_corpus = n_docs > _HINT_DOCS_BOUND
    base = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.col("lang"),
        F.floor(F.col("n_chars") / F.lit(64)).cast("int").alias("len_bucket"),
        # grams as 4-byte ints: md5_u32 shifted by 2^31 — a MONOTONE
        # bijection of the u32 space into int range, so sort order,
        # set sizes and therefore jaccard are untouched while the
        # persisted index and the verify-join payload halve (r6: the
        # verify join ships ~n-gram arrays per candidate pair — at
        # mult=100 that shuffle is the operator's largest byte mover)
        F.array_distinct(
            F.transform(
                char_ngrams(F.col(text_col), gram_order),
                lambda g: (md5_u32(g) - F.lit(2147483648)).cast("int"),
            )
        ).alias("grams"),
    )
    if order_by_rarity == "auto":
        # The stat is DRIVER-SIDE over a bounded ~1024-doc sample: one
        # sampled scan + limit + collect (~300 KB) plus a python
        # Counter pass. The previous Spark-job form (limit →
        # repartition → explode → two chained aggs) cost ~2.5-3s per
        # invocation — almost all fixed codegen/scheduling overhead
        # for a 145k-row job — and sat directly on the headline floor.
        # The sample is UNIFORM (seeded Bernoulli over the whole scan),
        # not limit(k): limit takes the first file chunk, and on a
        # corpus whose vocabulary varies across its span (the r5
        # mult=100 rehearsal — 130 dialects in file order — or any
        # multi-source crawl laid out source-contiguous) a head sample
        # measures ONE slice's dense gram space and extrapolates it to
        # all of them, overestimating Σdf²/N by ~the number of slices
        # (measured: head sample said 5.5e4 → rarity at mult=100, the
        # true uniform stat is ~4e3 → numeric, and numeric is 1.3×
        # faster there). Cost: one text-column scan at sample rate —
        # bounded collect, and the operator's own gram build scans the
        # same column right after, so the marginal IO is a prefix of
        # work already paid. The choice it feeds is pure COST, never
        # correctness: the prefix-filter lemma holds for any total
        # order, so both orders emit the identical pair set (and the
        # oracle hash can't see the difference). Gram semantics mirror
        # functions/text.char_ngrams at the chosen gram_order
        # (lower-cased, distinct n-char substrings, shorter texts →
        # none); the collect is bounded by _RARITY_SAMPLE_DOCS by
        # construction.
        frac = min(1.0, 4.0 * _RARITY_SAMPLE_DOCS / max(n_docs, 1))
        sample = [
            r[0] or ""
            for r in df.select(text_col)
            .sample(fraction=frac, seed=7)
            .limit(_RARITY_SAMPLE_DOCS)
            .collect()
        ]
        from collections import Counter

        dfreq: Counter = Counter()
        for txt in sample:
            low = txt.lower()
            if len(low) >= gram_order:
                dfreq.update(
                    {
                        low[i : i + gram_order]
                        for i in range(len(low) - gram_order + 1)
                    }
                )
        n_rows = sum(dfreq.values())
        if not n_rows:
            order_by_rarity = False
        else:
            v_all = sum(c * c for c in dfreq.values())
            scale = n_docs / max(len(sample), 1)
            fanout_per_row = v_all / n_rows * scale
            order_by_rarity = fanout_per_row >= _RARITY_SAVINGS_THRESHOLD
    if order_by_rarity:
        exploded = base.select(
            "doc", "lang", "len_bucket", F.explode("grams").alias("gram")
        )
        # grams are distinct per doc → count(*) per gram == document freq
        dfreq = exploded.groupBy("gram").agg(F.count("*").alias("gram_df"))
        if big_corpus:
            # gram-df cardinality approaches the gram SPACE (26^order,
            # sized to 3x the corpus by auto_gram_order) — corpus-sized,
            # not dim-sized; shuffle-hash keeps the build per-partition
            dfreq = dfreq.hint("shuffle_hash")
        ordered = (
            exploded.join(dfreq, "gram")
            .groupBy("doc", "lang", "len_bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gram_df", "gram"))),
                    lambda s: s["gram"],
                ).alias("grams"),
                F.count("*").alias("n_grams"),
            )
        )
    else:
        ordered = base.select(
            "doc",
            "lang",
            "len_bucket",
            F.array_sort("grams").alias("grams"),
        ).withColumn("n_grams", F.size("grams").cast("long"))
    # `ordered` feeds three consumers (prefix index + both verify
    # sides); persist so the gram pipeline runs once, not three times.
    # MEMORY_AND_DISK default: a 100 TB run spills instead of OOMing.
    ordered = ordered.persist()
    # Size-oriented asymmetric prefixes (Xiao et al., PPJoin self-join):
    # the pair's smaller doc is the INDEXED side — its partner is at
    # least its size, so required overlap >= ceil(2t/(1+t)·n) and the
    # index prefix shrinks to n − that + 1 (n/3 at t=0.5). The larger
    # PROBING side keeps the symmetric n − ceil(t·n) + 1 prefix (its
    # required overlap is >= ceil(t·n) whenever the length filter
    # holds). The 1e-9 keeps a float-rounded ceil from overshooting at
    # exact integer boundaries — rounding DOWN the required overlap
    # only lengthens a prefix, which is always safe.
    idx_len = (
        F.col("n_grams")
        - F.ceil(
            F.lit(2.0 * threshold / (1.0 + threshold)) * F.col("n_grams")
            - F.lit(1e-9)
        )
        + 1
    ).cast("int")
    probe_len = (
        F.col("n_grams")
        - F.ceil(F.lit(threshold) * F.col("n_grams") - F.lit(1e-9))
        + 1
    ).cast("int")

    def _inv(plen: F.Column) -> DataFrame:
        return ordered.select(
            "doc",
            "lang",
            "len_bucket",
            "n_grams",
            # last prefix gram VALUE (NULL-safe on empty gram arrays,
            # which emit no posexplode rows anyway) — feeds the
            # aggregated suffix-bound filter on the numeric path
            F.get("grams", plen - 1).alias("last_pref"),
            F.posexplode(F.slice("grams", 1, plen)).alias("pos", "gram"),
        )

    a, b = _inv(idx_len).alias("a"), _inv(probe_len).alias("b")
    if big_corpus:
        # both sides of the prefix-index join are the EXPLODED corpus
        # (every doc x its prefix grams) — the largest frames in the
        # plan; a broadcast build of either side is corpus-sized
        a, b = a.hint("merge").alias("a"), b.hint("merge").alias("b")
    # PPJoin positional filter: for a shared gram at sorted positions
    # (i, j), overlap <= min(i, j) + min(n_a - i, n_b - j) — shared
    # grams below the match are bounded by the smaller position, those
    # at/after it by the smaller remaining length. jaccard >= t needs
    # overlap >= ceil(t/(1+t) * (n_a + n_b)), so rows whose bound falls
    # short can't belong to a qualifying pair (every match row of a true
    # pair satisfies the bound — pruning is exact, not approximate).
    # The 1e-9 keeps a float-rounded ceil from over-tightening at exact
    # integer boundaries; the verify step recomputes exact jaccard anyway.
    overlap_needed = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("a.n_grams") + F.col("b.n_grams"))
        - F.lit(1e-9)
    )
    overlap_bound = F.least(F.col("a.pos"), F.col("b.pos")) + F.least(
        F.col("a.n_grams") - F.col("a.pos"),
        F.col("b.n_grams") - F.col("b.pos"),
    )
    # Orientation: a (indexed, short prefix) is the SMALLER side under
    # the (n_grams, doc) lexicographic order — a strict total order, so
    # every unordered pair is generated exactly once; the pair identity
    # is re-canonicalized to doc_a < doc_b afterwards (jaccard is
    # symmetric, so the emitted pair set is unchanged).
    smaller_first = (F.col("a.n_grams") < F.col("b.n_grams")) | (
        (F.col("a.n_grams") == F.col("b.n_grams"))
        & (F.col("a.doc") < F.col("b.doc"))
    )
    match = a.join(
        b,
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & smaller_first
        & (F.col("a.n_grams") >= threshold * F.col("b.n_grams"))
        & (overlap_bound >= overlap_needed),
    )
    if order_by_rarity:
        # rarity arrays sort by (corpus df, gram), so gram VALUES carry
        # no positional meaning and the value-based suffix bound below
        # does not apply — dedup candidates the plain way
        cand = match.select(
            F.least(F.col("a.doc"), F.col("b.doc")).alias("doc_a"),
            F.greatest(F.col("a.doc"), F.col("b.doc")).alias("doc_b"),
        ).distinct()
    else:
        # Aggregated suffix-bound filter (r6, the PPJoin suffix filter
        # at pair granularity). Arrays are value-sorted and distinct;
        # for a pair let m = min(last_pref_a, last_pref_b) and
        # cnt = |prefA ∩ prefB| (= the pair's match-row count):
        #   * every shared gram <= m is <= both last prefix values, so
        #     it lies in BOTH prefixes and is counted by cnt — exactly;
        #   * every shared gram > m lies in the SUFFIX of the side
        #     whose last prefix value is m (<= n_min - pref_len_min of
        #     them), and is an element > m of the other side, which has
        #     at least cnt elements <= m (<= n_other - cnt of them).
        # So overlap <= cnt + min(n_min - pref_min, n_other - cnt); a
        # pair whose bound falls below ceil(t/(1+t)(na+nb)) can NEVER
        # verify — pruning it is exact. Measured at rehearsal mult=10:
        # 24.4M candidates -> 9.7M before the array join, identical
        # 2.03M verified pairs, verify stage 2x faster. The groupBy
        # replaces the old pair distinct — same shuffle, more signal.
        agg = match.groupBy(
            F.col("a.doc").alias("da"),
            F.col("b.doc").alias("db"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
            F.col("a.last_pref").alias("lpa"),
            F.col("b.last_pref").alias("lpb"),
        ).agg(F.count("*").alias("pref_overlap"))
        ia = (
            F.col("na")
            - F.ceil(
                F.lit(2.0 * threshold / (1.0 + threshold)) * F.col("na")
                - F.lit(1e-9)
            )
            + 1
        )
        jb = (
            F.col("nb")
            - F.ceil(F.lit(threshold) * F.col("nb") - F.lit(1e-9))
            + 1
        )
        a_is_min = F.col("lpa") <= F.col("lpb")
        suf_min = F.when(a_is_min, F.col("na") - ia).otherwise(F.col("nb") - jb)
        n_other = F.when(a_is_min, F.col("nb")).otherwise(F.col("na"))
        pair_bound = F.col("pref_overlap") + F.least(
            suf_min, n_other - F.col("pref_overlap")
        )
        pair_needed = F.ceil(
            F.lit(threshold / (1.0 + threshold))
            * (F.col("na") + F.col("nb"))
            - F.lit(1e-9)
        )
        cand = agg.where(pair_bound >= pair_needed).select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
    ga = ordered.select(
        F.col("doc").alias("doc_a"),
        F.col("grams").alias("grams_a"),
        F.col("n_grams").alias("n_a"),
    )
    gb = ordered.select(
        F.col("doc").alias("doc_b"),
        F.col("grams").alias("grams_b"),
        F.col("n_grams").alias("n_b"),
    )
    if big_corpus:
        # the gram-array frames carry the whole corpus's gram payload;
        # sort-merge spills instead of building a multi-GB broadcast
        ga, gb = ga.hint("merge"), gb.hint("merge")
    # grams are DISTINCT per doc, so |union| = n_a + n_b - |intersect|:
    # one array scan per candidate instead of two (array_union dropped)
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / (F.col("n_a") + F.col("n_b") - inter), 4).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_pct: int = 80,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: C(A→B) = |S_A ∩ S_B| /
    |S_A| over distinct word-shingle sets — the doc-inside-doc case
    (quote farms, boilerplate wrappers, page-of-a-book) that symmetric
    jaccard misses because its length filter discards pairs whose sizes
    differ by more than the threshold ratio.

    Plan: one shingle explode; overlap counts via a shingle-keyed
    self-join + pair groupBy (no arrays shuffled, only (doc, 3-word
    shingle) rows); hot shingles capped BEFORE pair generation — a
    boilerplate shingle in B docs would otherwise fan out B² rows.
    Capping removes those shingles from overlap counts while |S_A|
    stays uncapped, so containment is (deterministically) understated
    for boilerplate-heavy docs — the standard trade, mirrored in the
    oracle. The gate is integer cross-multiplication
    (overlap·100 ≥ pct·|S_A|) — no float boundary.
    """
    sh = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(tokens(F.col(text_col)))).alias("shingle"),
    )
    n_sh = sh.groupBy("doc").agg(F.count("*").cast("bigint").alias("n_sh"))
    capped = cap_hot_buckets(sh, ["shingle"], max_bucket)
    a, b = capped.alias("a"), capped.alias("b")
    ov = (
        a.join(b, "shingle")
        .where(F.col("a.doc") != F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").cast("bigint").alias("overlap"))
    )
    return (
        ov.join(n_sh.withColumnRenamed("doc", "doc_a"), "doc_a")
        .where(F.col("overlap") * 100 >= F.lit(threshold_pct) * F.col("n_sh"))
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("overlap") / F.col("n_sh"), 4).alias("containment"),
        )
    )


def doc_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Bottom-k fingerprint sketch: the k smallest shingle hashes per
    document — a compact content signature for fast containment checks."""
    sh = _spread(df).select(
        F.col(id_col),
        F.explode(word_shingles(tokens(F.col(text_col)))).alias("shingle"),
    ).select(id_col, md5_u32(F.col("shingle")).alias("fp"))
    w = Window.partitionBy(id_col).orderBy(F.col("fp").asc())
    return (
        sh.distinct()
        .withColumn("fp_rank", F.row_number().over(w))
        .where(F.col("fp_rank") <= k)
        .select(id_col, F.col("fp_rank").cast("int"), F.col("fp"))
    )
