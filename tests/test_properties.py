"""Property-based tests (hypothesis): merge-operator laws and
pure-function contracts."""

from __future__ import annotations

import re
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from strava_data_pipeline_spark.functions.hashing import MINHASH_PRIME, perm_params
from strava_data_pipeline_spark.functions.text import BPE_TOKEN_RE
from strava_data_pipeline_spark.operators.multimodal import fake_decode
from strava_data_pipeline_spark.operators.similarity import plane_literals
from strava_data_pipeline_spark.operators.upsert import merge_latest_wins

# ---------------------------------------------------------------------------
# pure functions — cheap, many examples
# ---------------------------------------------------------------------------


def test_perm_params_deterministic_odd_in_range():
    p1, p2 = perm_params(64), perm_params(64)
    assert p1 == p2 and len(set(p1)) == 64
    for a, b in p1:
        assert a % 2 == 1  # odd multiplier → permutation mod 2^31-1
        assert 0 < a < MINHASH_PRIME and 0 <= b < MINHASH_PRIME


def test_plane_literals_deterministic_bounded():
    pls = plane_literals()
    assert pls == plane_literals()
    assert all(-1.0 <= x <= 1.0 for row in pls for x in row)


@given(st.binary(max_size=4096))
@settings(max_examples=200)
def test_fake_decode_histogram_partitions_bytes(payload):
    d = fake_decode(payload)
    assert d["n_bytes"] == len(payload)
    assert sum(d["hist"]) == len(payload)
    if payload:
        assert 0 <= d["mean_byte"] <= 255


# ---------------------------------------------------------------------------
# merge laws — one Spark job per example, so few examples
# ---------------------------------------------------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # key (collisions likely)
        st.integers(min_value=0, max_value=100),    # version
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=0,
    max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, ver bigint, value double") \
        if rows else spark.createDataFrame([], "id bigint, ver bigint, value double")


@given(base=_rows, upd=_rows)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_latest_wins_laws(spark, base, upd):
    b, u = _df(spark, base), _df(spark, upd)
    merged = merge_latest_wins(b, u, keys=["id"], order_by=["ver"])
    out = merged.collect()
    # one row per key, and it carries the max version present for the key
    by_key = {}
    for r in out:
        assert r["id"] not in by_key, "duplicate key survived merge"
        by_key[r["id"]] = r
    all_rows = base + upd
    for key in {r[0] for r in all_rows}:
        assert key in by_key
        assert by_key[key]["ver"] == max(v for k, v, _ in all_rows if k == key)
    # idempotence: re-applying the same updates changes nothing
    again = merge_latest_wins(merged, u, keys=["id"], order_by=["ver"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out))


# ---------------------------------------------------------------------------
# cross-engine tokenizer contract: Spark regexp_count == Python re
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + " .,;!?-—äöüß", max_size=80),
    min_size=1,
    max_size=30,
)


@given(texts=_texts)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_bpe_token_count_matches_python_reference(spark, texts):
    from pyspark.sql import functions as F

    from strava_data_pipeline_spark.functions.text import bpe_token_count

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["n"] for r in df.select(bpe_token_count(F.col("text")).alias("n")).collect()
    ]
    want = [len(re.findall(BPE_TOKEN_RE, t)) for t in texts]
    assert got == want


# ---------------------------------------------------------------------------
# connected components == union-find reference on random graphs
# ---------------------------------------------------------------------------

_edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


def _uf_components(pairs):
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@given(pairs=_edge_lists)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark, pairs):
    from strava_data_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
    got = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert got == _uf_components(pairs)


# ---------------------------------------------------------------------------
# CDF fold law: incremental rollup == full recompute for ANY edit script
# ---------------------------------------------------------------------------

_snap = st.dictionaries(
    keys=st.integers(0, 12),  # event_id — overlap between versions likely
    values=st.tuples(
        st.integers(1, 3),  # day-of-month (groups move between days)
        st.sampled_from(["run", "ride"]),
        st.integers(0, 10000),  # value in exact cents
    ),
    max_size=10,
)


@given(v1=_snap, v2=_snap)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_cdf_fold_equals_recompute(spark, v1, v2):
    """For arbitrary before/after snapshots (any mix of inserts,
    deletes, value updates, and day/type-moving updates — including
    empty sides), folding snapshot_diff deltas into the v1 rollup must
    reproduce the v2 recompute exactly (BIGINT cents, no float slack)."""
    import tempfile
    from datetime import datetime as dt

    from strava_data_pipeline_spark.sources import versioned as V
    from strava_data_pipeline_spark.streaming import cdf

    root = tempfile.mkdtemp(prefix="cdfprop") + "/store"
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )

    def mk(d):
        rows = [
            (k, dt(2024, 1, day), 7, typ, cents / 100.0)
            for k, (day, typ, cents) in sorted(d.items())
        ]
        return spark.createDataFrame(rows, schema)

    V.commit_snapshot(mk(v1), root)
    V.commit_snapshot(mk(v2), root)
    base = cdf.events_rollup_of(V.read_snapshot(spark, root, 1))
    inc = cdf.apply_rollup_delta(
        base,
        cdf.rollup_delta_from_cdf(
            V.snapshot_diff(spark, root, 1, 2, key="event_id")
        ),
    )
    full = cdf.events_rollup_of(V.read_snapshot(spark, root, 2))
    key = lambda r: (str(r["p_day"]), r["event_type"])  # noqa: E731
    assert {key(r): (r["n_events"], r["value_cents"]) for r in inc.collect()} == {
        key(r): (r["n_events"], r["value_cents"]) for r in full.collect()
    }


_vocab = ["alpha", "brown", "cedar", "delta", "ember", "frost", "grove", "haze"]
_doc_texts = st.lists(
    st.lists(st.sampled_from(_vocab), min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=8,
)


@given(texts=_doc_texts, batch_mask=st.integers(min_value=1, max_value=255))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_incremental_pairs_equal_batch_slice_of_full(spark, texts, batch_mask):
    """minhash_incremental_pairs must find EXACTLY the batch-involving
    slice of the full LSH pair set (same bands, same caps, same est):
    oriented (judged=new_doc, partner), index wins, lower id wins
    in-batch, never a self-pair — for arbitrary corpora and arbitrary
    batch membership."""
    from pyspark.sql import functions as F

    from strava_data_pipeline_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    is_new = {i: bool((batch_mask >> (i % 8)) & 1) for i, _ in rows}
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sig = minhash_signatures(df)
    sig_flagged = sig.withColumn(
        "is_new",
        F.col("doc_id").isin([i for i, v in is_new.items() if v]),
    )
    inc = {
        (r["new_doc"], r["partner"]): r["est_jaccard"]
        for r in minhash_incremental_pairs(sig_flagged).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(sig).collect()
    }
    expected = {}
    for (a, b), est in full.items():  # a < b by construction
        if is_new[b]:
            expected[(b, a)] = est  # judged against lower id / index
        elif is_new[a]:
            expected[(a, b)] = est  # judged against an index partner
    assert inc == expected
    assert all(j != p for j, p in inc)


# ---------------------------------------------------------------------------
# triangle participation: degree-ordered edge-iterator == brute force
# ---------------------------------------------------------------------------


def _brute_triangle_counts(pairs):
    """O(n^3) reference: count, per node, the triangles it belongs to."""
    import itertools

    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        lo, hi = min(a, b), max(a, b)
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    counts: dict[int, int] = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                counts[v] = counts.get(v, 0) + 1
    return counts


@given(pairs=_edge_lists)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_triangle_participation_matches_brute_force(spark, pairs):
    from pyspark.sql import functions as F

    from strava_data_pipeline_spark.operators.graph import triangle_participation

    raw = spark.createDataFrame(pairs, "x bigint, y bigint")
    edges = raw.select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    ).distinct()
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_participation(edges).collect()
    }
    spark.catalog.clearCache()  # triangle_participation persists edges
    assert got == _brute_triangle_counts(pairs)
