"""Semantic tests for the r6 graph pack (plans/graph_queries.py):
k-core peel cascade against a python reference on a planted graph,
and the exact-integer degree-histogram bucketing.

Planted graphs are written as real lineitem.parquet (one 2-item order
per edge) and the registry queries read them through their normal
(spark, sf_dir) entry."""

from __future__ import annotations

from collections import Counter

from strava_data_pipeline_spark.plans import graph_queries as G


def _mklineitem(spark, tmpdir, edges, cliques=()):
    """edges: (a, b) part pairs, each its own 2-item order; cliques:
    iterables of parts sharing one order (all-pairs edges)."""
    rows = []
    ok = 1
    for a, b in edges:
        rows += [(ok, a), (ok, b)]
        ok += 1
    for parts in cliques:
        rows += [(ok, p) for p in parts]
        ok += 1
    # l_shipdate present because load_table normalizes it on read
    rows = [(ok_, pk, 0) for ok_, pk in rows]
    df = spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint, l_shipdate bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/lineitem.parquet")
    return str(tmpdir)


def _ref_kcore(adj, k, rounds):
    """Python reference: per node (peel_round, deg_at_peel); 0 = survives."""
    nodes = set(adj)
    out = {}
    for r in range(1, rounds + 1):
        deg = {n: sum(1 for m in adj[n] if m in nodes) for n in nodes}
        peeled = {n for n in nodes if deg[n] < k}
        for n in peeled:
            out[n] = (r, deg[n])
        nodes -= peeled
    deg = {n: sum(1 for m in adj[n] if m in nodes) for n in nodes}
    for n in nodes:
        out[n] = (0, deg[n])
    return out


def _adj(edges, cliques=()):
    adj = {}
    pairs = set(edges)
    for parts in cliques:
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pairs.add((a, b))
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


class TestKcorePeel:
    def test_cascade_on_pendant_chain(self, spark, tmp_path, monkeypatch):
        # triangle (101-103, degree 2 inside) survives k=2; the chain
        # 1-2-3-101 peels in cascade: node 1 (deg 1) round 1, node 2
        # round 2 (its degree DROPS to 1 only after 1 peels), node 3
        # round 3 — the cascade one-shot degree filters cannot see.
        monkeypatch.setattr(G, "_KCORE_K", 2)
        edges = [(1, 2), (2, 3), (3, 101)]
        cliques = [(101, 102, 103)]
        sf = _mklineitem(spark, tmp_path, edges, cliques)
        got = {
            r["partkey"]: (r["peel_round"], r["deg_at_peel"])
            for r in G.kcore_peel(spark, sf).collect()
        }
        assert got == _ref_kcore(_adj(edges, cliques), k=2, rounds=4)
        assert got[1] == (1, 1) and got[2] == (2, 1) and got[3] == (3, 1)
        assert got[101] == (0, 2)
        assert all(got[n] == (0, 2) for n in (102, 103))

    def test_isolated_after_peel_is_peeled_not_lost(
        self, spark, tmp_path, monkeypatch
    ):
        # star: center 10 with 3 leaves. k=2: every leaf (deg 1) peels
        # round 1; the center's degree then drops to ZERO — it must
        # appear as a round-2 peel with deg 0, not vanish from the
        # output (the left-join-from-node-list contract).
        monkeypatch.setattr(G, "_KCORE_K", 2)
        edges = [(10, 21), (10, 22), (10, 23)]
        sf = _mklineitem(spark, tmp_path, edges)
        got = {
            r["partkey"]: (r["peel_round"], r["deg_at_peel"])
            for r in G.kcore_peel(spark, sf).collect()
        }
        assert got == _ref_kcore(_adj(edges), k=2, rounds=4)
        assert got[10] == (2, 0)
        assert set(got) == {10, 21, 22, 23}


class TestDegreeHistogram:
    def test_buckets_and_stats(self, spark, tmp_path):
        # degrees: node 1 has 4 (bucket 3: bin(4)=100), nodes 2-5 have
        # 1 each (bucket 1), plus a 3-clique (degree 2 -> bucket 2).
        edges = [(1, 2), (1, 3), (1, 4), (1, 5)]
        cliques = [(6, 7, 8)]
        sf = _mklineitem(spark, tmp_path, edges, cliques)
        deg = Counter()
        for a, b in edges + [(6, 7), (6, 8), (7, 8)]:
            deg[a] += 1
            deg[b] += 1
        expect = {}
        for n, c in deg.items():
            b = len(bin(c)) - 2  # floor(log2)+1
            lo, hi, s, cnt = expect.get(b, (c, c, 0, 0))
            expect[b] = (min(lo, c), max(hi, c), s + c, cnt + 1)
        got = {
            r["bucket"]: (r["min_deg"], r["max_deg"], r["sum_deg"], r["n_parts"])
            for r in G.degree_histogram(spark, sf).collect()
        }
        assert got == expect
        assert set(got) == {1, 2, 3}
