"""Iterative graph operators: connected components over near-dup pairs.

The pair-finders (minhash/simhash/jaccard/embedding) emit EDGES; real
corpus dedup needs CLUSTERS — transitive closure of those edges — so one
canonical doc survives per cluster (pair-wise dropping can cascade:
A~B, B~C but not A~C still must collapse to one survivor).

Spark-first design: label propagation with pointer-jumping (path
halving), the DataFrame re-expression of the classic two-phase
large-star/small-star CC algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14):

- state is one (node, label) frame, label = smallest known member id;
- each round does (1) a min-label exchange across edges — one shuffle
  join edges⋈labels + groupBy — and (2) a pointer jump
  label←label(label) — one self-join — which halves tree depth, giving
  O(log diameter) rounds instead of O(diameter);
- every round ends in ``localCheckpoint`` so lineage stays flat
  (iterative plans otherwise grow exponentially and re-execute the
  whole prefix each action);
- convergence is an exact fixpoint test (count of changed labels == 0),
  bounded by ``max_iter``.

At 100 TB each round shuffles (edge_count + node_count) narrow
(BIGINT, BIGINT) rows — document bodies never enter the loop; the edge
frame is checkpointed once and re-read from executor-local storage.

No reference parity line: the reference (a Go web service) has no graph
tier; this implements the cluster step its dedup story would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, label): label = min node id reachable from node.

    ``edges`` is an undirected pair list (either orientation, duplicates
    fine). Nodes with no edges are absent from the output — callers
    union singletons back (see dedup_clusters), keeping the iteration
    state proportional to the *connected* subgraph, which for near-dup
    corpora is a small fraction of the corpus.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)  # reused every round: flatten lineage once

    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # (1) min-label exchange across edges (large-star step)
        nbr_min = (
            e.join(labels, e["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("label").alias("nbr_label"))
            .groupBy("node")
            .agg(F.min("nbr_label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        # (2) pointer jump: label <- label(label)  (path halving)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            stepped.join(parent, stepped["label"] == parent["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("p_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def cluster_assignments(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Full (node, cluster_id) map: every node in ``nodes``, edge-less
    nodes as their own singleton cluster. The left join keeps the
    iteration state bounded by the connected subgraph."""
    comp = connected_components(edges, src=src, dst=dst).select(
        F.col("node").alias(node_col), F.col("label").alias("cluster_id")
    )
    return (
        nodes.select(node_col)
        .join(comp, node_col, "left")
        .select(
            node_col,
            F.coalesce("cluster_id", F.col(node_col)).alias("cluster_id"),
        )
    )


def cluster_stats(assignments: DataFrame, node_col: str) -> DataFrame:
    """Per-cluster size + canonical member (min id), one shuffle."""
    return assignments.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size"),
        F.min(node_col).alias("canonical"),
    )


def triangle_participation(
    edges: DataFrame, broadcast_adj_max: int = 2_000_000
) -> DataFrame:
    """Per-node triangle membership counts over an undirected edge list.

    ``edges`` must hold each undirected edge once as (a, b) with a < b.
    Returns (node, n_triangles) for every node in at least one triangle.

    Scale design — degree-ordered EDGE-ITERATOR counting (the form that
    never materializes the wedge set):

    - edges ORIENT from their (degree, id)-smaller endpoint to the
      larger; a node's oriented out-degree is then bounded by O(√m) on
      ANY degree distribution (a hub's edges all point INTO it);
    - per-node out-adjacency ARRAYS build with one tail-keyed shuffle
      (map-side-combined collect_list, O(√m)-bounded rows);
    - every triangle has exactly one base edge (u→v) such that its
      third vertex w satisfies w ∈ out(u) ∩ out(v) — the u→v, u→w,
      v→w orientation pattern — so triangles come from ONE pass over
      the oriented edges with ``explode(array_intersect(out_u, out_v))``
      in codegen. The classic wedge join (enumerate all C(out_deg, 2)
      pairs, probe the edge set) streams O(m^1.5) wedge rows through a
      join; the intersection form touches the same O(m^1.5) array
      cells but inside per-row codegen, emitting only actual triangles
      (measured at sf0.1: 41M wedge rows → 1.9M triangle rows, ~2.5×
      faster end-to-end);
    - the adjacency frame AND the degree dim are each one row per node
      (edge count, their shared upper bound, gates both): under
      ``broadcast_adj_max`` they BROADCAST onto the edge pass (zero
      extra shuffles); past that every join degrades to a partitioned
      equi-join keyed on the edge endpoints — payload bounded by the
      same O(√m) array cap, nothing wider ever moves, and no frame is
      force-broadcast unbounded.

    ``edges`` is persisted internally (it feeds the degree count, the
    orientation pass, and — via lineage — the adjacency build); the
    cache lifecycle is caller-owned as with minhash_lsh_pairs (bench
    clears per query; loops must clearCache after materializing).
    """
    edges = edges.persist()
    # materializes the persist; edge count upper-bounds the adjacency
    # row count (= node count), so it gates the broadcast decision
    n_edges = edges.count()
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    # The degree dim is node-sized (same cardinality class as the
    # adjacency), so its broadcast is gated on the SAME n_edges bound
    # as the adjacency frames below — past the bound both degree joins
    # degrade to plain partitioned equi-joins on the edge endpoints
    # (r5 ADVICE: an ungated F.broadcast here would OOM the driver on
    # a 10^8-node graph before the adjacency gate was ever consulted).
    deg_a = deg.withColumnRenamed("node", "a")
    deg_b = deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b")
    if n_edges <= broadcast_adj_max:
        deg_a, deg_b = F.broadcast(deg_a), F.broadcast(deg_b)
    e = (
        edges.join(deg_a, "a")
        .withColumnRenamed("deg", "deg_a")
        .join(deg_b, "b")
    )
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    adj = oriented.groupBy("u").agg(F.collect_list("v").alias("hs"))
    adj_u = adj.select(F.col("u"), F.col("hs").alias("hs_u"))
    adj_v = adj.select(F.col("u").alias("v"), F.col("hs").alias("hs_v"))
    if n_edges <= broadcast_adj_max:
        adj_u, adj_v = F.broadcast(adj_u), F.broadcast(adj_v)
    else:
        # past the broadcast gate the two adjacency joins MUST be
        # shuffle-HASH, not sort-merge: SMJ sorts its join input, and
        # after the first join every edge row carries its O(√m) hs_u
        # array — sorting that fat intermediate by v spills O(m·deg)
        # bytes (measured r10: the uniform mult=100 graph died with
        # SPILL_OUT_OF_MEMORY / no-space-left after tens of GB of
        # UnsafeExternalSorter spill). Hashing builds on the adjacency
        # side (one array row per node, Σ|out| = m cells total) and
        # STREAMS the fat edge rows through the probe — nothing fat is
        # ever sorted or buffered.
        adj_u, adj_v = adj_u.hint("shuffle_hash"), adj_v.hint("shuffle_hash")
    tri = (
        oriented.join(adj_u, "u")
        .join(adj_v, "v")
        .select(
            "u",
            "v",
            F.explode(F.array_intersect("hs_u", "hs_v")).alias("w"),
        )
    )
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """K-core decomposition to FIXPOINT: per node, the round it was
    peeled (degree < k on the then-surviving subgraph; 1-based) and
    its degree at peel time, with ``peel_round = 0`` for true k-core
    members — the production form of the registry's 4-round
    ``kcore_peel`` query (plans/graph_queries.py), which unrolls the
    identical per-round plan so the DuckDB oracle can mirror it.

    ``edges`` is an undirected pair list (either orientation,
    duplicates fine). Isolated nodes never enter (no edges), matching
    connected_components' convention.

    Scale design (the same physics the unrolled query documents —
    INCREMENTAL degree maintenance): the peeled nodes' edges are
    known, so round r+1's degrees are round r's minus the edges lost
    to just-peeled neighbors,

        deg_{r+1}(s) = deg_r(s) - |{d in peel_r : (s,d) in u0}|,

    and the subtraction is exact against the ORIGINAL edge list: s
    survived rounds 1..r and d peeled in round r, so no earlier round
    removed any (s,d) edge between them. The edge list is therefore
    hash-partitioned on the degree key and persisted ONCE (DISK_ONLY
    — five deserialized edge generations OOMed a 32g heap at the
    mult=100 rehearsal; one disk-backed columnar copy does not) and
    never pruned; each round is one cached-scan join against the
    node-sized peel set plus a node-sized LEFT subtraction join. A
    survivor whose every neighbor peeled reaches degree 0 and peels
    next round, so zero-degree stragglers still peel instead of
    vanishing. Versus the prune-per-round shape this drops, per
    round, a full-edge degree recount, two semi-join scans, and an
    edge-generation persist+materialize. Each round's degree frame is
    localCheckpoint'ed (node-sized, memory-resident): the frame is
    referenced TWICE by the next round (survivor filter + peel-side
    lost count), so an uncut lineage doubles per round — 2^rounds
    analyzer trees OOM the driver long before any data moves; the
    checkpoint makes every round start from a leaf. The convergence
    check is the peel count the round computes anyway — no extra
    driver-side data."""
    from pyspark.storagelevel import StorageLevel

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .repartition("s")
        .persist(StorageLevel.DISK_ONLY)
    )
    # round-1 degrees: the only full count (every node of u0 has >= 1
    # edge, so the groupBy covers the node set exactly). Checkpointed,
    # like every round's frame — see the 2^rounds note above.
    deg = (
        und.groupBy("s")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    peeled: list[DataFrame] = []
    survivors: DataFrame | None = None
    for r in range(1, max_iter + 1):
        peel = deg.where(F.col("c") < k)
        n_peel = peel.count()
        if n_peel == 0:
            survivors = deg.select(
                "s",
                F.lit(0).cast("int").alias("peel_round"),
                F.col("c").alias("deg_at_peel"),
            )
            break
        # peel derives from the checkpointed deg leaf — no flatten
        # needed; the list reference keeps the leaf alive through the
        # final union
        peeled.append(
            peel.select(
                "s",
                F.lit(r).cast("int").alias("peel_round"),
                F.col("c").alias("deg_at_peel"),
            )
        )
        # edges lost to this round's peel: ORIGINAL edge list joined
        # against the peeled ids on the NEIGHBOR end; the survivor
        # LEFT join below discards peeled-s rows, so no s-side filter
        # is needed here. No broadcast hint: AQE picks broadcast from
        # the peel set's measured size, shuffle-join above threshold.
        lost = (
            und.join(peel.select(F.col("s").alias("d")), "d")
            .groupBy("s")
            .agg(F.count("*").cast("bigint").alias("lost"))
        )
        deg = (
            deg.where(F.col("c") >= k)
            .join(lost, "s", "left")
            .select(
                "s",
                (F.col("c") - F.coalesce(F.col("lost"), F.lit(0))).alias(
                    "c"
                ),
            )
            .localCheckpoint(eager=True)
        )
        # everything peels eventually when k exceeds every degree: a
        # node whose neighbors all peeled reaches degree 0 < k and
        # peels the following round, then n_peel == 0 terminates
    if survivors is None:  # max_iter hit: remaining nodes stay round-0
        survivors = deg.select(
            "s",
            F.lit(0).cast("int").alias("peel_round"),
            F.col("c").alias("deg_at_peel"),
        )
    und.unpersist()
    out = survivors
    for p in peeled:
        out = out.unionAll(p)
    return out.withColumnRenamed("s", "node")


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    rank_scale: int = 1_000_000,
    damping_milli: int = 850,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer arithmetic.

    Ranks live in BIGINT micro-units (``rank_scale`` per node) and each
    step is ``r' = (1-d)*scale + floor(d * sum(floor(r_src/deg_src)))``
    with d expressed in thousandths — every intermediate is an integer
    both engines compute identically, so a fixed-iteration oracle can
    reproduce the result exactly (the same quantization discipline as
    kmeans_lloyd). Floats would NOT be portable here: iterated
    double sums diverge across engines in the last bit and the error
    compounds per iteration.

    Per iteration: one join of ranks onto edges by src (broadcast-able
    once ranks ≪ edges; hash join otherwise) and one dst-keyed groupBy
    — two shuffles, both on graph keys, no driver-side state. Node set
    = sources (every node of an undirected graph has out-edges; nodes
    with no in-edges keep the teleport base). At 100 TB pre-partition
    edges by src and the rank join reuses that partitioning every
    round; lineage stays bounded because each round's frame derives
    from the previous round's shuffle output, not a growing union.
    """
    # NOTE (measured, sf0.1): do NOT repartition+persist the edge set
    # here — the whole pagerank is one query execution, so AQE's
    # ReusedExchange already dedupes every repeated edge-lineage
    # exchange, and an explicit materialization pays an extra full
    # shuffle (+15% wall). Persisting wins only when edges feed
    # MULTIPLE actions (e.g. a convergence-checked loop like
    # connected_components above, which localCheckpoints per round).
    deg = edges.groupBy(src_col).agg(F.count("*").cast("bigint").alias("_deg"))
    nodes = deg.select(F.col(src_col).alias("_node"))
    ranks = nodes.select("_node", F.lit(int(rank_scale)).cast("bigint").alias("rank"))
    base = rank_scale * (1000 - damping_milli) // 1000
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks["_node"])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias("_to"),
                # `div` = BIGINT division (ranks are non-negative, so this
                # IS floor). `rank / deg` would route through DOUBLE,
                # which stops being exact past 2^53 — reachable for a hub
                # node once accumulated rank mass grows at scale.
                F.expr("rank div _deg").cast("bigint").alias("_c"),
            )
            .groupBy("_to")
            .agg(F.sum("_c").cast("bigint").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes["_node"] == contrib["_to"], "left")
            .select(
                "_node",
                # BIGINT `div`, not `/1000.0`: the damping product
                # crosses 2^53 once a hub's in-rank exceeds ~1.06e13
                # micro-units, and a DOUBLE there loses the last bit —
                # which then compounds per iteration and diverges from
                # the integer oracle.
                (
                    F.lit(base)
                    + F.expr(
                        f"({int(damping_milli)} * coalesce(_in, CAST(0 AS BIGINT)))"
                        " div 1000"
                    )
                )
                .cast("bigint")
                .alias("rank"),
            )
        )
    return ranks.select(F.col("_node").alias("node"), "rank")
