"""Connected-components operator: planted graphs with known closures."""

from __future__ import annotations

from pyspark.sql import functions as F

from strava_data_pipeline_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_chain_collapses_to_min(spark):
    # a 9-hop chain exercises pointer jumping (diameter >> 2 rounds)
    e = _edges(spark, [(i, i + 1) for i in range(1, 10)])
    got = {
        (r["node"], r["label"])
        for r in G.connected_components(e).collect()
    }
    assert got == {(i, 1) for i in range(1, 11)}


def test_multiple_components_and_orientation(spark):
    # mixed edge orientation + duplicate edges must not matter
    e = _edges(spark, [(2, 1), (2, 3), (3, 2), (10, 11), (11, 10), (20, 21)])
    got = dict(
        (r["node"], r["label"]) for r in G.connected_components(e).collect()
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cluster_assignments_includes_singletons(spark):
    nodes = spark.range(1, 8).select(F.col("id").alias("doc_id"))
    e = _edges(spark, [(1, 2), (2, 3), (5, 6)])
    got = dict(
        (r["doc_id"], r["cluster_id"])
        for r in G.cluster_assignments(nodes, e, "doc_id").collect()
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_cluster_stats(spark):
    nodes = spark.range(1, 6).select(F.col("id").alias("doc_id"))
    e = _edges(spark, [(1, 2), (2, 3)])
    asg = G.cluster_assignments(nodes, e, "doc_id")
    stats = {
        r["cluster_id"]: (r["cluster_size"], r["canonical"])
        for r in G.cluster_stats(asg, "doc_id").collect()
    }
    assert stats == {1: (3, 1), 4: (1, 4), 5: (1, 5)}
