"""Salted-join equivalence and IVF ANN structural/recall tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from strava_data_pipeline_spark.operators.skew import salted_join
from strava_data_pipeline_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
)
from strava_data_pipeline_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of left rows share one hot key
    left = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)], "row_id int, k string"
    )
    right = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i * 10}", float(i)) for i in range(100)],
        "k string, payload double",
    )
    return left, right


def test_salted_join_matches_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").select("row_id", "k", "payload")
    salted = salted_join(left, right, on=["k"]).select("row_id", "k", "payload")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "left").select("row_id", "payload")
    salted = salted_join(left, right, on=["k"], how="left").select("row_id", "payload")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_ivf_structure_and_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    ivf = ann_topk_ivf(emb, queries, k=10).collect()
    per_query = {}
    for r in ivf:
        per_query.setdefault(r["query_id"], []).append(r)
    assert set(per_query) == set(range(8))
    for rows in per_query.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # probing 2/16 lists must beat the ~1/8 random-candidate floor
    exact = ann_topk_bruteforce(emb, queries, k=10).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ivf_pairs = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(exact_pairs & ivf_pairs) / len(exact_pairs)
    assert recall >= 0.2
