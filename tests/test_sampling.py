"""Deterministic sampling/split/mixture operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from strava_data_pipeline_spark.operators.sampling import (
    assign_split,
    sample_fraction,
    weighted_mixture,
)
from strava_data_pipeline_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_sample_fraction_reproducible_and_near_rate(spark):
    docs = load_table(spark, SF_DIR, "documents")
    s1 = {r["doc_id"] for r in sample_fraction(docs, 0.3).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in sample_fraction(docs, 0.3).select("doc_id").collect()}
    assert s1 == s2  # identical on re-run — no RNG
    assert 0.2 <= len(s1) / docs.count() <= 0.4
    # growing the rate only ADDS rows (nested samples — hash gates are monotone)
    s_half = {r["doc_id"] for r in sample_fraction(docs, 0.5).select("doc_id").collect()}
    assert s1 <= s_half


def test_split_stable_under_corpus_growth(spark):
    docs = load_table(spark, SF_DIR, "documents")
    full = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
    subset = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs.where(F.col("doc_id") % 3 == 0)).collect()
    }
    # a doc's split is a pure function of its id: same label in any corpus
    assert all(full[k] == v for k, v in subset.items())
    assert set(full.values()) == {"train", "val", "test"}


def test_weighted_mixture_rates_and_unlisted_kept(spark):
    docs = load_table(spark, SF_DIR, "documents")
    kept = weighted_mixture(docs, {"src0": 1.0, "src1": 0.0})
    per_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src.get("src0") == 25      # weight 1.0 → all kept
    assert "src1" not in per_src          # weight 0.0 → all dropped
    assert per_src.get("src5") == 25      # unlisted → kept whole
