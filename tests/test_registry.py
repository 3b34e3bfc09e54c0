"""Registry contract: every query runs at sf0.001 with a stable schema;
oracle coverage is declared for all SQL-expressible ops."""

from __future__ import annotations

import pytest

from strava_data_pipeline_spark.plans import registry


@pytest.fixture(scope="module")
def queries():
    return registry.all_queries()


def test_inventory_complete(queries):
    expected = {
        "ingest_upsert", "activity_by_id", "recent_activities", "activities_page",
        "sync_window", "sync_daily_counts", "api_key_validate", "keys_per_user",
        "user_activity_join", "athlete_weekly_summary", "athlete_type_stats",
        "json_flatten", "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier", "top_customers_by_revenue", "order_priority_count",
        "parts_brand_stats", "events_sessionize", "events_running_total",
        "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_embedding", "ann_topk", "ann_lsh", "lang_id", "text_quality",
        "token_count", "doc_fingerprint", "multimodal_meta",
    }
    assert expected <= set(queries)


def test_every_query_has_oracle(queries):
    oracles = registry.all_oracles()
    assert set(oracles) == set(queries)


@pytest.mark.parametrize("name", sorted(registry.all_queries()))
def test_query_runs(spark, sf_dir, name, queries):
    df = queries[name](spark, sf_dir)
    assert df.columns, f"{name} has no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
