"""Query registry: the single source of truth for the engine's surface.

Every operator exposed by the engine registers here as a named pair of
 (a) a Spark builder ``(spark, sf_dir) -> DataFrame`` and
 (b) an optional ANSI-SQL oracle string DuckDB can run on the same
     parquet tables — the cross-engine correctness contract.

``__spark_entry__.py`` re-exports this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco


# Enumeration-order priority: the driver's correctness harness samples a
# rotating subset of ``queries()`` per round, and dict order is the only
# lever the engine has over which queries get officially recorded.  The
# r5 ordering cycles OLDEST-GREEN-FIRST (VERDICT r4 task 4): first the
# queries with no green driver row at all (the two array-serialization
# fixes and the two sketch queries that now emit exact-checkable bounds,
# plus any query new this round), then every query whose latest official
# hash-match is still round 1 or 2 — three rounds of code churn vouched
# for only by the local replica.  Every other query follows in
# registration (module-import) order (their latest green is r3/r4).
_ENUMERATE_FIRST: tuple[str, ...] = (
    # --- no green driver row yet ---
    "skipgram_pmi",  # new in r5 (mining pack)
    "bigram_logprob",  # new in r5
    "ann_pq",  # new in r5
    "ivf_balance",  # new in r5
    "simhash_error_eval",  # new in r5
    "embedding_outliers",  # new in r5 (mining pack, 2nd batch)
    "cluster_purity",  # new in r5
    "ann_recall_eval",  # new in r5
    "classifier_quality_score",  # new in r5 (curation pack)
    "dsir_weights",  # new in r5
    "bpe_pair_counts",  # new in r5
    "decontaminate_bloom",  # new in r5
    "ngram_novelty",  # new in r5
    "domain_kl",  # new in r5
    "copurchase_triangles",  # new in r5
    "embedding_power_iteration",  # new in r5
    "minhash_error_eval",  # new in r5
    "snapshot_diff",  # new in r5 (streaming CDF's batch twin)
    "embedding_quantize",  # r4 ERR: array output → now canonical CSV string
    "inverted_index",  # r4 ERR: same fix
    "percentile_stats_approx",  # rows-only → now exact-checkable bounds
    "events_profile_approx",  # rows-only → now exact-checkable bounds
    # --- latest green row is round 1 ---
    "activities_page",
    "activity_by_id",
    "ann_ivf",
    "ann_lsh",
    "ann_topk",
    "api_key_validate",
    "athlete_type_stats",
    "athlete_weekly_summary",
    "cdc_merge",
    "corpus_dedup_keep",
    "corpus_mixture",
    "corpus_split_counts",
    "dedup_embedding",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_fingerprint",
    "events_profile",
    "events_running_total",
    "events_sessionize",
    "ingest_upsert",
    "json_flatten",
    "keys_per_user",
    "lang_id",
    "multimodal_meta",
    "recent_activities",
    "sync_daily_counts",
    "sync_window",
    "text_quality",
    "token_count",
    "token_histogram",
    "user_activity_join",
    # --- latest green row is round 2 ---
    "parts_brand_stats",
    # --- latest green row is round 3 (oldest-first tail; the driver's
    #     ~50-query subset reaches partway into this block) ---
    "customer_rfm",
    "events_cube",
    "events_gapfill",
    "events_grouping_sets",
    "events_latest_n",
    "events_rank_suite",
    "events_rolling_7d",
    "events_sliding_window",
    "events_zscore",
    "heavy_hitters",
    "heavy_hitters_sampled",
    "order_priority_count",
    "pagerank_parts",
    "parts_bought_together",
    "q10_returned_items",
    "q11_important_parts",
    "q12_returnflag_priority",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_profit",
    "scd2_intervals",
    "sessions_overlap_windows",
    "top_customers_by_revenue",
    "user_churn_setops",
    "weekly_type_trend",
)


def _ordered_names() -> list[str]:
    head = [n for n in _ENUMERATE_FIRST if n in REGISTRY]
    head_set = set(head)
    return head + [n for n in REGISTRY if n not in head_set]


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from strava_data_pipeline_spark.plans import (  # noqa: F401
        advanced_queries,
        analytics_complete,
        analytics_extra,
        analytics_queries,
        curation_queries,
        llm_queries,
        mining_queries,
        pipeline_queries,
    )

    _LOADED = True
