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


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
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
        llm_queries,
        pipeline_queries,
    )

    _LOADED = True
