"""Deterministic sampling, splits, and mixture weighting for training
corpora.

Training-data pipelines need *reproducible* selection: re-running the
pipeline (or re-sharding the cluster) must choose the same rows, and
a document must land in the same train/val/test split forever —
``df.sample``'s per-partition RNG guarantees neither. Everything here
keys on the portable content/id hash (functions/hashing.py), so
selection is a pure function of the row: embarrassingly parallel, no
shuffle, no state, identical across engines (the DuckDB oracles run
the same arithmetic).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strava_data_pipeline_spark.functions.hashing import md5_u32

_BUCKETS = 1000


def _rate_buckets(rate: float) -> int:
    """rate → integer bucket threshold. round(), NOT int(): binary
    float error makes int((0.7+0.1)*1000) == 799, silently moving one
    bucket (0.1% of the corpus) to the wrong side of the boundary. The
    oracles embed the same Python-computed constant, so both engines
    always agree either way — round() just makes the constant the one
    the caller asked for."""
    return int(round(rate * _BUCKETS))


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 1000) from the portable md5 hash; ``salt``
    decorrelates independent sampling decisions on the same key. A
    NULL key hashes a reserved sentinel instead of propagating NULL —
    otherwise every comparison filters the row (sample_fraction at
    rate=1.0 would silently drop it) and assign_split would dump all
    NULL keys into 'test' via the otherwise() branch."""
    safe = F.coalesce(key.cast("string"), F.lit("\u0001null"))
    return md5_u32(F.concat(safe, F.lit(salt))) % _BUCKETS


def sample_fraction(
    df: DataFrame, rate: float, key: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction: hash(key) < rate·1000.
    A narrow filter — pushes to the scan, no shuffle, reproducible
    under retries and repartitioning."""
    return df.where(hash_bucket(F.col(key), salt) < _rate_buckets(rate))


def assign_split(
    df: DataFrame,
    key: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Attach a stable train/val/test label. A document's split never
    changes as the corpus grows — the property that prevents
    train/test contamination across pipeline runs."""
    b = hash_bucket(F.col(key), salt)
    label = (
        F.when(b < _rate_buckets(train), "train")
        .when(b < _rate_buckets(train + val), "val")
        .otherwise("test")
    )
    return df.withColumn("split", label)


def weighted_mixture(
    df: DataFrame,
    weights: Mapping[str, float],
    group_col: str = "source",
    key: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Down-sample each group to its mixture weight (keep-rate per
    group). The standard way a training mix is rebalanced (e.g. keep
    100% of books, 30% of crawl) — one CASE expression, no shuffle."""
    if not weights:
        return df  # nothing to rebalance: every group kept whole
    rate = None
    for g, w in sorted(weights.items()):
        branch = (F.col(group_col) == g, F.lit(_rate_buckets(w)))
        rate = F.when(*branch) if rate is None else rate.when(*branch)
    rate = rate.otherwise(F.lit(_BUCKETS))  # unlisted groups kept whole
    return df.where(hash_bucket(F.col(key), salt) < rate)
