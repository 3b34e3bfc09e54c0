"""Table catalog: parquet tables → DataFrames / temp views.

The reference keeps its data in Postgres tables (``activities``,
``users``, ``api_keys`` — /root/reference/internal/db/db.go:47). Here the
storage layer is columnar parquet read declaratively so Catalyst gets
predicate pushdown + column pruning on every query; at cluster scale the
same loader points at partitioned table roots instead of single files.

Deliberately NOT applied here: the single-split scan guard
(skew.spread_small_scan) that the text/embedding pipelines use.
Measured r4 over 20 TPC-H/events queries at sf0.1: spreading the fact
scans regressed nearly everything (q1 0.56s→1.06s, q21 0.89s→2.11s)
— vectorized parquet decode + map-side partial aggregation is cheaper
single-threaded than paying a full-row round-robin exchange, unlike
the per-row regex/tokenize stages where the guard wins 2-4×. Operators
that ARE scan-CPU-bound opt in at their own layer (plans/llm_queries
``_docs``, dedup/similarity ``_spread``).

REPO-WIDE CONTRACT: every logically-timestamp column leaves
``load_table`` as plain ``TimestampType`` regardless of physical
storage — TIMESTAMP(NANOS) files (Spark refuses outright) are repaired
via ``nanosAsLong`` + µs truncation, and unadjusted ``timestamp[us]``
files (which surface as TIMESTAMP_NTZ, rejecting every epoch-arithmetic
expression) are cast back under the UTC-pinned session. Query code MUST
reach timestamps through this loader, never a raw ``spark.read`` —
tests/test_sources.py::TestCatalogTimestampContract pins the guarantee.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns that are logically timestamps. Some testdata files store them as
# parquet TIMESTAMP(NANOS), which Spark refuses outright; with
# ``nanosAsLong`` they surface as BIGINT nanos and we convert to
# microsecond timestamps (truncation — matching DuckDB's ns→µs cast).
_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Parquet keeps scans pruned and push-down friendly."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable in this runtime; plain read below may still work
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _TIMESTAMP_COLS.get(name, ()):
        field = df.schema[col]
        if field.dataType.typeName() in ("long", "bigint"):
            # integer `div`, NOT `/`: float division loses precision at
            # nanosecond magnitudes (~1.7e18 exceeds double's 53-bit mantissa)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif field.dataType.typeName() == "timestamp_ntz":
            # Parquet timestamp[us] with isAdjustedToUTC=false surfaces as
            # TIMESTAMP_NTZ, which rejects epoch arithmetic (cast to long,
            # unix_micros). Session TZ is pinned UTC (session.py), so
            # NTZ→TIMESTAMP is value-preserving and matches DuckDB semantics.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql paths) and
    return the DataFrame handles (for the declarative paths)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
