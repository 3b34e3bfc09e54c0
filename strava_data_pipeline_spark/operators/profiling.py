"""Data profiling: per-column quality stats in one pass.

A pipeline ingesting third-party API data (the reference re-fetches a
24h window precisely because upstream data mutates) needs a cheap
answer to "what landed?": row counts, null rates, cardinalities per
column. One scan, one aggregate row, unpivoted to long format.

Scale note: ``count(DISTINCT c)`` per column expands the input once
per column before the shuffle (Spark's Expand); exact counts are fine
to dimension-fact scale, and the 100 TB path flips ``exact=False`` to
HyperLogLog sketches (``approx_count_distinct``, single pass, no
expand, mergeable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str], exact: bool = True) -> DataFrame:
    """Long-format profile: (column_name, n_rows, n_nulls, n_distinct).

    The unpivot is built with expression objects, not an f-string into
    ``selectExpr`` — column names are data here, and a name containing
    a quote/backtick would otherwise splice into the generated SQL
    (injection-by-column-name); an empty ``cols`` returns an empty
    frame instead of a stack(0,) parse error."""
    cols = list(cols)
    spark = df.sparkSession
    if not cols:
        return spark.createDataFrame(
            [],
            "column_name string, n_rows bigint, n_nulls bigint, n_distinct bigint",
        )
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        aggs.append(distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args: list[F.Column] = []
    for c in cols:
        stack_args += [F.lit(c), wide[f"__nulls_{c}"], wide[f"__nd_{c}"]]
    return wide.select(
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "column_name", "n_nulls", "n_distinct"
        ),
        "n_rows",
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )
