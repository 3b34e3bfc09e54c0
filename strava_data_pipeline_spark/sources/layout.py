"""Table layout for scale: partitioned writes + pruning verification.

SURVEY §4 commits to date-partitioned fact layout; this module is that
commitment as code. ``write_partitioned`` lands a fact table as
``<root>/<col>=<value>/part-*.parquet`` so any query filtering on the
partition column scans only matching directories (PartitionFilters in
the physical plan — verified by tests, not assumed), and
``write_bucketed`` saves a pre-shuffled copy so equi-joins/aggs on the
bucket keys skip their exchange entirely.

At 100 TB: events partition by day (~3 years ≈ 1000 partitions of
~100 GB — each still split into ~800 tasks by maxPartitionBytes);
lineitem by ship-month. Avoid over-partitioning (a partition per user
would make 10M tiny dirs — use bucketing for high-cardinality keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Land a timestamped fact partitioned by calendar day."""
    (
        df.withColumn("p_day", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy("p_day")
        .parquet(path)
    )


def read_day_range(
    spark: SparkSession, path: str, start_day: str, end_day: str
) -> DataFrame:
    """Read only the partitions inside [start_day, end_day] — the
    filter lands in PartitionFilters, so non-matching directories are
    never listed into tasks."""
    return spark.read.parquet(path).where(
        (F.col("p_day") >= F.lit(start_day)) & (F.col("p_day") <= F.lit(end_day))
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table: rows pre-shuffled into
    ``n_buckets`` by hash(bucket_col), so joins and aggregations on
    that key read co-located data and plan without an Exchange.

    Overwrite must also clear an *orphaned* managed location: a table
    written by a previous session lives in the warehouse dir but not in
    this session's in-memory catalog, and saveAsTable then fails with
    LOCATION_ALREADY_EXISTS instead of overwriting. The orphan path is
    derived with the metastore's rules — lowercased name, default
    database at the warehouse root — so ``MyTable`` still resolves;
    qualified ``db.tbl`` names are rejected because their managed
    location lives under ``<db>.db/`` and a wrong guess would delete
    the wrong directory."""
    spark = df.sparkSession
    if "." in table_name:
        raise ValueError(
            "write_bucketed manages default-database tables only; "
            f"got qualified name {table_name!r}"
        )
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = spark._jvm.org.apache.hadoop.fs.Path(f"{wh}/{table_name.lower()}")
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def compact_day_partitions(
    spark: SparkSession,
    path: str,
    days: list | None = None,
    target_files: int = 1,
) -> int:
    """Rewrite day partitions into ``target_files`` files each — the
    maintenance pass every streaming sink needs: micro-batches land one
    file per trigger per day, and a year of 5-minute triggers turns a
    day's directory into ~300 small files whose open/footer overhead
    dominates scans.

    Scope is explicit (``days``; default = every partition found): the
    rewrite reads ONLY those partitions (partition-pruned scan) and
    replaces ONLY them (dynamic partition overwrite) — untouched days
    keep their files byte-for-byte. Returns the number of compacted
    partitions. At cluster scale run it per-day behind the ingest
    watermark so compaction never races the writer; table formats with
    transactions (Delta/Iceberg OPTIMIZE) are the strict-atomicity
    upgrade path.

    The shuffle keys on (p_day, row-hash bucket), NOT p_day alone:
    hash-partitioning by the day column would funnel each whole day
    through ONE task regardless of ``target_files`` (a ~100 GB day =
    one OOM-prone serialized writer) and cap cross-day parallelism at
    the shuffle width. The bucket term spreads each day over exactly
    ``target_files`` shuffle keys → at most that many files per day,
    all days compacting in parallel.
    """
    df = spark.read.parquet(path)
    if days is None:
        days = [r["p_day"] for r in df.select("p_day").distinct().collect()]
    if not days:
        return 0
    pruned = df.where(F.col("p_day").isin(days))
    data_cols = [c for c in pruned.columns if c != "p_day"]
    bucket = F.pmod(F.hash(*[F.col(c) for c in data_cols]), F.lit(target_files))
    (
        pruned.repartition(len(days) * target_files, F.col("p_day"), bucket)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p_day")
        .parquet(path)
    )
    return len(days)


def zvalue(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative ints as BIGINT:
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure shift/and
    arithmetic — identical in any engine, so an oracle can recompute
    the curve exactly. 2*bits must stay < 63."""
    from functools import reduce

    xb = F.col(x).cast("bigint") if isinstance(x, str) else x.cast("bigint")
    yb = F.col(y).cast("bigint") if isinstance(y, str) else y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zvalue_duckdb(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zvalue` for oracle SQL."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered along the Z-order curve of (x, y): range
    partition on the interleaved key, sort within each file, drop the
    key. Files then cover compact (x, y) rectangles, so parquet
    min/max stats prune BOTH dimensions — a box predicate touches a
    handful of files instead of all of them, where single-column sort
    layout prunes only its own column. This is the data-layout
    optimization table formats call OPTIMIZE ZORDER BY; here it is a
    plain parquet rewrite any maintenance job can run.

    Coordinates are range-checked against ``2**bits`` up front: zvalue
    silently IGNORES bits above position ``bits-1``, so out-of-range
    values would interleave onto the same curve positions as small ones
    and the min/max pruning the layout exists for would quietly stop
    working. The check is one cheap aggregate over the frame being
    rewritten anyway; raise ``bits`` (2*bits < 63) for wider domains.

    NULL coordinates are rejected explicitly (same aggregate): min/max
    skip nulls, so a null row would pass the range check yet land a
    null ``_z`` — placed arbitrarily by the range partitioner, invisible
    to curve pruning. A caller with nullable coordinates decides the
    policy (filter, or fill a sentinel in-range value) before the write.
    """
    lim = 1 << bits
    mx = df.agg(
        F.max(x_col),
        F.max(y_col),
        F.min(x_col),
        F.min(y_col),
        F.sum(
            (F.col(x_col).isNull() | F.col(y_col).isNull()).cast("bigint")
        ),
        F.count(F.lit(1)),
    ).first()
    if mx[5] and mx[4]:
        raise ValueError(
            f"zorder_write: {mx[4]} row(s) have NULL {x_col}/{y_col}; "
            "null coordinates cannot be placed on the curve — filter "
            "them or fill an in-range sentinel before the write"
        )
    if mx[2] is not None and (mx[0] >= lim or mx[1] >= lim or mx[2] < 0 or mx[3] < 0):
        raise ValueError(
            f"zorder_write: ({x_col}, {y_col}) range [{mx[2]}..{mx[0]}] x "
            f"[{mx[3]}..{mx[1]}] exceeds [0, {lim}) for bits={bits}; "
            "raise bits or rescale the columns"
        )
    z = zvalue(x_col, y_col, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
