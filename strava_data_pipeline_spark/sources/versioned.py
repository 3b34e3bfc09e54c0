"""Versioned snapshot store: crash-atomic table publishes + time travel.

The streaming sink's stage-then-overwrite swap (streaming/sync.py) is
partition-scoped but not crash-atomic: a failure between the delete and
the rewrite of one partition loses that partition. This module is the
manifest-based upgrade path (the mechanism Delta/Iceberg build on,
reduced to its core): every commit writes a NEW immutable snapshot
directory ``<root>/v=N/``, then publishes it by creating an empty
marker file ``<root>/_v_N.committed`` — file *creation* is the atomic
primitive (rename-overwrite is not atomic on every Hadoop filesystem,
and plain overwrite deletes before it writes). Readers resolve the
highest committed version, so a writer crash at ANY point leaves the
previous snapshot fully readable and the half-written directory
invisible.

Retained snapshots are time travel for free; ``vacuum`` bounds them.
All filesystem access goes through the Hadoop FileSystem API so the
store works on HDFS/S3A/local alike.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER = re.compile(r"_v_(\d+)\.committed$")


def _fs(spark: SparkSession, root: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def committed_versions(spark: SparkSession, root: str) -> list[int]:
    """All published versions, ascending (uncommitted dirs excluded)."""
    fs, jvm = _fs(spark, root)
    rootp = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(rootp):
        return []
    out = []
    for status in fs.listStatus(rootp):
        m = _MARKER.search(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(spark: SparkSession, root: str) -> int | None:
    versions = committed_versions(spark, root)
    return versions[-1] if versions else None


def commit_snapshot(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next snapshot and atomically publish it.

    The data write targets a version directory no reader resolves yet;
    only the marker creation (atomic) makes it visible. Concurrent
    writers are not arbitrated here — at cluster scale wrap the marker
    step in a lock service or use a transactional table format; the
    single-writer / many-readers contract matches the reference's one
    sync job (internal/strava/strava.go:261)."""
    spark = df.sparkSession
    ver = (current_version(spark, root) or 0) + 1
    data_dir = f"{root}/v={ver}"
    df.write.mode("error").parquet(data_dir)
    fs, jvm = _fs(spark, root)
    marker = jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{ver}.committed")
    fs.create(marker, False).close()
    return ver


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the latest committed snapshot, or ``version`` (time travel).

    Asking for an uncommitted/unknown version raises — a half-written
    directory must never be readable."""
    versions = committed_versions(spark, root)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(f"snapshot v={version} not committed under {root}")
    return spark.read.parquet(f"{root}/v={version}")


def vacuum(spark: SparkSession, root: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots (markers first,
    so a reader racing the vacuum never resolves a half-deleted
    version). Returns the versions removed."""
    fs, jvm = _fs(spark, root)
    versions = committed_versions(spark, root)
    victims = versions[:-keep_last] if keep_last > 0 else versions
    for ver in victims:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{ver}.committed"), False)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v={ver}"), True)
    return victims


def batch_committed(spark: SparkSession, root: str, batch_id: int) -> bool:
    """Whether a streaming micro-batch id has already been applied to
    this store (see :func:`mark_batch`)."""
    fs, jvm = _fs(spark, root)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/_batch_{batch_id}.committed"))


def mark_batch(spark: SparkSession, root: str, batch_id: int) -> None:
    """Record that micro-batch ``batch_id`` is fully applied. Written
    AFTER the snapshot marker: a crash between the two replays the
    batch on restart, and the replay sees ``batch_committed`` False and
    re-merges — latest-wins merging makes the replay idempotent, so the
    store converges to exactly-once contents either way."""
    fs, jvm = _fs(spark, root)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{root}/_batch_{batch_id}.committed"), False
    ).close()


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    key: str,
) -> DataFrame:
    """Row-level change feed between two committed snapshots (the CDF
    read Delta/Iceberg expose): full outer join on ``key``, classify
    each key as insert / delete / update / unchanged, emit everything
    but unchanged. Downstream incremental consumers read the diff
    instead of re-scanning the snapshot — O(changes), not O(table),
    which is the property that matters when the table is 100 TB and a
    day's churn is 0.1%. The join shuffles both snapshots on the key;
    at scale both sides come from the same bucketed layout
    (sources/layout.py:46) so the exchange disappears.

    Change classification compares full rows via a canonical
    struct-of-all-columns equality (null-safe ``eqNullSafe``), so new
    columns are picked up automatically."""
    old = read_snapshot(spark, root, v_old)
    new = read_snapshot(spark, root, v_new)
    cols = [c for c in old.columns if c != key]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas diverge: v{v_old}={old.columns} v{v_new}={new.columns}"
        )
    o = old.select(F.col(key).alias("_ko"), F.struct(*cols).alias("_old"))
    n = new.select(F.col(key).alias("_kn"), F.struct(*cols).alias("_new"))
    j = o.join(n, o["_ko"] == n["_kn"], "full_outer")
    change = (
        F.when(F.col("_ko").isNull(), F.lit("insert"))
        .when(F.col("_kn").isNull(), F.lit("delete"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("_kn"), F.col("_ko")).alias(key),
            change.alias("change"),
            F.col("_old").alias("old"),
            F.col("_new").alias("new"),
        )
        .where(F.col("change") != "unchanged")
    )
