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
