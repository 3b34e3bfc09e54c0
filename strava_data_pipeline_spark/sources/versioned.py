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

import hashlib
import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER = re.compile(r"_v_(\d+)\.committed$")

_NULL_TOKEN = "__null__"


def _part_token(val) -> str:
    """Directory-safe token for one partition value. Clean values
    (dates/ints/simple strings) keep their readable form so existing
    manifests stay valid; a value that needed sanitizing gets a short
    hash of the RAW value appended, so two distinct values that
    sanitize identically (``a/b`` vs ``a_b``) can never collapse to
    one manifest entry and silently overwrite each other's rows.
    ``None`` maps to a reserved token (and the literal string that
    collides with it is hash-disambiguated).

    FORMAT NOTE (r4): the hash suffix changed the token for values that
    REQUIRE sanitizing. Date/int partitions — every store this repo
    writes — are unaffected (their tokens are the clean form, byte-
    identical to pre-r4). A pre-r4 store that used unsafe STRING
    partition values would resolve those partitions to new tokens and
    must be rewritten once (read_snapshot → commit) before further
    partitioned commits; committing blind would orphan the old entry
    and duplicate its rows in read_snapshot's union."""
    if val is None:
        return _NULL_TOKEN
    s = str(val)
    safe = re.sub(r"[^A-Za-z0-9_.=-]", "_", s)
    if safe != s or s == _NULL_TOKEN:
        safe = f"{safe}-{hashlib.md5(s.encode()).hexdigest()[:8]}"
    return safe


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
    sync job (internal/strava/strava.go:261).

    ``mode("overwrite")``, NOT ``mode("error")``: a crash after the
    data write but before the marker leaves ``v=N`` on disk while
    ``current_version`` still says N-1 — the replay recomputes the SAME
    version number and must be able to redo the half-written dir, or
    the store is wedged forever (every retry fails path-exists). The
    dir is invisible until the marker exists, so overwriting it is
    race-free under the single-writer contract. A stale ORPHAN MANIFEST
    at this version (a crashed partitioned commit that got as far as
    its manifest write) is deleted for the same reason: read_snapshot
    prefers the manifest, which would otherwise shadow this full
    snapshot with the crashed commit's partial data."""
    spark = df.sparkSession
    ver = (current_version(spark, root) or 0) + 1
    data_dir = f"{root}/v={ver}"
    df.write.mode("overwrite").parquet(data_dir)
    fs, jvm = _fs(spark, root)
    orphan = _manifest_path(jvm, root, ver)
    if fs.exists(orphan):
        # Delete the crashed commit's DATA DIRS before its manifest:
        # once the manifest is gone those dirs are referenced by no
        # version at all, and vacuum only deletes dirs listed in victim
        # manifests — they would leak on disk forever. Dirs a committed
        # manifest still shares (the crashed commit reused unchanged
        # partitions) must survive.
        stale = set((read_manifest(spark, root, ver) or {}).values())
        referenced: set[str] = set()
        for v in committed_versions(spark, root):
            referenced |= set((read_manifest(spark, root, v) or {}).values())
        for rel in sorted(stale - referenced):
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}"), True)
        fs.delete(orphan, False)
        seg = jvm.org.apache.hadoop.fs.Path(f"{root}/seg/v{ver}")
        if fs.exists(seg) and len(fs.listStatus(seg)) == 0:
            fs.delete(seg, True)
    marker = jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{ver}.committed")
    fs.create(marker, False).close()
    return ver


def _manifest_path(jvm, root: str, version: int):
    return jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{version}.manifest")


def read_manifest(
    spark: SparkSession, root: str, version: int
) -> dict[str, str] | None:
    """Partition manifest of one version: ``{partition token: data dir
    relative to root}``. ``None`` for legacy full-directory versions."""
    fs, jvm = _fs(spark, root)
    p = _manifest_path(jvm, root, version)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _write_manifest(
    spark: SparkSession, root: str, version: int, manifest: dict[str, str]
) -> None:
    fs, jvm = _fs(spark, root)
    out = fs.create(_manifest_path(jvm, root, version), True)
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True).encode()))
    finally:
        out.close()


def commit_snapshot_partitioned(
    changed: DataFrame,
    root: str,
    part_col: str,
    part_values: list | None = None,
    migrate_legacy: bool = False,
    drop_part_values: list | None = None,
) -> int:
    """Publish the next version rewriting ONLY the touched partitions.

    ``changed`` must hold the complete post-merge contents of the
    partitions it covers (and nothing else). Each touched partition is
    written to a fresh immutable dir ``seg/v<N>/<token>``; the new
    manifest maps every partition to its data dir, reusing the previous
    version's entries for untouched partitions — their files are never
    rewritten, so a trigger costs O(touched partitions), not O(table).
    The marker creation stays the single atomic publish step; a crash
    at any point leaves only invisible dirs and the previous manifest
    readable. ``part_values`` skips the distinct-scan when the caller
    already knows the touched set (O(#partitions) metadata, cheap).

    Committing on top of a legacy full-directory version raises unless
    ``migrate_legacy=True``: the legacy snapshot has no partition dirs
    to reuse, so a partial commit would silently drop every untouched
    row. With ``migrate_legacy=True`` the caller asserts ``changed``
    holds the COMPLETE table, materializing it into per-partition dirs
    as the one-time migration step.

    ``drop_part_values`` removes whole partitions from the new version's
    manifest without writing anything for them — the partition-drop
    primitive behind retention and erasure (a fully-erased partition
    must disappear from the manifest, not become an empty dir that
    breaks schema inference). Dropped dirs stay on disk for time travel
    until :func:`vacuum` reclaims them."""
    spark = changed.sparkSession
    prev = current_version(spark, root)
    manifest: dict[str, str] = {}
    if prev:
        prev_manifest = read_manifest(spark, root, prev)
        if prev_manifest is None and not migrate_legacy:
            # a legacy full-directory snapshot has no per-partition dirs
            # to reuse: starting an empty manifest here would publish a
            # version that silently LOSES every untouched row
            raise ValueError(
                f"snapshot v={prev} under {root} is a legacy full-directory "
                "version with no partition manifest; a partitioned commit "
                "on top of it would drop all untouched partitions. Pass "
                "migrate_legacy=True with the COMPLETE table contents to "
                "materialize it into per-partition dirs once, or keep "
                "using commit_snapshot."
            )
        manifest = dict(prev_manifest or {})
    ver = (prev or 0) + 1
    changed = changed.persist()
    try:
        if part_values is None:
            part_values = [r[0] for r in changed.select(part_col).distinct().collect()]
        for val in sorted(part_values, key=str):
            token = _part_token(val)
            rel = f"seg/v{ver}/{token}"
            # overwrite, not error: the dir is invisible until the marker
            # exists, and a replayed batch that crashed mid-write must be
            # able to redo its own half-written dir. eqNullSafe: a null
            # partition value (to_date of a null ts) must land in its
            # reserved dir, not silently match nothing and vanish.
            changed.where(F.col(part_col).eqNullSafe(F.lit(val))).write.mode(
                "overwrite"
            ).parquet(f"{root}/{rel}")
            manifest[token] = rel
    finally:
        changed.unpersist()
    for val in drop_part_values or []:
        manifest.pop(_part_token(val), None)
    _write_manifest(spark, root, ver, manifest)
    fs, jvm = _fs(spark, root)
    fs.create(jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{ver}.committed"), False).close()
    return ver


def onepass_tokens_ok(part_values: list) -> bool:
    """True iff every touched value round-trips the manifest token
    scheme verbatim AND none is null — the precondition for
    :func:`commit_snapshot_partitioned_onepass`, whose manifest tokens
    are taken from Spark's own partition-dir names. A null value would
    land under Hive's ``__HIVE_DEFAULT_PARTITION__`` dir (not the
    store's reserved null token), and a sanitized value would not
    round-trip; both keep the per-partition loop path. ``=`` is token-
    clean but Hive-escaped in directory names, so it is excluded too."""
    return all(
        v is not None and _part_token(v) == str(v) and "=" not in str(v)
        for v in part_values
    )


def commit_snapshot_partitioned_onepass(
    changed: DataFrame,
    root: str,
    part_col: str,
    part_values: list,
    drop_part_values: list | None = None,
) -> int:
    """One-Spark-job sibling of :func:`commit_snapshot_partitioned` for
    batches that touch MANY partitions: identical manifest-splice
    contract (untouched entries reused verbatim, touched partitions
    rewritten under ``seg/v<N>``), but the touched dirs are laid down
    by a single dynamic ``partitionBy`` write instead of one
    filter-and-write Spark job per partition. The loop path is the
    right trade for a trigger touching a handful of days; a batch
    touching every day of a month is 30 sequential jobs there (and a
    100 TB churn batch thousands) against exactly one here — job-count
    O(1) vs O(touched partitions), same committed bytes.

    Two contract refinements over the loop, both strictly safer:
    - a touched partition whose post-merge contents are EMPTY simply
      produces no dir and drops out of the manifest (the loop path
      needs the caller to pre-compute that set or it publishes an
      empty dir that breaks schema inference);
    - ``changed`` is evaluated exactly once (the loop persists it and
      re-filters per partition).

    Requires :func:`onepass_tokens_ok` — every touched value must be
    non-null and render its own manifest token (dates/ints/safe
    strings; the streaming sink's ``p_day`` always does). The data
    files keep ``part_col`` (a duplicate ``__part`` column drives the
    layout), so readers see the loop path's schema."""
    spark = changed.sparkSession
    prev = current_version(spark, root)
    manifest: dict[str, str] = {}
    if prev:
        prev_manifest = read_manifest(spark, root, prev)
        if prev_manifest is None:
            raise ValueError(
                f"snapshot v={prev} under {root} is a legacy full-directory "
                "version with no partition manifest; use "
                "commit_snapshot_partitioned(migrate_legacy=True) for the "
                "one-time migration."
            )
        manifest = dict(prev_manifest)
    if not onepass_tokens_ok(part_values):
        raise ValueError(
            "onepass partitioned commit requires non-null, token-clean "
            "partition values; use commit_snapshot_partitioned for values "
            "that need sanitizing"
        )
    ver = (prev or 0) + 1
    seg_rel = f"seg/v{ver}"
    # static overwrite of the whole unpublished seg dir: a crashed
    # earlier attempt at this version number is wholly replaced
    (
        changed.withColumn("__part", F.col(part_col))
        .write.mode("overwrite")
        .partitionBy("__part")
        .parquet(f"{root}/{seg_rel}")
    )
    fs, jvm = _fs(spark, root)
    produced: dict[str, str] = {}
    for status in fs.listStatus(jvm.org.apache.hadoop.fs.Path(f"{root}/{seg_rel}")):
        name = status.getPath().getName()
        if not status.isDirectory() or not name.startswith("__part="):
            continue
        raw = name[len("__part=") :]
        if _part_token(raw) != raw:
            raise ValueError(
                f"onepass partition value {raw!r} does not round-trip the "
                "manifest token scheme; use commit_snapshot_partitioned"
            )
        produced[raw] = f"{seg_rel}/{name}"
    # every produced dir must correspond to a DECLARED touched value:
    # a changed-row value outside part_values, a NULL (Hive's
    # __HIVE_DEFAULT_PARTITION__ dir, which round-trips the token check
    # above), or a float whose JVM rendering differs from Python's
    # str() would otherwise silently publish under a wrong token or
    # overwrite an untouched partition's manifest entry
    unexpected = set(produced) - {_part_token(v) for v in part_values}
    if unexpected:
        raise ValueError(
            "onepass partitioned commit produced partition dirs outside "
            f"the declared part_values: {sorted(unexpected)!r}"
        )
    # touched-but-now-empty partitions produced no dir: they leave the
    # manifest here, which is exactly the loop path's `drop` semantics
    for val in list(part_values) + list(drop_part_values or []):
        manifest.pop(_part_token(val), None)
    manifest.update(produced)
    if not manifest:
        raise ValueError(
            f"onepass partitioned commit under {root} would publish an "
            "empty manifest (no partitions written or reused); refusing"
        )
    orphan = _manifest_path(jvm, root, ver)
    if fs.exists(orphan):
        # a crashed earlier attempt's manifest; its data dirs lived
        # under seg/v<ver>, which the static overwrite just replaced
        fs.delete(orphan, False)
    _write_manifest(spark, root, ver, manifest)
    fs.create(jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{ver}.committed"), False).close()
    return ver


def commit_snapshot_bulk_partitioned(
    changed: DataFrame, root: str, part_col: str
) -> int:
    """Publish the next version writing ALL partitions in ONE Spark job.

    :func:`commit_snapshot_partitioned` filters-and-writes each touched
    partition separately — one job per partition, the right trade for
    an incremental merge touching a handful of days, catastrophic for a
    full-table publish with thousands of partitions (the corpus export
    produces one shard dir per ~target tokens; at rehearsal scale that
    was ~1800 sequential jobs). This sibling uses dynamic ``partitionBy``
    so the shuffle-free single pass lays every partition dir down at
    once, then builds the manifest from the directories the write
    actually produced.

    Contract differences from the incremental sibling:
    - ``changed`` must be the COMPLETE table: no previous-manifest
      entries are reused (an absent partition disappears — which is the
      correct replace semantics for a full publish).
    - ``part_col`` values must render cleanly in a directory name
      (ints, dates, ``[A-Za-z0-9_.-]`` strings): the manifest token is
      taken from Spark's own partition-dir naming, and a value Spark
      URL-escapes would not round-trip through :func:`_part_token`'s
      scheme — such a write raises rather than publishing a manifest
      readers cannot address.

    Crash-atomicity is the family contract: data lands under an
    unpublished ``seg/v<N>/`` (static overwrite, so a crashed previous
    attempt at the same version is wholly replaced), the manifest is
    written next, and the marker creation publishes. The data files
    KEEP ``part_col`` (a duplicate column drives the layout), so
    readers see the same schema as the incremental path produces."""
    spark = changed.sparkSession
    ver = (current_version(spark, root) or 0) + 1
    seg_rel = f"seg/v{ver}"
    (
        changed.withColumn("__part", F.col(part_col))
        .write.mode("overwrite")
        .partitionBy("__part")
        .parquet(f"{root}/{seg_rel}")
    )
    fs, jvm = _fs(spark, root)
    seg = jvm.org.apache.hadoop.fs.Path(f"{root}/{seg_rel}")
    manifest: dict[str, str] = {}
    for status in fs.listStatus(seg):
        name = status.getPath().getName()
        if not status.isDirectory() or not name.startswith("__part="):
            continue
        raw = name[len("__part=") :]
        if _part_token(raw) != raw:
            raise ValueError(
                f"bulk partition value {raw!r} does not round-trip the "
                f"manifest token scheme; use commit_snapshot_partitioned "
                f"for values that need sanitizing"
            )
        manifest[raw] = f"{seg_rel}/{name}"
    if not manifest:
        # an empty input writes no partition dirs: publishing a version
        # whose manifest is empty (marker created, nothing readable)
        # would wedge readers with an unresolvable snapshot — refuse,
        # mirroring export_corpus_shards' empty-corpus guard
        raise ValueError(
            f"bulk partitioned commit of an EMPTY DataFrame under {root}: "
            "no partition directories were produced; refusing to publish "
            "an empty-manifest version"
        )
    orphan = _manifest_path(jvm, root, ver)
    if fs.exists(orphan):
        # a crashed earlier attempt's manifest; its data dirs lived
        # under seg/v<ver>, which the static overwrite just replaced
        fs.delete(orphan, False)
    _write_manifest(spark, root, ver, manifest)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{ver}.committed"), False
    ).close()
    return ver


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the latest committed snapshot, or ``version`` (time travel).

    Manifest-based (partition-scoped) versions resolve to the union of
    their partition dirs; legacy versions read ``v=N`` directly. Asking
    for an uncommitted/unknown version raises — a half-written
    directory must never be readable."""
    versions = committed_versions(spark, root)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(f"snapshot v={version} not committed under {root}")
    manifest = read_manifest(spark, root, version)
    if manifest is not None:
        dirs = sorted({f"{root}/{rel}" for rel in manifest.values()})
        if not dirs:
            raise FileNotFoundError(f"snapshot v={version} under {root} is empty")
        return spark.read.parquet(*dirs)
    return spark.read.parquet(f"{root}/v={version}")


def read_snapshot_parts(
    spark: SparkSession,
    root: str,
    part_values: list,
    version: int | None = None,
) -> DataFrame | None:
    """Read ONLY the given partitions of a manifest-based snapshot —
    the partition-pruned path the streaming sink uses to merge a batch
    without scanning the table. Returns ``None`` when none of the
    requested partitions exist yet (all-new days)."""
    versions = committed_versions(spark, root)
    if not versions:
        return None
    if version is None:
        version = versions[-1]
    elif version not in versions:
        # same contract as read_snapshot: an uncommitted version number
        # must never resolve — a crashed partitioned commit can leave an
        # orphan manifest whose data dirs were never published
        raise FileNotFoundError(
            f"snapshot version {version} not committed under {root}"
        )
    manifest = read_manifest(spark, root, version)
    if manifest is None:
        raise ValueError(
            f"snapshot v={version} under {root} is not partition-manifest based"
        )
    tokens = {_part_token(v) for v in part_values}
    dirs = sorted(
        {f"{root}/{rel}" for tok, rel in manifest.items() if tok in tokens}
    )
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def vacuum(spark: SparkSession, root: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots (markers first,
    so a reader racing the vacuum never resolves a half-deleted
    version). Manifest-based versions share partition dirs across
    versions, so a data dir is only deleted when NO kept manifest still
    references it. Returns the versions removed."""
    fs, jvm = _fs(spark, root)
    versions = committed_versions(spark, root)
    victims = versions[:-keep_last] if keep_last > 0 else versions
    kept = [v for v in versions if v not in victims]
    referenced: set[str] = set()
    for ver in kept:
        referenced |= set((read_manifest(spark, root, ver) or {}).values())
    candidates: set[str] = set()
    for ver in victims:
        candidates |= set((read_manifest(spark, root, ver) or {}).values())
    for ver in victims:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{ver}.committed"), False)
        fs.delete(_manifest_path(jvm, root, ver), False)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v={ver}"), True)
    for rel in sorted(candidates - referenced):
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}"), True)
    # tidy now-empty seg/v<N> parents of removed versions
    for ver in victims:
        seg = jvm.org.apache.hadoop.fs.Path(f"{root}/seg/v{ver}")
        if fs.exists(seg) and len(fs.listStatus(seg)) == 0:
            fs.delete(seg, True)
    return victims


def _batch_marker(root: str, batch_id: int, app_id: str | None) -> str:
    prefix = f"_batch_{_part_token(app_id)}_" if app_id else "_batch_"
    return f"{root}/{prefix}{batch_id}.committed"


def batch_committed(
    spark: SparkSession, root: str, batch_id: int, app_id: str | None = None
) -> bool:
    """Whether a streaming micro-batch id has already been applied to
    this store (see :func:`mark_batch`)."""
    fs, jvm = _fs(spark, root)
    return fs.exists(
        jvm.org.apache.hadoop.fs.Path(_batch_marker(root, batch_id, app_id))
    )


def mark_batch(
    spark: SparkSession, root: str, batch_id: int, app_id: str | None = None
) -> None:
    """Record that micro-batch ``batch_id`` is fully applied. Written
    AFTER the snapshot marker: a crash between the two replays the
    batch on restart, and the replay sees ``batch_committed`` False and
    re-merges — latest-wins merging makes the replay idempotent, so the
    store converges to exactly-once contents either way.

    ``app_id`` scopes the marker to one logical stream (Delta's
    txnAppId idea): batch ids restart at 0 under a fresh checkpoint, so
    WITHOUT an app id, re-pointing a rebuilt stream at an existing
    store would find the old run's ``_batch_0`` marker and silently
    skip its first batches. Sinks pass their checkpoint-stable identity
    here; ``None`` keeps the legacy single-stream marker name."""
    fs, jvm = _fs(spark, root)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(_batch_marker(root, batch_id, app_id)), False
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


def erase_keys(
    spark: SparkSession,
    root: str,
    key: str,
    ids,
    part_col: str | None = None,
) -> dict:
    """Right-to-be-forgotten delete writer: publish a new version with
    every row whose ``key`` is in the erasure list removed. This is the
    write path :func:`plans.pipeline_queries.user_erasure` dry-runs as
    an audit, and the pipeline-scale form of the reference's
    ``DeleteUser`` FK cascade (internal/db/user.go:125).

    Scale shape: the erasure list is subject-sized (people, not rows) →
    broadcast. On a manifest-based store a column-pruned semi-join scan
    of (key, part_col) first finds the TOUCHED partitions; only those
    are anti-joined and rewritten, every untouched partition's manifest
    entry is reused byte-identical — O(subject's partitions), not
    O(table), which is the difference between a minutes-job and a
    full-table rewrite at 100 TB. A partition whose every row is erased
    is dropped from the manifest rather than written empty. The old
    version stays readable for time travel until :func:`vacuum` — run
    vacuum to make erasure physical, as GDPR requires.

    ``ids`` is a DataFrame with column ``key`` or a plain list of key
    values. Returns an audit dict: new ``version`` (``None`` when no
    row matched — nothing is published), ``rows_erased``,
    ``partitions_rewritten``, ``partitions_dropped``.
    """
    if not isinstance(ids, DataFrame):
        field = read_snapshot(spark, root).schema[key]
        ids = spark.createDataFrame(
            [(v,) for v in ids], schema=f"{key} {field.dataType.simpleString()}"
        )
    ids = ids.select(key).distinct()

    manifest = read_manifest(spark, root, current_version(spark, root) or 0)
    if manifest is not None and part_col is None:
        raise ValueError(
            f"store under {root} is partition-manifest based; pass part_col so "
            "erasure rewrites only the touched partitions"
        )

    if manifest is None:
        # legacy full-directory snapshot: one anti-join, full rewrite
        snap = read_snapshot(spark, root)
        erased = snap.join(F.broadcast(ids), key, "left_semi").count()
        if erased == 0:
            return {
                "version": None,
                "rows_erased": 0,
                "partitions_rewritten": 0,
                "partitions_dropped": 0,
            }
        kept = snap.join(F.broadcast(ids), key, "left_anti")
        ver = commit_snapshot(kept, root)
        return {
            "version": ver,
            "rows_erased": erased,
            "partitions_rewritten": 0,
            "partitions_dropped": 0,
        }

    # column-pruned probe: which partitions hold the subject's rows?
    snap = read_snapshot(spark, root)
    touched = [
        r[0]
        for r in snap.select(key, part_col)
        .join(F.broadcast(ids), key, "left_semi")
        .select(part_col)
        .distinct()
        .collect()
    ]
    if not touched:
        return {
            "version": None,
            "rows_erased": 0,
            "partitions_rewritten": 0,
            "partitions_dropped": 0,
        }
    parts = read_snapshot_parts(spark, root, touched)
    kept = parts.join(F.broadcast(ids), key, "left_anti").persist()
    try:
        erased = parts.count() - kept.count()
        survivors = {
            r[0]
            for r in kept.select(part_col).distinct().collect()
        }
        rewrite = [v for v in touched if v in survivors]
        drop = [v for v in touched if v not in survivors]
        # ``kept`` holds exactly the surviving rows of the touched
        # partitions (read_snapshot_parts read nothing else), so it is
        # the complete post-erasure contents of the rewrite set; no
        # prefilter (isin would silently drop a null partition value).
        ver = commit_snapshot_partitioned(
            kept,
            root,
            part_col,
            part_values=rewrite,
            drop_part_values=drop,
        )
    finally:
        kept.unpersist()
    return {
        "version": ver,
        "rows_erased": erased,
        "partitions_rewritten": len(rewrite),
        "partitions_dropped": len(drop),
    }
