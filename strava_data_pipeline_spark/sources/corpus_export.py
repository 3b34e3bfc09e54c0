"""Curated-corpus export: token-budget shards through the versioned store.

The curation operators plan (corpus_shard_plan) and pack (corpus_pack_bins)
but nothing previously WROTE a curated corpus to disk as an audited,
replayable artifact — the one pipeline half with no on-disk face (r8
VERDICT). This module closes the loop with the sync_audit discipline
applied to corpus export:

- shard assignment is corpus_shard_plan's exact contract: shard_id =
  exclusive token prefix-sum DIV target under the deterministic global
  hash order (h, doc_id), computed skew-immune through
  operators/bucketed_prefix.bucketed_cumsum (constant key, 64 contiguous
  hash-range buckets — the sequential dependency rides one summary row
  per bucket, never the corpus);
- the write goes through sources/versioned.commit_snapshot_bulk_partitioned
  — ONE Spark job lays down every shard dir via dynamic partitionBy
  (the incremental per-partition commit loop would cost one job per
  shard: thousands for a real export), manifest + marker publish — a
  crash at any point leaves the previous export fully readable and the
  half-written shards invisible;
- replay is CONTENT-idempotent: a fingerprint of the kept set (exact
  BIGINT triple, order-insensitive) rides a sidecar next to the version
  marker, and re-exporting identical content returns the existing
  version without writing a byte. Changed content gets a new version —
  time travel across curation runs for free.

Reference parity: the reference's sync job persists fetched activities
once and skips unchanged re-syncs (internal/strava/strava.go:261,
internal/db/db.go:118); this is the same publish-once contract for the
training-corpus artifact.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_data_pipeline_spark.operators.bucketed_prefix import (
    bucketed_cumsum,
)
from strava_data_pipeline_spark.sources.versioned import (
    _fs,
    commit_snapshot_bulk_partitioned,
    current_version,
)

# 64 contiguous hash ranges over the 32-bit md5_u32 domain: bucket b's
# rows all precede bucket b+1's in (h, doc_id) order — the contiguity
# the two-phase carry requires (same constant as corpus_shard_plan)
_HASH_BUCKET_WIDTH = 67_108_864


def assign_shards(kept: DataFrame, target_tokens: int) -> DataFrame:
    """Attach ``shard_id`` to a kept frame of (doc_id, h, n_tokens, ...).

    Exclusive token prefix sum in (h, doc_id) order DIV target — shards
    fill to ~target tokens and spill the boundary doc into the next
    (sizes land in [target - max_doc + 1, target + max_doc - 1]). The
    global prefix sum runs through bucketed_cumsum so no single task
    ever sorts the whole corpus.
    """
    base = kept.withColumns(
        {"gkey": F.lit(1), "hbucket": F.expr(f"h DIV {_HASH_BUCKET_WIDTH}")}
    )
    cum = bucketed_cumsum(
        base, "gkey", "hbucket", ["h", "doc_id"], {"cum_incl": "n_tokens"}
    )
    return cum.withColumn(
        "shard_id",
        F.expr(f"(cum_incl - n_tokens) DIV {target_tokens}").cast("bigint"),
    ).drop("gkey", "hbucket", "cum_incl")


def _fingerprint(kept: DataFrame) -> list[int]:
    """Order-insensitive exact-BIGINT content fingerprint of the kept
    set: (n_docs, sum tokens, sum of the 32-bit md5 of the row's
    identity triple). Pure integer arithmetic — no float partial-sum
    order, no collation, nothing an environment can render differently.
    """
    row = kept.select(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("t"),
        F.coalesce(
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", "doc_id", "n_tokens", "h")),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("s"),
    ).collect()[0]
    return [int(row["n"]), int(row["t"]), int(row["s"])]


def _sidecar_path(jvm, root: str, version: int):
    return jvm.org.apache.hadoop.fs.Path(f"{root}/_v_{version}.export")


def _read_sidecar(spark: SparkSession, root: str, version: int) -> dict | None:
    fs, jvm = _fs(spark, root)
    p = _sidecar_path(jvm, root, version)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _write_sidecar(
    spark: SparkSession, root: str, version: int, payload: dict
) -> None:
    fs, jvm = _fs(spark, root)
    out = fs.create(_sidecar_path(jvm, root, version), True)
    try:
        out.write(bytearray(json.dumps(payload, sort_keys=True).encode()))
    finally:
        out.close()


def export_corpus_shards(
    kept: DataFrame, root: str, target_tokens: int
) -> tuple[int, bool]:
    """Publish the kept corpus as token-budget shards; returns
    ``(version, wrote)``.

    ``kept`` must carry ``doc_id`` (unique), ``h`` (the md5_u32 content
    hash — the deterministic global order), ``n_tokens``, and whatever
    payload columns the shards should hold (text, lang, ...). If the
    latest committed export's fingerprint matches the kept set, the
    call is a NO-OP returning ``(existing_version, False)`` — replay
    adds no version. The fingerprint sidecar is written after the
    marker, so a crash exactly between the two costs one redundant
    version on the next replay (content converges regardless — the
    at-least-once window every two-artifact publish has).
    """
    spark = kept.sparkSession
    # persist only if the caller didn't: a caller invoking export twice
    # (publish + replay no-op check, the e2e contract) persists `kept`
    # around BOTH calls — unpersisting it here after the first call
    # would force the replay's fingerprint to re-run the whole upstream
    # curation pipeline from parquet
    owned = not kept.is_cached
    if owned:
        kept = kept.persist()
    try:
        fp = _fingerprint(kept)
        cur = current_version(spark, root)
        if cur is not None:
            side = _read_sidecar(spark, root, cur)
            if (
                side is not None
                and side.get("fingerprint") == fp
                and side.get("target_tokens") == target_tokens
            ):
                return cur, False
        if fp[0] == 0:
            # an all-filtered corpus is a pipeline FAULT, not an
            # artifact: publishing would create a version whose empty
            # manifest no reader can resolve. Fail loudly upstream.
            raise ValueError(
                "refusing to publish an empty corpus export "
                "(kept set has zero documents)"
            )
        # bulk single-pass publish: an export lays down THOUSANDS of
        # shard dirs (one per ~target tokens); the incremental
        # per-partition loop would cost one Spark job each
        sharded = assign_shards(kept, target_tokens)
        ver = commit_snapshot_bulk_partitioned(sharded, root, "shard_id")
        _write_sidecar(
            spark,
            root,
            ver,
            {"fingerprint": fp, "target_tokens": target_tokens},
        )
        return ver, True
    finally:
        if owned:
            kept.unpersist()
