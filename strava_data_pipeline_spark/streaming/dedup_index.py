"""Streaming near-dup dedup against a persisted signature index.

The streaming twin of ``dedup_incremental`` (operators/dedup.py::
minhash_incremental_pairs): each micro-batch of documents is judged
against every document EVER KEPT — the minhash signature index lives in
the versioned snapshot store — plus its own earlier members, and only
the survivors flow downstream and join the index. This is the loop a
training-data platform actually runs on a crawl feed: per-trigger text
work is O(batch) (only the batch shingles/hashes; the corpus
contributes its already-computed 17-column signature rows), and the
verdict rules are the batch operator's exactly (index always wins,
lower id wins within the batch), so replaying history through the
stream reproduces the batch pipeline's keep-list.

Exactly-once story (the versioned_sink protocol): per batch the commit
order is kept-docs dir → index snapshot → batch marker. The kept-docs
write is a per-batch-id subdir overwrite, so a replay after any crash
rewrites the same rows instead of appending duplicates; a replay after
the index snapshot but before the marker re-merges the same signatures
— a set-union no-op by value; a marked batch is skipped outright.

Scale notes: the judge prunes the index band table to the BATCH's
bucket keys before any shuffle (minhash_incremental_pairs' probe-
bucket semi-join), so per-trigger exchange work is O(batch x bucket)
and the index side is only ever a map-side scan. What stays O(index)
per trigger is that scan plus the FULL snapshot rewrite — signatures
are ~70 bytes/doc, so the index for a 1e9-doc corpus is ~70 GB, at
which point the upgrade path is the partitioned store
(commit_snapshot_partitioned on a doc_id-range column) so each trigger
rewrites only touched ranges. That upgrade changes this module only —
the operator and verdict rules are shared with the batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from strava_data_pipeline_spark.operators.dedup import (
    minhash_incremental_pairs,
    minhash_signatures,
)
from strava_data_pipeline_spark.sources.versioned import (
    batch_committed,
    commit_snapshot,
    current_version,
    mark_batch,
    read_snapshot,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING"


def read_doc_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream of raw documents (explicit schema — a
    streaming source must never pay an inference scan)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def start_minhash_dedup_sink(
    doc_stream: DataFrame,
    index_root: str,
    kept_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.75,
    app_id: str | None = None,
) -> StreamingQuery:
    """Stream → (kept docs, signature index). Each micro-batch:

    1. shingle + minhash ONLY the batch (docs too short to shingle have
       no signature and trivially keep — nothing to match);
    2. judge batch signatures against the index snapshot ∪ earlier
       batch members (minhash_incremental_pairs, est ≥ ``threshold``);
    3. overwrite ``kept_dir/batch=<id>/`` with the surviving doc rows
       (idempotent under replay);
    4. commit index ∪ survivors' signatures as the next store version;
    5. mark the batch id.
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch_committed(spark, index_root, batch_id, app_id=app_id):
            return
        batch = batch.persist()
        # Persist the TRIGGER-SIZED signature frame, not the full
        # index ∪ batch union the judge consumes: the operator's
        # probe-bucket prune (minhash_incremental_pairs) reads the
        # index side as a map-only parquet scan filtered by a
        # broadcast of the batch's bucket keys, so caching the whole
        # index per trigger was an O(index) materialization that
        # bought nothing — only the batch's shingle→minhash pipeline
        # is worth pinning (it feeds the probe keys, the band table,
        # the est joins and the commit below).
        sig_new = (
            minhash_signatures(batch)
            .withColumn("is_new", F.lit(True))
            .persist()
        )
        index = None
        if current_version(spark, index_root) is not None:
            index = read_snapshot(spark, index_root)
            sig_all = index.withColumn("is_new", F.lit(False)).unionByName(
                sig_new
            )
        else:
            sig_all = sig_new
        dropped = (
            minhash_incremental_pairs(sig_all, persist_sig=False)
            .where(F.col("est_jaccard") >= threshold)
            .select(F.col("new_doc").alias("doc_id"))
            .distinct()
        )
        kept = batch.join(dropped, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(
            os.path.join(kept_dir, f"batch={batch_id}")
        )
        # Survivor ids come BACK from the parquet just committed — a
        # trigger-sized scan that cuts the lineage to the judge
        # pipeline. ``kept`` itself is unpersisted lineage through
        # minhash_incremental_pairs; using it to build the two
        # broadcast id sets below re-ran the whole band-join judge
        # once PER BROADCAST (measured: the index-commit write grew
        # 3.3s -> 11.1s across four triggers at sf0.1). The committed
        # file is also the exactly-once source of truth for what
        # survived.
        kept_ids = spark.read.parquet(
            os.path.join(kept_dir, f"batch={batch_id}")
        ).select("doc_id")
        # derive the survivors' signatures from the PERSISTED sig_new
        # (cache hit) — carving them out of a bare sig_new subtree
        # re-ran the whole shingle→hash→min pipeline a second time per
        # trigger for the index commit's write
        new_kept_sigs = sig_new.drop("is_new").join(
            F.broadcast(kept_ids), "doc_id", "left_semi"
        )
        # A crash-replayed batch's survivors are ALREADY in the index —
        # the union must re-merge them as a no-op by value, not grow a
        # second signature row per doc. A broadcast anti-join of the
        # index against the batch-sized id set does that without the
        # full-index exchange a dropDuplicates pays per trigger: the
        # index side never shuffles, which is also the 100 TB shape
        # (index O(corpus), batch ids O(trigger)). The anti-join key is
        # the SIGNATURE-BEARING survivors' ids, not all kept ids: a
        # kept doc that produced no signature this batch (too short to
        # shingle) must never evict an index row — under the doc_id-
        # unique replay contract the two key sets are equal, this one
        # is safe even outside it.
        kept_sigs = (
            index.join(
                F.broadcast(new_kept_sigs.select("doc_id")),
                "doc_id",
                "left_anti",
            ).unionByName(new_kept_sigs)
            if index is not None
            else new_kept_sigs
        )
        commit_snapshot(kept_sigs, index_root)
        mark_batch(spark, index_root, batch_id, app_id=app_id)
        sig_new.unpersist()
        batch.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kept_docs(spark: SparkSession, kept_dir: str) -> DataFrame:
    """All documents that survived dedup, across every batch."""
    return spark.read.schema(DOC_SCHEMA).parquet(
        os.path.join(kept_dir, "batch=*")
    )
