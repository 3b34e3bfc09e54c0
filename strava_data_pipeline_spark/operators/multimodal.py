"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a typed metadata struct. The Spark-side machinery — schema, Arrow-batch
UDF signatures, ``mapInPandas`` partitioning — is real and tested; the
actual codec step is STUBBED (``NotImplementedError``) because media
libraries are not available in this environment. ``fake_decode`` is the
deterministic stand-in used by tests: it exercises the exact same
batch shapes a real decoder would.

At 100 TB the payload column dominates I/O: keep it in its own parquet
column (column pruning skips it unless requested), partition by a
content-derived bucket, and size ``maxPartitionBytes`` so one task's
Arrow batches fit executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from strava_data_pipeline_spark.functions.hashing import md5_u32

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", IntegerType()),
        StructField("hist_0", LongType()),
        StructField("hist_1", LongType()),
        StructField("hist_2", LongType()),
        StructField("hist_3", LongType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque media payload with
    deterministic typed metadata — the ingestion half of the multimodal
    path, all built-in functions."""
    x = md5_u32(F.col("text"))
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.lit(64) + x % 1857).cast("int").alias("width"),
        (F.lit(64) + F.floor(x / 7) % 1017).cast("int").alias("height"),
        (F.lit(1) + x % 30).cast("int").alias("n_frames"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: PIL/opencv are not in this container."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; "
        "swap in PIL.Image.open(io.BytesIO(payload)) on a real cluster"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize — STUB (see decode_image)."""
    raise NotImplementedError("media codecs unavailable; see decode_image")


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Real video frame sampling — STUB (see decode_image)."""
    raise NotImplementedError("media codecs unavailable; see decode_image")


def fake_decode(payload: bytes) -> dict:
    """Deterministic decoder stand-in: byte stats instead of pixels.

    Returns the same shape of result a real decoder feeds downstream,
    so the Arrow/mapInPandas plumbing is fully exercised in tests.
    A null payload (a doc with no media / null text upstream) decodes
    to the zero-feature row instead of TypeError-ing the executor —
    one bad row must never kill the batch.
    """
    if payload is None:
        return {"n_bytes": 0, "mean_byte": 0, "hist": [0, 0, 0, 0]}
    n = len(payload)
    mean = int(sum(payload) / n) if n else 0
    hist = [0, 0, 0, 0]
    for b in payload:
        hist[b >> 6] += 1
    return {"n_bytes": n, "mean_byte": mean, "hist": hist}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payloads via mapInPandas.

    This is the slow-path pattern done right: batches arrive as pandas
    DataFrames (vectorized transfer), the decode loop is per-payload
    (unavoidable for codecs), and output rows map 1:1 so Spark can keep
    pipelining. Swap ``fake_decode`` for a real codec on a cluster.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "mean_byte": [d["mean_byte"] for d in decoded],
                    "hist_0": [d["hist"][0] for d in decoded],
                    "hist_1": [d["hist"][1] for d in decoded],
                    "hist_2": [d["hist"][2] for d in decoded],
                    "hist_3": [d["hist"][3] for d in decoded],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)
