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


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Real binary-PPM (P6) writer: header + raw interleaved RGB rows.
    ``pixels`` must be exactly ``3 * width * height`` bytes."""
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"P6 {width}x{height} needs {3 * width * height} pixel bytes, "
            f"got {len(pixels)}"
        )
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer header tokens (with
    ``#`` comment support per the netpbm spec) starting after the
    magic; returns (tokens, offset of the first raster byte)."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    cur = b""
    while len(toks) < n:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[i : i + 1]
        if c == b"#":
            if cur:
                toks.append(int(cur))
                cur = b""
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise ValueError(f"bad PPM header byte {c!r} at offset {i}")
        i += 1
    # the single whitespace after maxval was consumed by the loop
    return toks, i


def decode_image(payload: bytes) -> dict:
    """Image decode. REAL for binary PPM (P6): header parse (whitespace
    + ``#`` comments per the netpbm spec) and raw RGB raster — a pure-
    python decoder needing no codec libs, exercised end-to-end through
    the Arrow path by the ``multimodal_decode`` registry query.
    Compressed formats (JPEG/PNG/...) remain STUBBED: their codecs are
    not in this container; swap in PIL.Image.open on a real cluster.
    """
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    if payload[:2] == b"P6":
        (w, h, maxval), off = _ppm_tokens(payload, 3)
        if maxval <= 0 or maxval > 255:
            raise ValueError(f"unsupported P6 maxval {maxval}")
        raster = payload[off : off + 3 * w * h]
        if len(raster) != 3 * w * h:
            raise ValueError(
                f"P6 raster truncated: {len(raster)} of {3 * w * h} bytes"
            )
        return {
            "format": "ppm",
            "width": w,
            "height": h,
            "maxval": maxval,
            "pixels": raster,
        }
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


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("mean_r_q4", LongType()),
        StructField("mean_g_q4", LongType()),
        StructField("mean_b_q4", LongType()),
    ]
)


def plant_ppm(x: int) -> bytes:
    """Deterministic planted P6 image for hash seed ``x`` (md5_u32 of
    the doc text, computed JVM-side): width 4+x%13, height 4+(x//7)%9,
    raster byte k = (x%251 + k) % 256 — every header field and every
    pixel is a pure function of ``x``, so a DuckDB oracle can compute
    the decoded stats arithmetically while the Spark path round-trips
    REAL image bytes through encode_ppm → Arrow → decode_image."""
    w = 4 + x % 13
    h = 4 + (x // 7) % 9
    base = x % 251
    raster = bytes((base + k) % 256 for k in range(3 * w * h))
    return encode_ppm(w, h, raster)


def attach_ppm_payload(docs_with_seed: DataFrame) -> DataFrame:
    """mapInPandas plant stage: (doc_id, x) → (doc_id, payload binary).
    A separate Python stage from the decoder on purpose: the payload
    crosses the Arrow boundary as a real binary column, so the decode
    stage downstream parses bytes it did not just build in-process."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [plant_ppm(int(x)) for x in pdf["x"]],
                }
            )

    return docs_with_seed.select("doc_id", "x").mapInPandas(batches, schema)


def extract_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: parse each P6 payload with
    decode_image and reduce the raster to per-channel sums and exact
    1e-4-unit means ((sum*10000)//n — positive floor division, so
    Spark DIV and DuckDB // agree). numpy does the channel reduction
    per payload; rows map 1:1 so Spark keeps pipelining."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_image(payload)
                px = np.frombuffer(d["pixels"], dtype=np.uint8)
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                n_pix = d["width"] * d["height"]
                rows.append(
                    (
                        int(doc_id),
                        d["width"],
                        d["height"],
                        n_pix,
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                        int(sums[0]) * 10000 // n_pix,
                        int(sums[1]) * 10000 // n_pix,
                        int(sums[2]) * 10000 // n_pix,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, IMAGE_STATS_SCHEMA
    )
