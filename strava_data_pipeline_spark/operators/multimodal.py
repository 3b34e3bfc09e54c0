"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a typed metadata struct. The Spark-side machinery — schema, Arrow-batch
UDF signatures, ``mapInPandas`` partitioning — is real and tested.
Three codecs decode for REAL, pure-python: binary PPM (P6), RLE8-
compressed 8-bit BMP (run-length decompression + palette lookup), and
LZW-compressed GIF (variable-width codes, clear/EOI, KwKwK, interlace)
— each exercised end-to-end by a registry query whose oracle
recomputes the decoded pixel stats arithmetically. Formats whose
codecs need native libs not in this container (JPEG/PNG/...) remain
STUBBED
(``NotImplementedError``); ``fake_decode`` is the deterministic
stand-in tests use for those batch shapes.

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
    the Arrow path by the ``multimodal_decode`` registry query. Also
    REAL: RLE8 BMP, LZW GIF, and 8-bit-RGB PNG (stdlib zlib inflates
    IDAT). JPEG remains the one honest STUB: its entropy coding needs
    a native codec; swap in PIL.Image.open on a real cluster.
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
    if payload[:2] == b"BM":
        return _decode_bmp_rle8(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif_lzw(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    raise NotImplementedError(
        "media codecs unavailable in this environment (JPEG is the one "
        "remaining stub — its entropy coding needs a native lib); "
        "swap in PIL.Image.open(io.BytesIO(payload)) on a real cluster"
    )


def _bmp_palette_entry(i: int) -> bytes:
    """Palette entry for planted BMPs, stored file-order BGRX. The RGB
    channels are affine in the index so a SQL oracle can recompute the
    decoded channel sums arithmetically (plant_bmp's contract)."""
    return bytes(
        ((i * 7 + 31) % 256, (i * 5 + 17) % 256, (i * 3) % 256, 0)
    )


def encode_bmp_rle8(width: int, height: int, indexes: bytes) -> bytes:
    """Real RLE8-COMPRESSED 8-bit BMP writer: BITMAPFILEHEADER +
    BITMAPINFOHEADER (biCompression=1/BI_RLE8) + 256-entry BGRX
    palette + run-length-encoded pixel data (encoded-mode runs, end-of-
    line and end-of-bitmap escapes, rows stored bottom-up per the BMP
    spec). ``indexes`` is ``width*height`` top-down row-major palette
    indexes."""
    import struct

    if len(indexes) != width * height:
        raise ValueError(
            f"RLE8 {width}x{height} needs {width * height} index bytes, "
            f"got {len(indexes)}"
        )
    palette = b"".join(_bmp_palette_entry(i) for i in range(256))
    data = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up row order
        row = indexes[r * width : (r + 1) * width]
        c = 0
        while c < width:
            run = 1
            while c + run < width and row[c + run] == row[c] and run < 255:
                run += 1
            data += bytes((run, row[c]))
            c += run
        data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 1, len(data),
        2835, 2835, 256, 0,
    )
    off = 14 + 40 + 1024
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + info + palette + data


def _decode_bmp_rle8(payload: bytes) -> dict:
    """Real BMP decode for the 8-bit RLE8-compressed variant — one of
    the compressed raster formats feasible pure-python in this
    container (JPEG needs codec libs and stays stubbed). Handles encoded-mode
    runs, ABSOLUTE mode (with its word-boundary padding), end-of-line
    and end-of-bitmap escapes, bottom-up row order, and the palette
    lookup; rejects delta escapes and non-RLE8 BMPs loudly rather than
    guessing. Returns the same result shape as the P6 path so
    downstream feature extraction is format-agnostic."""
    import struct

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", payload, 10)[0]
    hsz, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hsz < 40 or planes != 1:
        raise ValueError(f"bad BMP info header (size {hsz}, planes {planes})")
    if bpp != 8 or comp != 1:
        raise NotImplementedError(
            f"only RLE8 BMPs decode pure-python here (got bpp={bpp}, "
            f"compression={comp}); swap in PIL on a real cluster"
        )
    if w <= 0 or h <= 0:
        # top-down RLE8 (negative height) is invalid per the spec
        raise ValueError(f"bad RLE8 dimensions {w}x{h}")
    n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
    pal_off = 14 + hsz
    rgb = [
        payload[pal_off + 4 * i + 2 : pal_off + 4 * i + 3]
        + payload[pal_off + 4 * i + 1 : pal_off + 4 * i + 2]
        + payload[pal_off + 4 * i : pal_off + 4 * i + 1]
        for i in range(n_colors)
    ]
    rows: list[bytes] = []
    cur = bytearray()
    i = off
    while True:
        if i + 2 > len(payload):
            raise ValueError("RLE8 stream ended without end-of-bitmap")
        b0, b1 = payload[i], payload[i + 1]
        i += 2
        if b0 > 0:  # encoded mode: b0 copies of index b1
            cur += bytes((b1,)) * b0
        elif b1 == 0:  # end of line
            rows.append(bytes(cur))
            cur = bytearray()
        elif b1 == 1:  # end of bitmap
            if cur:
                rows.append(bytes(cur))
            break
        elif b1 == 2:
            raise ValueError("RLE8 delta escapes unsupported")
        else:  # absolute mode: b1 literal indexes, word-aligned
            if i + b1 > len(payload):
                raise ValueError("truncated RLE8 absolute run")
            cur += payload[i : i + b1]
            i += b1 + (b1 & 1)
    if len(rows) != h or any(len(r) != w for r in rows):
        raise ValueError(
            f"RLE8 raster decoded to {[len(r) for r in rows]} "
            f"(expected {h} rows x {w})"
        )
    # rows arrive bottom-up; emit top-down row-major RGB
    pixels = b"".join(
        b"".join(rgb[ix] for ix in rows[y]) for y in range(h - 1, -1, -1)
    )
    return {
        "format": "bmp",
        "width": w,
        "height": h,
        "maxval": 255,
        "pixels": pixels,
    }


def _gif_palette_entry(i: int) -> bytes:
    """Palette entry for planted GIFs, stored file-order RGB (the GIF
    color table is plain RGB triples, unlike BMP's BGRX). Affine in the
    index so a SQL oracle recomputes decoded channel sums arithmetically
    (plant_gif's contract); constants differ from the BMP palette so a
    format-dispatch slip cannot accidentally hash-match."""
    return bytes(((i * 11 + 5) % 256, (i * 13 + 7) % 256, (i * 17 + 11) % 256))


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """Real GIF-variant LZW compression: greedy longest-match phrase
    dictionary, variable code width starting at ``min_code_size + 1``
    bits (grows when the next free code reaches the width's capacity,
    capped at 12 bits per the spec), clear/EOI control codes, and a
    dictionary reset via CLEAR when the table fills — LSB-first bit
    packing, as GIF readers expect."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # Width growth keys on a PER-CODE counter ("running"), not on table
    # adds: the decoder's phrase table inherently lags the encoder's by
    # one entry (it learns wk only from the NEXT code), so an add-based
    # rule desyncs the two sides by exactly one code at every width
    # boundary. Counting codes — giflib's RunningCode — is identical on
    # both sides by construction.
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    running = eoi + 1
    width = min_code_size + 1
    emit(clear, width)

    def emit_data(code: int) -> None:
        nonlocal running, width
        emit(code, width)
        running += 1
        if running > (1 << width) and width < 12:
            width += 1

    w = b""
    for k in data:
        wk = w + bytes((k,))
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:  # table full: clear and rebuild, like large real encoders
            emit(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            running = eoi + 1
            width = min_code_size + 1
        w = bytes((k,))
    if w:
        emit_data(table[w])
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW decompression: variable-width LSB-first codes,
    CLEAR resets, EOI termination, the KwKwK case (a code equal to the
    next unassigned entry = previous phrase + its own first byte), and
    width growth mirroring the encoder (bump when the next free code
    reaches the current width's capacity, cap 12 bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit cursor
    total_bits = 8 * len(data)

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("LZW stream ended without EOI")
        byte0 = pos >> 3
        chunk = int.from_bytes(
            data[byte0 : (pos + width + 7) // 8], "little"
        )
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    running = eoi + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes((i,)) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            running = eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:  # first code after a clear: literal by spec
            if code >= clear:
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} beyond table {len(table)}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        # per-code width rule, the mirror of the encoder's (see there)
        running += 1
        if running > (1 << width) and width < 12:
            width += 1
        prev = entry


def encode_gif_lzw(width: int, height: int, indexes: bytes) -> bytes:
    """Real GIF89a writer: header + logical screen descriptor + 256-
    entry global color table + image descriptor + LZW-COMPRESSED pixel
    stream in ≤255-byte sub-blocks + trailer. ``indexes`` is
    ``width*height`` top-down row-major palette indexes."""
    import struct

    if len(indexes) != width * height:
        raise ValueError(
            f"GIF {width}x{height} needs {width * height} index bytes, "
            f"got {len(indexes)}"
        )
    # packed: global color table, 8-bit color resolution, 256 entries
    screen = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    palette = b"".join(_gif_palette_entry(i) for i in range(256))
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    lzw = _lzw_compress(indexes, 8)
    blocks = bytearray(b"\x08")  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes((len(chunk),)) + chunk
    blocks += b"\x00"  # block terminator
    return (
        b"GIF89a" + screen + palette + img_desc + bytes(blocks) + b"\x3b"
    )


def _decode_gif_lzw(payload: bytes) -> dict:
    """Real GIF decode: logical screen descriptor, global/local color
    tables, extension-block skipping, sub-block reassembly, full LZW
    decompression (variable code widths, clear/EOI, KwKwK), and
    interlaced row reordering (the four-pass 8/8-8/4-4/2-2/1 scheme).
    Animated GIFs decode their FIRST frame (the still-image contract
    downstream feature extraction wants); malformed streams fail
    loudly rather than guessing. Same result shape as the P6/BMP paths
    so downstream feature extraction is format-agnostic."""
    import struct

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = [payload[i + 3 * k : i + 3 * k + 3] for k in range(n)]
        i += 3 * n
    while True:
        if i >= len(payload):
            raise ValueError("GIF ended without an image descriptor")
        b0 = payload[i]
        i += 1
        if b0 == 0x3B:
            raise ValueError("GIF trailer before any image descriptor")
        if b0 == 0x21:  # extension: label + sub-blocks, skip
            i += 1
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            if i >= len(payload):
                raise ValueError("truncated GIF extension block")
            i += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, i)
        i += 9
        pal = global_pal
        if ipacked & 0x80:  # local color table wins for this image
            n = 2 << (ipacked & 0x07)
            pal = [payload[i + 3 * k : i + 3 * k + 3] for k in range(n)]
            i += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        if i >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[i]
        i += 1
        lzw = bytearray()
        while i < len(payload) and payload[i] != 0:
            n = payload[i]
            if i + 1 + n > len(payload):
                raise ValueError("truncated GIF data sub-block")
            lzw += payload[i + 1 : i + 1 + n]
            i += 1 + n
        if i >= len(payload):
            raise ValueError("GIF data sub-blocks ended without terminator")
        idx = _lzw_decompress(bytes(lzw), min_code)
        if len(idx) != w * h:
            raise ValueError(
                f"GIF raster decoded to {len(idx)} indexes (expected {w * h})"
            )
        if ipacked & 0x40:  # interlaced: reorder the four passes
            order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for r in range(s, h, st)]
            rows = [b""] * h
            for stored, actual in enumerate(order):
                rows[actual] = idx[stored * w : (stored + 1) * w]
            idx = b"".join(rows)
        # keep the typed-failure contract: a decoded index past the
        # color table (legal streams can use 2/4/16-entry tables) must
        # be ValueError, not an uncontrolled IndexError at pal[k]
        if max(idx) >= len(pal):
            raise ValueError(
                f"GIF index {max(idx)} beyond color table of {len(pal)}"
            )
        pixels = b"".join(pal[k] for k in idx)
        return {
            "format": "gif",
            "width": w,
            "height": h,
            "maxval": 255,
            "pixels": pixels,
        }


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left
    to the linear estimate a + b - c, ties breaking left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Real PNG writer: signature + IHDR (8-bit truecolor RGB, no
    interlace) + one zlib-compressed IDAT + IEND, CRC32 on every chunk.
    Scanline filters CYCLE row % 5 through all five spec filter types
    (None/Sub/Up/Average/Paeth) so a decoder must reverse every one —
    the plant-with-real-encoder pattern of encode_gif_lzw, where the
    encoder and decoder verify each other against the arithmetic
    oracle. ``pixels`` is ``3*width*height`` top-down interleaved RGB."""
    import struct
    import zlib

    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"PNG {width}x{height} needs {3 * width * height} pixel bytes, "
            f"got {len(pixels)}"
        )
    bpp, stride = 3, 3 * width
    raw = bytearray()
    prior = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        ftype = r % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prior[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> dict:
    """Real PNG decode for the pure-python-feasible profile: chunk walk
    with CRC32 verification, IHDR parse, multi-IDAT reassembly, stdlib
    zlib inflate, and per-scanline reversal of all five filter types
    (None/Sub/Up/Average/Paeth). 8-bit truecolor RGB, non-interlaced —
    other color types / bit depths / Adam7 need profile work that adds
    nothing to the Spark surface and raise the honest
    NotImplementedError; malformed streams (bad CRC, truncated or
    oversized raster, missing IDAT) fail loudly with ValueError.
    Returns the same result shape as the P6/BMP/GIF paths."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    i = 8
    w = h = None
    idat = bytearray()
    seen_end = False
    while i < len(payload):
        if i + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", payload, i)
        tag = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) != length or i + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", payload, i + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        i += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype != 2:
                raise NotImplementedError(
                    f"only 8-bit truecolor PNG decodes pure-python here "
                    f"(got depth={depth}, color type={ctype}); swap in PIL "
                    f"on a real cluster"
                )
            if comp != 0 or filt != 0:
                raise ValueError(
                    f"bad PNG compression/filter method ({comp}/{filt})"
                )
            if ilace != 0:
                raise NotImplementedError(
                    "Adam7-interlaced PNG not supported pure-python here"
                )
            if w <= 0 or h <= 0:
                raise ValueError(f"bad PNG dimensions {w}x{h}")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, gAMA, ...) skip silently, as per spec
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if not seen_end:
        raise ValueError("PNG data ended without IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise ValueError(f"PNG IDAT inflate failed: {ex}") from None
    bpp, stride = 3, 3 * w
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG raster decoded to {len(raw)} bytes "
            f"(expected {h * (1 + stride)})"
        )
    out = bytearray()
    prior = bytes(stride)
    for r in range(h):
        ftype = raw[r * (1 + stride)]
        line = raw[r * (1 + stride) + 1 : (r + 1) * (1 + stride)]
        cur = bytearray(line)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for k in range(bpp, stride):
                cur[k] = (cur[k] + cur[k - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for k in range(stride):
                cur[k] = (cur[k] + prior[k]) & 0xFF
        elif ftype == 3:  # Average
            for k in range(stride):
                left = cur[k - bpp] if k >= bpp else 0
                cur[k] = (cur[k] + (left + prior[k]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for k in range(stride):
                left = cur[k - bpp] if k >= bpp else 0
                ul = prior[k - bpp] if k >= bpp else 0
                cur[k] = (cur[k] + _paeth(left, prior[k], ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {r}")
        out += cur
        prior = bytes(cur)
    return {
        "format": "png",
        "width": w,
        "height": h,
        "maxval": 255,
        "pixels": bytes(out),
    }


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for every format decode_image can
    parse (P6 / RLE8 BMP / GIF / PNG): decode, sample source pixel
    (r*h_in // h_out, c*w_in // w_out) for each target pixel — the
    exact integer mapping a SQL oracle can recompute — and re-encode
    as binary PPM (the interchange format of this pipeline's decode
    surface). Formats that cannot decode here (JPEG) still raise
    through decode_image's honest stub."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad resize target {width}x{height}")
    d = decode_image(payload)
    w_in, h_in, px = d["width"], d["height"], d["pixels"]
    out = bytearray()
    for r in range(height):
        sr = r * h_in // height
        row_off = 3 * sr * w_in
        for c in range(width):
            sc = c * w_in // width
            out += px[row_off + 3 * sc : row_off + 3 * sc + 3]
    return encode_ppm(width, height, bytes(out))


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


def plant_bmp(x: int) -> bytes:
    """Deterministic planted RLE8 BMP for hash seed ``x``: same dims
    contract as plant_ppm (width 4+x%13, height 4+(x//7)%9), palette
    index at (row r, col c) = (base + 7r + c//4) % 256 — the c//4 term
    plants RUNS of four so the RLE encoder emits real multi-count runs
    and the decoder's run expansion carries weight. Index and palette
    are both affine in their inputs, so a DuckDB oracle recomputes the
    decoded channel sums arithmetically (r = idx*3 % 256, g = idx*5+17
    % 256, b = idx*7+31 % 256 — _bmp_palette_entry's file-order BGRX
    reversed by the decoder)."""
    w = 4 + x % 13
    h = 4 + (x // 7) % 9
    base = x % 251
    idx = bytes(
        (base + 7 * r + c // 4) % 256 for r in range(h) for c in range(w)
    )
    return encode_bmp_rle8(w, h, idx)


def plant_gif(x: int) -> bytes:
    """Deterministic planted LZW GIF for hash seed ``x``: width
    8 + x%25 and height 8 + (x//7)%17 — deliberately LARGER than the
    P6/BMP plants so bigger images cross the 512-code boundary and the
    variable-width LZW path (9→10 bits) carries real weight. Palette
    index at (row r, col c) = (base + 11r + c//3) % 256 — runs of
    three give the LZW dictionary real multi-symbol phrases. Index and
    palette are both affine, so a DuckDB oracle recomputes the decoded
    channel sums arithmetically (r = (idx*11+5) % 256, g = (idx*13+7)
    % 256, b = (idx*17+11) % 256 — _gif_palette_entry, file-order
    RGB)."""
    w = 8 + x % 25
    h = 8 + (x // 7) % 17
    base = x % 251
    idx = bytes(
        (base + 11 * r + c // 3) % 256 for r in range(h) for c in range(w)
    )
    return encode_gif_lzw(w, h, idx)


def plant_png(x: int) -> bytes:
    """Deterministic planted PNG for hash seed ``x``: same dims as
    plant_gif (width 8 + x%25, height 8 + (x//7)%17 — height >= 8
    guarantees every filter type 0-4 appears at least once, since
    encode_png cycles row % 5). Pixel at (row r, col c) derives from
    idx = (base + 11r + c//3) % 256 with PNG-SPECIFIC affine channels
    (r = (idx*19+3) % 256, g = (idx*23+9) % 256, b = (idx*29+13) % 256
    — constants differ from the GIF/BMP palettes so a format-dispatch
    slip cannot accidentally hash-match), so a DuckDB oracle recomputes
    the decoded channel sums arithmetically."""
    w = 8 + x % 25
    h = 8 + (x // 7) % 17
    base = x % 251
    px = bytearray()
    for r in range(h):
        for c in range(w):
            k = (base + 11 * r + c // 3) % 256
            px += bytes(
                ((k * 19 + 3) % 256, (k * 23 + 9) % 256, (k * 29 + 13) % 256)
            )
    return encode_png(w, h, bytes(px))


def attach_ppm_payload(docs_with_seed: DataFrame, planter=None) -> DataFrame:
    """mapInPandas plant stage: (doc_id, x) → (doc_id, payload binary).
    A separate Python stage from the decoder on purpose: the payload
    crosses the Arrow boundary as a real binary column, so the decode
    stage downstream parses bytes it did not just build in-process.
    ``planter`` picks the format (default plant_ppm; plant_bmp for the
    RLE8 path)."""
    planter = planter or plant_ppm
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [planter(int(x)) for x in pdf["x"]],
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


def extract_resized_image_stats(media: DataFrame, divisor: int = 3) -> DataFrame:
    """Arrow-batched decode → REAL nearest-neighbor resize → re-decode:
    each payload is parsed, downscaled to (1 + w//divisor,
    1 + h//divisor) through resize_image (which re-encodes as P6), the
    RESIZED bytes parsed again, and the small raster reduced to the
    same channel stats as extract_image_stats — so the resample index
    arithmetic AND the P6 encoder round-trip both land in the oracle
    hash."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                src = decode_image(payload)
                w2 = 1 + src["width"] // divisor
                h2 = 1 + src["height"] // divisor
                d = decode_image(resize_image(payload, w2, h2))
                px = np.frombuffer(d["pixels"], dtype=np.uint8)
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                n_pix = w2 * h2
                rows.append(
                    (
                        int(doc_id), w2, h2, n_pix,
                        int(sums[0]), int(sums[1]), int(sums[2]),
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
