"""Tier-C multimodal column plumbing (SURVEY §2 C5).

Images/audio/video at 100 TB live as opaque ``binary`` columns with typed
metadata alongside; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through the driver.

Codec status: three containers are implemented from scratch per their
public format specs — 24-bit BMP (BITMAPINFOHEADER, bottom-up padded
rows), PCM WAV (RIFF/fmt/data chunks), and 8-bit RGB PNG (the real
compressed format pretraining corpora carry: CRC-checked chunk stream,
zlib-inflated IDAT via the stdlib, and ALL FIVE scanline filters
None/Sub/Up/Average/Paeth on both the encode and decode side) — encode
AND decode, so the decode paths in ``multimodal_image_decode`` /
``multimodal_png_decode`` / ``multimodal_audio_decode`` are REAL
byte-level codecs, not stand-ins.  Formats needing codecs the
container lacks (JPEG/H.264) still raise loudly.  Feature extraction
(``multimodal_features``) is a deterministic byte histogram where a real
deployment would call its CNN/codec — that boundary is the pattern being
exercised.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daskberg_spark.operators.registry import davg, query, table


# -- from-scratch uncompressed codecs (public format specs) ------------------


def encode_bmp(pixel_bytes: bytes, width: int = 16) -> bytes:
    """24-bit BMP encoder (BITMAPFILEHEADER + BITMAPINFOHEADER): pack
    ``pixel_bytes`` as BGR triples, ``width`` pixels per row, rows
    bottom-up and zero-padded — both to the 4-byte row boundary the spec
    requires and in the final partial row."""
    row_data = width * 3
    row_size = (row_data + 3) & ~3
    height = max(1, -(-len(pixel_bytes) // row_data))
    padded = pixel_bytes + b"\x00" * (height * row_data - len(pixel_bytes))
    rows = [
        padded[r * row_data : (r + 1) * row_data].ljust(row_size, b"\x00")
        for r in range(height)
    ]
    pixel_array = b"".join(reversed(rows))  # bottom-up storage
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_array),
        2835, 2835, 0, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_array), 0, 0, 14 + 40
    )
    return header + info + pixel_array


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """24-bit BMP decoder: returns (width, height, top-down pixel bytes
    without row padding).  Validates magic, header size, bpp, and
    compression; anything else is not a BMP this codec handles."""
    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP payload (magic {magic!r})")
    hsize, width, height, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hsize < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"unsupported BMP variant (header {hsize}, {bpp}bpp, comp {comp})"
        )
    row_data = width * 3
    row_size = (row_data + 3) & ~3
    rows = [
        payload[offset + r * row_size : offset + r * row_size + row_data]
        for r in range(abs(height))
    ]
    if height > 0:
        rows.reverse()  # bottom-up file → top-down pixels
    return width, abs(height), b"".join(rows)


def encode_wav(frames: bytes, sample_rate: int = 16000) -> bytes:
    """PCM16 mono WAV encoder (RIFF/fmt/data chunks); ``frames`` is raw
    little-endian s16 sample data (truncated to whole samples)."""
    frames = frames[: len(frames) - (len(frames) % 2)]
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data = struct.pack("<4sI", b"data", len(frames)) + frames
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
        + fmt
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """PCM WAV decoder: walks the RIFF chunk list, returns (sample_rate,
    n_samples, frame bytes).  Rejects non-RIFF payloads and non-PCM
    encodings loudly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, frames = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, len(frames) // ((bits // 8) * channels), frames


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PaethPredictor per the PNG spec (filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    pixel_bytes: bytes, width: int = 16, filter_type: int = 0
) -> bytes:
    """8-bit RGB PNG encoder from the public spec: IHDR/IDAT/IEND
    chunks with CRC32, scanlines forward-filtered with ``filter_type``
    (0..4 — None/Sub/Up/Average/Paeth; one type for the whole image so
    tests can exercise each decode path), IDAT deflated with the stdlib
    zlib.  Pixels are top-down RGB rows padded with zeros to a whole
    row."""
    import zlib

    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter type {filter_type} out of range")
    bpp = 3
    stride = width * bpp
    if len(pixel_bytes) % stride:
        pixel_bytes = pixel_bytes + b"\x00" * (
            stride - len(pixel_bytes) % stride
        )
    height = max(1, len(pixel_bytes) // stride)
    if len(pixel_bytes) < stride:
        pixel_bytes = pixel_bytes.ljust(stride, b"\x00")
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixel_bytes[r * stride : (r + 1) * stride]
        raw.append(filter_type)
        for i in range(stride):
            x = row[i]
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if filter_type == 0:
                f = x
            elif filter_type == 1:
                f = (x - a) & 0xFF
            elif filter_type == 2:
                f = (x - b) & 0xFF
            elif filter_type == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:
                f = (x - _paeth(a, b, c)) & 0xFF
            raw.append(f)
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(raw))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """8-bit RGB PNG decoder: CRC-checked chunk walk, multi-IDAT
    concatenation, zlib inflate, and per-scanline UNfiltering of all
    five spec filter types.  Returns (width, height, top-down RGB
    bytes).  Bit depths/color types/interlacing beyond 8-bit
    truecolor raise loudly (palette/alpha/Adam7 need no new
    machinery but are not what the fixtures exercise)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, ctype_n, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (depth, ctype_n, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"unsupported PNG shape (depth {depth}, color "
                    f"{ctype_n}, interlace {interlace}); this codec "
                    "reads 8-bit truecolor non-interlaced"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length does not match geometry")
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
        recon = bytearray(stride)
        for i in range(stride):
            f = line[i]
            a = recon[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                x = f
            elif ftype == 1:
                x = (f + a) & 0xFF
            elif ftype == 2:
                x = (f + b) & 0xFF
            elif ftype == 3:
                x = (f + (a + b) // 2) & 0xFF
            elif ftype == 4:
                x = (f + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"PNG filter type {ftype} out of range")
            recon[i] = x
        out += recon
        prev = bytes(recon)
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# GIF89a: the multi-FRAME container (public spec, from scratch) — the
# poor man's video: one LZW-compressed palette-indexed image per frame.
# Implemented both directions so the frame-iteration query decodes real
# compressed bytes: variable-width LZW (9→12 bits, LSB-first packing,
# clear/EOI codes, table reset at 4096), 255-byte sub-block framing,
# and a 256-entry grayscale global color table so palette index ==
# payload byte.  Encoder bumps the code width one assignment AFTER the
# decoder does — the classic synchronization (the decoder's table lags
# the encoder's by exactly one emission).

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_encode_gif(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
        )

    table, next_code = reset()
    emit(clear)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            code_size = min_code_size + 1
            table, next_code = reset()
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    pos = 0  # bit cursor
    code_size = min_code_size + 1
    table: list[bytes] = []
    next_code = 0
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, next_code, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        next_code = eoi + 1
        code_size = min_code_size + 1
        prev = None

    reset()
    total_bits = len(data) * 8
    while pos + code_size <= total_bits:
        byte_i = pos >> 3
        chunk = int.from_bytes(
            data[byte_i : byte_i + 4], "little"
        )
        code = (chunk >> (pos & 7)) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code out of range")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out)


def encode_gif(
    payload: bytes, width: int = 16, frame_bytes: int = 48
) -> bytes:
    """Pack ``payload`` into an animated GIF89a: grayscale 256-entry
    global color table (palette index == byte value), one frame per
    ``frame_bytes`` slice (the last frame zero-padded), every frame
    LZW-compressed per the spec.  ``frame_bytes`` must be a multiple of
    ``width`` so frames share one geometry."""
    if frame_bytes % width:
        raise ValueError("frame_bytes must be a multiple of width")
    height = frame_bytes // width
    n_frames = max(1, -(-len(payload) // frame_bytes))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    for f in range(n_frames):
        chunk = payload[f * frame_bytes : (f + 1) * frame_bytes]
        chunk = chunk + bytes(frame_bytes - len(chunk))
        # graphic control extension (frame delay 10cs)
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += b"\x00"  # no local color table
        out += bytes([8])  # LZW min code size
        comp = _lzw_encode_gif(chunk, 8)
        for i in range(0, len(comp), 255):
            blk = comp[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list[bytes]]:
    """GIF87a/89a decoder: header + logical screen, global color table
    skip (our palette is identity grayscale, so indices ARE the
    bytes), extension blocks skipped per spec framing, every image
    block LZW-decoded.  Returns (width, height, frames).  Local color
    tables and interlacing raise loudly (no new machinery, just not
    what the fixtures exercise)."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload (signature)")
    width, height = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames: list[bytes] = []
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        ipacked = payload[pos]
        pos += 1
        if ipacked & 0x80:
            raise NotImplementedError("GIF local color tables unsupported")
        if ipacked & 0x40:
            raise NotImplementedError("GIF interlacing unsupported")
        min_code = payload[pos]
        pos += 1
        comp = bytearray()
        while payload[pos]:
            n = payload[pos]
            comp += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        px = _lzw_decode_gif(bytes(comp), min_code)
        if len(px) < w * h:
            raise ValueError("GIF frame short of its geometry")
        frames.append(px[: w * h])
    return width, height, frames


def decode_image(payload: bytes):
    """Decode a binary image payload: from-scratch 24-bit BMP and 8-bit
    RGB PNG codecs dispatch on magic; formats needing external codecs
    this container lacks (JPEG etc.) raise loudly."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:6] in _GIF_SIGS:
        w, h, frames = decode_gif(payload)
        return w, h * len(frames), b"".join(frames)
    raise NotImplementedError(
        "payload is none of BMP/PNG/GIF; other codecs need external "
        "libraries this environment lacks"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal layout: binary payload + metadata struct."""
    payload = F.encode("text", "UTF-8")
    meta = F.struct(
        F.octet_length(payload).alias("n_bytes"),
        (F.octet_length(payload) % 640).alias("width"),
        (F.octet_length(payload) % 480).alias("height"),
        F.lit("utf8-text").alias("codec"),
    )
    return docs.select("doc_id", "source", payload.alias("payload"), meta.alias("meta"))


@query(
    "multimodal_metadata",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text)) % 640) AS INT) AS max_width
    FROM documents GROUP BY source
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: typed-metadata aggregation over binary assets — pure Catalyst
    on the struct column, payload bytes never deserialized."""
    assets = with_binary_payload(table(spark, sf_dir, "documents"))
    return assets.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("meta.n_bytes")).cast("long").alias("total_bytes"),
        F.max(F.col("meta.width")).cast("int").alias("max_width"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


@query(
    "multimodal_features",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(
             CAST(len(list_filter(regexp_extract_all(hex(encode(text)), '..'),
                      h -> substr(h, 1, 1) IN ('0', '1'))) AS DOUBLE)
             / greatest(octet_length(encode(text)), 1)
           AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_f0
    FROM documents GROUP BY source
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: feature extraction via mapInPandas — the decode/embed pattern.

    Each Arrow batch is processed with numpy (here: a deterministic 8-bin
    byte histogram standing in for a CNN/codec); at scale this is where
    the GPU/codec library call goes, partition-parallel with zero driver
    involvement.  The oracle recomputes feature bin 0 (fraction of bytes
    < 32, i.e. byte>>5 == 0) arithmetically from the payload's hex dump —
    non-overlapping '..' regex matches are exactly the byte pairs — so
    the driver verifies the numpy histogram path bit-exactly (both sides
    divide the same small ints in IEEE double, then aggregate via the
    decimal-exact convention)."""
    import numpy as np
    import pandas as pd

    assets = with_binary_payload(table(spark, sf_dir, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 5, minlength=8).astype("float64")
                feats.append((hist / max(len(arr), 1)).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    out = assets.mapInPandas(extract, _FEATURE_SCHEMA)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        davg(F.element_at("features", 1), "avg_f0"),
    )


@query(
    "multimodal_decode_stub",
    """
    SELECT 'utf8-text' AS codec, CAST(COUNT(*) AS BIGINT) AS n_assets
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: the decode-dispatch boundary — per-codec asset counts an
    actual decode job fans out over.  ``decode_image`` really decodes
    uncompressed BMP (see ``multimodal_image_decode``); compressed
    codecs raise NotImplementedError, which is the documented boundary
    in this container."""
    assets = with_binary_payload(table(spark, sf_dir, "documents"))
    return assets.groupBy(F.col("meta.codec").alias("codec")).agg(
        F.count(F.lit(1)).alias("n_assets")
    )


@query(
    "multimodal_image_decode",
    """
    SELECT doc_id, 16 AS width,
           GREATEST(1, CAST(ceil(octet_length(encode(text)) / 48.0) AS INT))
             AS height,
           CAST(54 + GREATEST(1, CAST(ceil(octet_length(encode(text)) / 48.0)
                AS INT)) * 48 AS BIGINT) AS bmp_bytes,
           TRUE AS payload_ok
    FROM documents
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: REAL image encode→decode round-trip per asset, executor-side.
    Each payload packs into a 24-bit BMP (width 16, bottom-up padded
    rows per the format spec) and decodes back through the from-scratch
    codec; ``payload_ok`` asserts the decoded pixel bytes equal the
    source bytes — a byte-level codec proof, not a stand-in.  The
    oracle reproduces the container geometry (height, file size)
    arithmetically from the payload length."""
    import pandas as pd

    assets = with_binary_payload(table(spark, sf_dir, "documents"))

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, ws, hs, sizes, oks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                bmp = encode_bmp(payload, width=16)
                w, h, px = decode_image(bmp)
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                sizes.append(len(bmp))
                oks.append(
                    px[: len(payload)] == payload
                    and set(px[len(payload) :]) <= {0}
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "bmp_bytes": sizes,
                    "payload_ok": oks,
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, width int, height int, bmp_bytes long, payload_ok boolean"
    )


@query(
    "multimodal_audio_decode",
    """
    SELECT doc_id, 16000 AS sample_rate,
           CAST(octet_length(encode(text)) // 2 AS BIGINT) AS n_samples,
           TRUE AS frames_ok
    FROM documents
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: REAL audio encode→decode round-trip — payload bytes become a
    PCM16 mono WAV (RIFF/fmt/data per spec) and decode back through the
    from-scratch chunk walker; ``frames_ok`` asserts frame-byte
    equality, the oracle reproduces the sample count arithmetically."""
    import pandas as pd

    assets = with_binary_payload(table(spark, sf_dir, "documents"))

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, rates, ns, oks = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                wav = encode_wav(payload, 16000)
                rate, n, frames = decode_wav(wav)
                ids.append(doc_id)
                rates.append(rate)
                ns.append(n)
                oks.append(frames == payload[: len(payload) - (len(payload) % 2)])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": rates,
                    "n_samples": ns,
                    "frames_ok": oks,
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, sample_rate int, n_samples long, frames_ok boolean"
    )


FRAME_BYTES = 256
FRAME_STRIDE = 4


@query(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id,
           CAST(idx * {FRAME_BYTES} AS BIGINT) AS frame_offset,
           CAST(least({FRAME_BYTES},
                      octet_length(encode(text)) - idx * {FRAME_BYTES}) AS BIGINT)
             AS frame_bytes
    FROM documents,
         LATERAL unnest(range(0,
             CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT),
             {FRAME_STRIDE})) AS t(idx)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: video frame sampling — the 1-row→N-rows mapInPandas shape.

    The payload is chopped into FRAME_BYTES "frames" and every
    FRAME_STRIDE-th frame is emitted as its own row (a real video job
    decodes keyframes here; the slicing, batch fan-out, and schema are
    identical).  The oracle reproduces the sampled offsets/lengths
    arithmetically from the payload size, so the driver verifies the
    Python slicing exactly."""
    import pandas as pd

    assets = with_binary_payload(table(spark, sf_dir, "documents"))

    def sample(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, offs, sizes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for start in range(
                    0, len(payload), FRAME_BYTES * FRAME_STRIDE
                ):
                    frame = payload[start : start + FRAME_BYTES]
                    ids.append(doc_id)
                    offs.append(start)
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_offset": offs, "frame_bytes": sizes}
            )

    return assets.select("doc_id", "payload").mapInPandas(
        sample, "doc_id long, frame_offset long, frame_bytes long"
    )


RESIZE_STRIDE = 4


@query(
    "multimodal_resize",
    f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
           CAST(ceil(octet_length(encode(text)) / {RESIZE_STRIDE}.0) AS BIGINT)
             AS resized_bytes
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: image resize plumbing — numpy stride-downsampling of the raw
    payload inside mapInPandas (a real job calls PIL/libvips here).  The
    resized byte counts are verified against the arithmetic oracle; the
    actual resampled bytes stay executor-side, as they would at 100 TB."""
    import numpy as np
    import pandas as pd

    assets = with_binary_payload(table(spark, sf_dir, "documents"))

    def resize(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            orig, resized = [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                out = arr[::RESIZE_STRIDE]  # nearest-neighbor downsample
                orig.append(len(arr))
                resized.append(len(out))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": orig,
                    "resized_bytes": resized,
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        resize, "doc_id long, orig_bytes long, resized_bytes long"
    )


@query(
    "multimodal_png_decode",
    """
    SELECT doc_id,
           16 AS width,
           CAST(GREATEST(1, CAST(ceil(octet_length(encode(text)) / 48.0)
                AS INT)) AS INT) AS height,
           CAST(doc_id % 5 AS INT) AS filter_type,
           TRUE AS payload_ok
    FROM documents
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: REAL compressed-image round-trip per asset, executor-side.
    Each payload packs into an 8-bit RGB PNG — zlib-deflated IDAT,
    CRC-checked chunks — with the scanline filter type rotating per
    document (doc_id % 5), so every decode exercises one of the five
    spec filters (None/Sub/Up/Average/Paeth) and the whole sweep covers
    all of them.  ``payload_ok`` asserts the unfiltered pixel bytes
    equal the source bytes; the oracle reproduces the geometry
    arithmetically (file size is compression-dependent and therefore
    NOT part of the contract)."""
    import pandas as pd

    assets = with_binary_payload(table(spark, sf_dir, "documents"))

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, ws, hs, fts, oks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                ft = int(doc_id) % 5
                png = encode_png(payload, width=16, filter_type=ft)
                w, h, px = decode_image(png)
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                fts.append(ft)
                oks.append(
                    px[: len(payload)] == payload
                    and set(px[len(payload) :]) <= {0}
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "filter_type": fts,
                    "payload_ok": oks,
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run,
        "doc_id long, width int, height int, filter_type int, "
        "payload_ok boolean",
    )


@query(
    "multimodal_gif_frames",
    """
    SELECT doc_id,
           16 AS width,
           3 AS height,
           CAST(GREATEST(1, CAST(ceil(octet_length(encode(text)) / 48.0)
                AS INT)) AS INT) AS n_frames,
           CAST(ceil(GREATEST(1, CAST(ceil(octet_length(encode(text)) / 48.0)
                AS INT)) / 2.0) AS INT) AS sampled_frames,
           TRUE AS frames_ok
    FROM documents
    """,
)
def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: FRAME-SAMPLED decode of a real multi-frame container — the
    video shape, executor-side.  Each payload packs into an animated
    GIF89a (from-scratch variable-width LZW per the public spec, one
    frame per 48-byte slice) and decodes back; ``sampled_frames``
    counts every 2nd frame (the classic video frame-sampling stride)
    and ``frames_ok`` asserts the reassembled frames equal the
    zero-padded source bytes.  The oracle reproduces the frame
    arithmetic from the byte length; compressed size is codec-dependent
    and not part of the contract.  Arrow-batched ``mapInPandas`` —
    frame bytes never touch the driver."""
    import pandas as pd

    assets = with_binary_payload(table(spark, sf_dir, "documents"))

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            w_l, h_l, nf, samp, ok = [], [], [], [], []
            for payload in pdf["payload"]:
                data = bytes(payload)
                gif = encode_gif(data, width=16, frame_bytes=48)
                w, h, frames = decode_gif(gif)
                joined = b"".join(frames)
                pad = max(1, -(-len(data) // 48)) * 48
                w_l.append(w)
                h_l.append(h)
                nf.append(len(frames))
                samp.append(len(frames[::2]))
                ok.append(
                    len(joined) == pad
                    and joined[: len(data)] == data
                    and set(joined[len(data):]) <= {0}
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w_l,
                    "height": h_l,
                    "n_frames": nf,
                    "sampled_frames": samp,
                    "frames_ok": ok,
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run,
        "doc_id long, width int, height int, n_frames int, "
        "sampled_frames int, frames_ok boolean",
    )


# -- NPY tensor columns -------------------------------------------------------

NPY_MAGIC = b"\x93NUMPY"
_NPY_DTYPES = {"<f4": 4, "<f8": 8, "<i4": 4, "<i8": 8}


def encode_npy(values, dtype: str = "<f4", shape: tuple | None = None) -> bytes:
    """Serialize a flat value list as an NPY v1.0 buffer (numpy format
    spec: magic, u16 header length, ASCII dict header space-padded so
    the data section starts 64-byte aligned, then raw little-endian
    C-order values).  From-scratch writer — the spec is public and the
    header is deliberately minimal."""
    if dtype not in _NPY_DTYPES:
        raise NotImplementedError(f"unsupported npy dtype {dtype!r}")
    shape = shape or (len(values),)
    n = 1
    for s in shape:
        n *= s
    if n != len(values):
        raise ValueError(f"shape {shape} does not hold {len(values)} values")
    header = (
        "{'descr': '%s', 'fortran_order': False, 'shape': (%s), }"
        % (dtype, "".join(f"{s}, " for s in shape))
    ).encode("latin-1")
    # pad header+newline so magic(6)+ver(2)+hlen(2)+header is 64-aligned
    pad = (-(len(NPY_MAGIC) + 4 + len(header) + 1)) % 64
    header = header + b" " * pad + b"\n"
    fmt = {"<f4": "<f", "<f8": "<d", "<i4": "<i", "<i8": "<q"}[dtype]
    body = b"".join(struct.pack(fmt, v) for v in values)
    return NPY_MAGIC + b"\x01\x00" + struct.pack("<H", len(header)) + header + body


def decode_npy(buf: bytes):
    """Parse an NPY v1.0 buffer → (dtype, shape, values list).  Loud
    refusals for other versions, fortran order, and dtypes outside the
    four fixed-width little-endian kinds this engine writes."""
    import ast

    if buf[:6] != NPY_MAGIC:
        raise ValueError("not an NPY buffer (bad magic)")
    if buf[6:8] != b"\x01\x00":
        raise NotImplementedError(f"npy version {buf[6]}.{buf[7]} unsupported")
    (hlen,) = struct.unpack("<H", buf[8:10])
    header = ast.literal_eval(buf[10 : 10 + hlen].decode("latin-1"))
    dtype = header["descr"]
    if dtype not in _NPY_DTYPES:
        raise NotImplementedError(f"unsupported npy dtype {dtype!r}")
    if header.get("fortran_order"):
        raise NotImplementedError("fortran-order npy unsupported")
    shape = tuple(header["shape"])
    n = 1
    for s in shape:
        n *= s
    width = _NPY_DTYPES[dtype]
    data = buf[10 + hlen :]
    if len(data) != n * width:
        raise ValueError(
            f"npy body holds {len(data)} bytes; shape {shape} needs {n * width}"
        )
    fmt = {"<f4": "<f", "<f8": "<d", "<i4": "<i", "<i8": "<q"}[dtype]
    values = [
        struct.unpack_from(fmt, data, i * width)[0] for i in range(n)
    ]
    return dtype, shape, values


@query(
    "multimodal_npy_decode",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dims,
           CAST(128 + 4 * len(embedding) AS BIGINT) AS npy_bytes,
           TRUE AS roundtrip_ok
    FROM embeddings
    """,
)
def multimodal_npy_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: TENSOR columns — each embedding serializes to an NPY v1.0
    buffer (the numpy format spec: the lingua franca for shipping
    arrays into training jobs) and decodes back through the
    from-scratch parser, all executor-side via ``mapInPandas``;
    ``roundtrip_ok`` asserts bit-exact float32 value equality and the
    oracle reproduces the 64-aligned buffer size arithmetically.
    Bytes never reach the driver; unsupported dtypes/orders refuse
    loudly like every other codec here."""
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids, dims, sizes, oks = [], [], [], []
            for vec_id, vec in zip(pdf["vec_id"], pdf["embedding"]):
                vals = [float(v) for v in vec]
                buf = encode_npy(vals, "<f4")
                dtype, shape, back = decode_npy(buf)
                ids.append(vec_id)
                dims.append(shape[0])
                sizes.append(len(buf))
                # float32 roundtrip: re-quantize the inputs through <f4
                # so equality is bit-exact, not approximate
                quant = [
                    struct.unpack("<f", struct.pack("<f", v))[0]
                    for v in vals
                ]
                oks.append(
                    dtype == "<f4" and shape == (len(vals),) and back == quant
                )
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "dims": dims,
                    "npy_bytes": sizes,
                    "roundtrip_ok": oks,
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, dims int, npy_bytes long, roundtrip_ok boolean"
    )
