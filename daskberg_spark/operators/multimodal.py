"""Tier-C multimodal column plumbing (SURVEY §2 C5).

Images/audio/video at 100 TB live as opaque ``binary`` columns with typed
metadata alongside; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through the driver.  The actual
codec step is STUBBED (no image/audio libraries in this container): the
"payload" is the document text UTF-8-encoded, ``decode_image`` raises
NotImplementedError, and ``_fake_features`` is a deterministic stand-in —
but the Spark-side plumbing (schema with BinaryType, metadata struct,
batch iterator, partition-parallel extraction) is the real pattern.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daskberg_spark.operators.registry import davg, query, table


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real deployments: PIL/libvips decode of the binary payload.
    Not available in this container — the plumbing around it is what
    this module exercises."""
    raise NotImplementedError("image codecs not available in this environment")


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
    """C5: the decode boundary itself — returns the per-codec asset
    counts an actual decode job would fan out over; calling
    ``decode_image`` raises NotImplementedError by design."""
    assets = with_binary_payload(table(spark, sf_dir, "documents"))
    return assets.groupBy(F.col("meta.codec").alias("codec")).agg(
        F.count(F.lit(1)).alias("n_assets")
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
