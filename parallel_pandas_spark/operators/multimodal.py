"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): the
"decoder" derives deterministic pseudo-metadata/features from the raw
bytes, and ``decode_image_real`` raises ``NotImplementedError`` where a
real pipeline would call Pillow/libav. Everything Spark-side — schemas,
batch iteration, partition sizing, UDF signatures — is real and tested, so
swapping in a real decoder is a one-function change.

Scale notes: binary payloads dominate partition size; repartition by
``maxRecordsPerBatch`` so an Arrow batch of blobs stays ~tens of MB, and
carry only metadata forward (drop the blob column as early as possible).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image_real(data: bytes):
    """Real decode hook — requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv; install and replace "
        "_fake_decode with a real decoder — the Spark plumbing is unchanged"
    )


def _fake_decode(data: bytes) -> tuple[str, int, int, list[float]]:
    """Deterministic stand-in: format/size/feature derived from the bytes.
    (fmt from first byte, dims from length, 4-dim 'feature' = byte-range
    means). Replace with a real decoder in production."""
    n = len(data)
    fmt = ["png", "jpeg", "webp", "gif"][data[0] % 4] if n else "empty"
    width = 64 + (n % 512)
    height = 64 + ((n * 7) % 512)
    if n:
        quarters = [data[i * n // 4 : (i + 1) * n // 4] for i in range(4)]
        feature = [float(sum(qq)) / max(len(qq), 1) for qq in quarters]
    else:
        feature = [0.0, 0.0, 0.0, 0.0]
    return fmt, width, height, feature


def decode_images(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """binary blobs → typed metadata + feature vector via ``mapInPandas``.

    Iterator-of-batches signature: constant memory per task no matter the
    partition size — the right shape for 100 TB of blobs."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob) if blob is not None else b""
                fmt, w, h, feat = _fake_decode(data)
                rows.append((int(doc_id), len(data), fmt, w, h, feat))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "format", "width", "height", "feature"]
            )

    return df.select(id_col, blob_col).mapInPandas(_decode, schema=IMAGE_META_SCHEMA)


def resize_images(df: DataFrame, id_col: str, blob_col: str, size: tuple[int, int]) -> DataFrame:
    """Resize stub: real implementation decodes, resizes, re-encodes inside
    the same mapInPandas loop. Raises at execution time (plumbing is real,
    the pixel work needs a lib)."""

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("resized", T.BinaryType())]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            decode_image_real(b"")  # NotImplementedError by design
            yield pd.DataFrame(columns=["doc_id", "resized"])

    return df.select(id_col, blob_col).mapInPandas(_resize, schema=out_schema)


def sample_video_frames(
    df: DataFrame, id_col: str, blob_col: str, every_n_bytes: int = 1024
) -> DataFrame:
    """'Frame sampling' over a video blob — deterministic fake: one sampled
    'frame digest' per ``every_n_bytes`` window of the payload. Shows the
    one-row-in/many-rows-out (flatMap) shape of real frame extraction."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_digest", T.LongType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob) if blob is not None else b""
                for i in range(0, max(len(data), 1), every_n_bytes):
                    chunk = data[i : i + every_n_bytes]
                    rows.append((int(doc_id), i // every_n_bytes, sum(chunk)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_digest"])

    return df.select(id_col, blob_col).mapInPandas(_sample, schema=out_schema)


def text_as_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Adapter used by tests/queries: utf-8 bytes of a text column as the
    opaque binary payload (the container has no real media files)."""
    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.encode(F.col(text_col), "utf-8").alias("blob")
    )
