"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches.

The decode step itself is STUBBED (this container ships no image/audio
codecs — see ``decode_image_stub``) but every Spark-side piece is real
and tested: the schema contract, the ``mapInPandas`` batch shape, the
partition sizing, and the metadata extraction. Swapping the stub for a
real decoder (PIL/torchaudio/ffmpeg) changes one function body and
nothing in the plan.

Scale notes: binary payloads ride the columnar Arrow path; batches are
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor
memory stays flat regardless of blob size skew. Feature extraction is
embarrassingly parallel — zero shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_source", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_hash", T.StringType(), False),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as opaque binary
    payloads, producing the MEDIA_SCHEMA contract. Stands in for a real
    binary source (``spark.read.format('binaryFile')`` at 100 TB)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("source").alias("meta_source"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decoder — deterministic fake dimensions derived from the
    payload length. A real deployment replaces this body with
    ``PIL.Image.open(io.BytesIO(payload)).size``; everything upstream
    and downstream of this call is production-shaped.
    """
    if payload is None:
        raise NotImplementedError("real decode requires an image codec")
    n = len(payload)
    return (n % 1024 + 1, (n // 7) % 1024 + 1)


def extract_media_features(df: DataFrame) -> DataFrame:
    """Per-blob feature extraction via ``mapInPandas`` (Arrow batches).

    Computes byte length, an md5 content hash, and stub-decoded
    dimensions. Batch-at-a-time pandas keeps per-row Python overhead
    amortized; the plan has no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode_image_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "payload_hash": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                    "decoded_width": [d[0] for d in dims],
                    "decoded_height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def media_feature_table(documents: DataFrame) -> DataFrame:
    """End-to-end multimodal pipeline on the documents table: adapt →
    batch feature-extract → stable ordering for comparison."""
    return extract_media_features(documents_as_media(documents)).orderBy("media_id")
