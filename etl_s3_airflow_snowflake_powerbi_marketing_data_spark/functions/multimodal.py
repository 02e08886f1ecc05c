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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def fake_duration_ms(payload: bytes) -> int:
    """STUB duration probe — deterministic fake milliseconds from the
    payload length (a real deployment uses ffprobe/container metadata)."""
    return (len(payload) % 120 + 1) * 1000


def sample_media_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Evenly-spaced frame sampling over video-like blobs, one output
    row per sampled frame (``mapInPandas`` row-expanding batch shape —
    the Arrow analogue of ``explode`` for UDF-computed rows).

    The frame *decode* is stubbed (frame content is a deterministic
    hash of payload + index); everything Spark-side — 1→N row fan-out,
    schema contract, batch sizing, shuffle-free plan — is production
    shape. A real decoder swaps the two marked lines for ffmpeg frame
    extraction.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "frame_index": [], "frame_ts_ms": [],
                "frame_hash": [],
            }
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(payload)
                duration = fake_duration_ms(blob)  # STUB: ffprobe here
                for i in range(n_frames):
                    out["media_id"].append(media_id)
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(i * duration // n_frames)
                    # STUB: ffmpeg -ss <ts> frame grab + hash here
                    frame = blob + f"#{i}".encode()
                    out["frame_hash"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


def embed_media(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic pseudo-embedding per blob (``array<float>``),
    ready to chain into the similarity operators
    (``operators.similarity``) — the multimodal → ANN pipeline shape.

    STUB embedding: dim hash-derived floats in [-1, 1), dimension j
    salted with the ASCII suffix ``#j`` (portable — any engine with
    md5 can reproduce the exact values for verification). A real model
    swaps the hash loop for an ONNX/torch batch forward pass; the
    Arrow batching, schema, and downstream compatibility stay as-is.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415
        import struct  # noqa: PLC0415

        for pdf in it:
            embs = []
            for payload in pdf["payload"]:
                blob = bytes(payload)
                vec = []
                for j in range(dim):
                    digest = hashlib.md5(blob + f"#{j}".encode()).digest()
                    (u,) = struct.unpack("<I", digest[:4])
                    vec.append((u / 2**32) * 2.0 - 1.0)
                embs.append(vec)
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return df.mapInPandas(batches, out_schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Audio-shaped feature extraction: duration, sample rate, RMS
    energy. Decode STUBBED (deterministic fakes from the raw bytes — a
    real build uses soundfile/torchaudio); the plan is a shuffle-free
    Arrow-batched scan like every other media op here.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": [fake_duration_ms(b) for b in blobs],
                    "sample_rate": [16000 for _ in blobs],
                    # STUB decode: byte-mean stands in for PCM RMS.
                    "rms": [
                        (sum(b) / len(b)) / 255.0 if b else 0.0 for b in blobs
                    ],
                }
            )

    return df.mapInPandas(batches, AUDIO_SCHEMA)
