"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for 100 TB multimodal training-data pipelines: media bytes
ride in a ``binary`` column next to typed metadata; decode / feature
extraction / resizing / frame sampling run as Arrow-batched pandas
functions over ``mapInPandas`` so each task processes a columnar batch of
blobs without JVM round-trips per row.

The actual codec step is STUBBED here (this runtime has no image/audio
libraries): ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic hash-derived decode stands
in.  Everything AROUND the codec — schema contract, batch iteration,
partition sizing, output shape — is real and tested; swapping in
Pillow/ffmpeg is a one-function change inside the pandas iterator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["MEDIA_SCHEMA", "media_from_documents", "decode_media", "extract_features", "resize_media", "sample_frames"]

#: The multimodal table contract: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

_DECODED_FIELDS = [
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
]


def media_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media table: document text encoded as the
    binary payload (a stand-in for real image bytes; byte-exact across
    runs).  Used by tests and the registry query so the multimodal
    plumbing is exercised without codec libraries."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode the binary payload into (width, height, channels) metadata.

    Real deployments replace the body of ``_decode_batch`` with an actual
    codec (PIL.Image.open / soundfile / pyav).  With ``fake=True`` a
    deterministic pseudo-decode derives dimensions from the payload hash —
    same schema, same batch shape, zero codec dependency.
    """
    out_schema = StructType(list(MEDIA_SCHEMA.fields) + _DECODED_FIELDS)

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this runtime; pass fake=True "
                    "or swap in a real decoder (PIL/ffmpeg) here"
                )
            # crc32, not hash(): Python's hash is process-salted and would
            # break run-to-run determinism
            h = pdf["payload"].map(lambda b: zlib.crc32(bytes(b)) & 0x7FFFFFFF)
            pdf = pdf.assign(
                width=(h % 1920 + 1).astype("int32"),
                height=(h // 1920 % 1080 + 1).astype("int32"),
                channels=(h % 3 + 1).astype("int32"),
            )
            yield pdf

    return media.mapInPandas(_decode_batch, out_schema)


def extract_features(media: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Per-item feature vector (the embedding-extraction step).  Stubbed
    deterministically: byte-histogram features normalized to unit norm —
    a real pipeline swaps in a vision/audio model over the same Arrow
    batch interface (predict_batch_udf shape)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def _feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError("feature model unavailable; pass fake=True")
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(_feat_batch, out_schema)


def resize_media(
    media: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = False
) -> DataFrame:
    """Resize step (the preprocessing normalizer before feature
    extraction).  Real version: PIL/cv2 resize inside the same Arrow batch
    iterator.  Fake version is deterministic: payload is re-sampled to a
    byte budget proportional to target area (stride slicing), and the
    metadata records the new dimensions — preserving the contract that
    output payload size scales with target resolution."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("mime", StringType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )
    budget = max(16, (target_w * target_h) // 1024)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize unavailable; pass fake=True")
            payloads = []
            for b in pdf["payload"]:
                raw = bytes(b)
                stride = max(1, len(raw) // budget)
                payloads.append(raw[::stride][:budget])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": pdf["mime"],
                    "width": pd.array([target_w] * len(pdf), dtype="int32"),
                    "height": pd.array([target_h] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(_resize, out_schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8, fake: bool = False) -> DataFrame:
    """Frame sampling (video -> frames) as a one-to-many mapInPandas:
    each payload yields up to ``max_frames`` byte-slice 'frames'.  The
    real version seeks keyframes with pyav over the identical contract
    (one input row -> N output rows, frame_idx + frame payload)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video demuxer unavailable; pass fake=True")
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames})

    return media.mapInPandas(_frames, out_schema)
