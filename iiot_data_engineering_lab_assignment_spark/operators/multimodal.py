"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for 100 TB multimodal training-data pipelines: media bytes
ride in a ``binary`` column next to typed metadata; decode / feature
extraction / resizing / frame sampling run as Arrow-batched pandas
functions over ``mapInPandas`` so each task processes a columnar batch of
blobs without JVM round-trips per row.

Codec status (round 3): every modality has one REAL pure-numpy codec,
each oracle-checked against closed-form SQL predictions of its decode
statistics —

* image: 24-bit BMP + binary PPM, with nearest-neighbor resize
  (``operators.imagecodec``);
* audio: PCM16 mono WAV with spec-correct RIFF chunk walking
  (``operators.audiocodec``);
* video: uncompressed C444 YUV4MPEG2 with real frame demuxing
  (``operators.videocodec``) — sampled frames re-encode as BMP and feed
  the image pipeline.

Formats that genuinely need external libraries (JPEG/PNG/MP3/MP4 — no
Pillow/ffmpeg in this runtime, pip has no network) still raise
``NotImplementedError``; ``fake=True`` keeps the deterministic
hash-derived stand-in for format-agnostic plumbing tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_from_documents",
    "media_images_from_documents",
    "media_audio_from_documents",
    "media_video_from_documents",
    "decode_media",
    "decode_audio",
    "demux_frames",
    "extract_features",
    "resize_media",
    "sample_frames",
]

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


def media_images_from_documents(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-image media table: each document becomes a small
    RGB gradient image, encoded as an actual BMP (id%3==0), binary PPM
    (id%3==1), or 8-bit truecolor PNG (id%3==2; DEFLATE via stdlib zlib,
    scanline filter id%5 so every unfilter path runs in the driver-
    checked decode) payload by the pure-numpy codecs.

    The pixel formula is closed-form in ``doc_id`` so a SQL oracle can
    predict every decode statistic without a codec of its own::

        w = 4 + id % 13          h = 4 + id % 7
        pixel(r, c, ch) = (id*31 + r + 85*ch) % 256      (column-invariant)

    The row gradient catches a missed BMP bottom-up flip, the channel
    offset catches a BGR/RGB swap, the odd widths exercise BMP's
    4-byte row padding, and PNG being lossless means its decoded stats
    share the same closed form — any codec bug shifts ``top_left`` /
    ``bottom_right`` / ``mean_pixel`` and fails the cross-engine gate.
    """
    out_schema = MEDIA_SCHEMA

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .imagecodec import encode_bmp, encode_ppm
        from .pngcodec import encode_png

        for pdf in batches:
            payloads, mimes = [], []
            for did in pdf["media_id"]:
                did = int(did)
                w, h = 4 + did % 13, 4 + did % 7
                r = np.arange(h, dtype=np.int64)[:, None, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :]
                img = ((did * 31 + r + 85 * ch) % 256).astype(np.uint8)
                img = np.broadcast_to(img, (h, w, 3))
                if did % 3 == 0:
                    payloads.append(encode_bmp(img))
                    mimes.append("image/bmp")
                elif did % 3 == 1:
                    payloads.append(encode_ppm(img))
                    mimes.append("image/x-portable-pixmap")
                else:
                    payloads.append(encode_png(img, filter_type=did % 5))
                    mimes.append("image/png")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": mimes,
                    "n_bytes": pd.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    return docs.select(F.col(id_col).alias("media_id")).mapInPandas(_gen, out_schema)


def media_audio_from_documents(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-audio media table: each document becomes a short
    PCM16 mono WAV clip encoded by the pure-numpy codec
    (``operators.audiocodec``).

    The waveform is closed-form in ``doc_id`` so a SQL oracle can predict
    every decode statistic with ``generate_series`` instead of a codec::

        n_samples   = 256 + id % 97
        sample_rate = 8000 + (id % 3) * 4000
        sample(i)   = (((id*31 + i*7) % 201) - 100) * 250     (int16)

    The sawtooth covers the full ±25000 range (201 and 7 are coprime, so
    i*7 mod 201 cycles every residue within 201 samples < n_samples),
    which makes peak/RMS sensitive to any byte-order or sample-width bug
    in the codec."""
    out_schema = MEDIA_SCHEMA

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .audiocodec import encode_wav

        for pdf in batches:
            payloads = []
            for did in pdf["media_id"]:
                did = int(did)
                n = 256 + did % 97
                rate = 8000 + (did % 3) * 4000
                i = np.arange(n, dtype=np.int64)
                v = ((((did * 31 + i * 7) % 201) - 100) * 250).astype(np.int16)
                payloads.append(encode_wav(v, rate))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": ["audio/wav"] * len(pdf),
                    "n_bytes": pd.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    return docs.select(F.col(id_col).alias("media_id")).mapInPandas(_gen, out_schema)


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode: parse each WAV payload inside the Arrow batch
    and emit per-clip statistics — (sample_rate, n_samples, duration_ms,
    peak, mean_amp, rms).  Non-WAV/compressed payloads raise
    ``NotImplementedError`` inside the task (the pipeline never silently
    fabricates samples).  Floats are emitted raw; callers round at the
    query level so Spark and the oracle round identically."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("mime", StringType(), True),
            StructField("sample_rate", IntegerType(), True),
            StructField("n_samples", IntegerType(), True),
            StructField("duration_ms", DoubleType(), True),
            StructField("peak", IntegerType(), True),
            StructField("mean_amp", DoubleType(), True),
            StructField("rms", DoubleType(), True),
        ]
    )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .audiocodec import decode_wav

        for pdf in batches:
            rates, counts, durs, peaks, means, rmss = [], [], [], [], [], []
            for b in pdf["payload"]:
                samples, rate = decode_wav(bytes(b))
                f = samples.astype(np.float64)
                rates.append(rate)
                counts.append(len(samples))
                durs.append(len(samples) * 1000.0 / rate)
                peaks.append(int(np.abs(samples.astype(np.int64)).max()))
                means.append(f.mean())
                rmss.append(float(np.sqrt((f * f).mean())))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_samples": pd.array(counts, dtype="int32"),
                    "duration_ms": pd.array(durs, dtype="float64"),
                    "peak": pd.array(peaks, dtype="int32"),
                    "mean_amp": pd.array(means, dtype="float64"),
                    "rms": pd.array(rmss, dtype="float64"),
                }
            )

    return media.mapInPandas(_decode_batch, out_schema)


def media_video_from_documents(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-video media table: each document becomes a short
    C444 Y4M clip encoded by the pure-numpy codec
    (``operators.videocodec``).

    Frame pixels are closed-form in ``doc_id`` so a SQL oracle can
    predict per-frame statistics with ``generate_series``::

        t_frames = 2 + id % 5       w = 4 + id % 9      h = 4 + id % 5
        pixel(t, r, c, ch) = (id*17 + t*29 + r + 85*ch) % 256

    (column-invariant, like the image fixture).  The frame index term
    catches a demuxer that mis-seeks frame boundaries; the row/channel
    terms catch plane-order bugs."""
    out_schema = MEDIA_SCHEMA

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .videocodec import encode_y4m

        for pdf in batches:
            payloads = []
            for did in pdf["media_id"]:
                did = int(did)
                t, w, h = 2 + did % 5, 4 + did % 9, 4 + did % 5
                tt = np.arange(t, dtype=np.int64)[:, None, None, None]
                r = np.arange(h, dtype=np.int64)[None, :, None, None]
                ch = np.arange(3, dtype=np.int64)[None, None, None, :]
                vid = ((did * 17 + tt * 29 + r + 85 * ch) % 256).astype(np.uint8)
                vid = np.ascontiguousarray(np.broadcast_to(vid, (t, h, w, 3)))
                payloads.append(encode_y4m(vid))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": ["video/x-yuv4mpeg"] * len(pdf),
                    "n_bytes": pd.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    return docs.select(F.col(id_col).alias("media_id")).mapInPandas(_gen, out_schema)


def demux_frames(media: DataFrame, every_n: int = 1, with_bmp: bool = True) -> DataFrame:
    """REAL frame sampling: demux each Y4M payload inside the Arrow batch
    and emit one row per kept frame (``every_n`` strides the frame index)
    with per-frame pixel statistics and — when ``with_bmp`` — the frame
    re-encoded as a BMP, so sampled frames feed straight back into the
    image pipeline (``decode_media`` / ``resize_media``).

    ``with_bmp=False`` skips the re-encode and the binary column
    entirely: Spark cannot prune columns produced inside ``mapInPandas``,
    so a stats-only caller would otherwise pay per-frame encode work plus
    Arrow transfer of bytes it drops one operator later.

    One-to-many ``mapInPandas``: a T-frame clip yields ceil(T/every_n)
    rows; frames stream out of the iterator without materializing the
    whole clip's frame set beyond the current batch.  Non-Y4M payloads
    raise ``NotImplementedError`` inside the task."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    fields = [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_pixel", DoubleType(), False),
        StructField("top_left", IntegerType(), False),
    ]
    if with_bmp:
        fields.append(StructField("frame_bmp", BinaryType(), False))
    out_schema = StructType(fields)

    def _demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .imagecodec import encode_bmp
        from .videocodec import decode_y4m

        for pdf in batches:
            ids, idxs, nfs, ws, hs, means, tls, bmps = [], [], [], [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                frames, _fps = decode_y4m(bytes(b))
                t, h, w, _ = frames.shape
                for k in range(0, t, every_n):
                    fr = frames[k]
                    ids.append(mid)
                    idxs.append(k)
                    nfs.append(t)
                    ws.append(w)
                    hs.append(h)
                    means.append(int(fr.sum(dtype=np.int64)) / fr.size)
                    tls.append(int(fr[0, 0, 0]))
                    if with_bmp:
                        bmps.append(encode_bmp(fr))
            out = {
                "media_id": ids,
                "frame_idx": pd.array(idxs, dtype="int32"),
                "n_frames": pd.array(nfs, dtype="int32"),
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "mean_pixel": pd.array(means, dtype="float64"),
                "top_left": pd.array(tls, dtype="int32"),
            }
            if with_bmp:
                out["frame_bmp"] = bmps
            yield pd.DataFrame(out)

    return media.mapInPandas(_demux, out_schema)


#: Extra columns emitted by the real decode path (NULL under ``fake=True``).
_PIXEL_STAT_FIELDS = [
    StructField("mean_pixel", DoubleType(), True),
    StructField("top_left", IntegerType(), True),
    StructField("bottom_right", IntegerType(), True),
]


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode the binary payload into (width, height, channels) metadata
    plus pixel statistics.

    With ``fake=False`` the REAL pure-numpy BMP/PPM codecs run inside the
    Arrow batches (``operators.imagecodec``); payloads in any other
    format raise ``NotImplementedError`` inside the task — the pipeline
    never silently fabricates pixels.  ``mean_pixel`` is emitted as the
    raw double (exact integer sum / count); callers round it at the
    query level so Spark and the oracle round the same value.

    With ``fake=True`` a deterministic pseudo-decode derives dimensions
    from the payload hash — same schema (pixel stats NULL), same batch
    shape, zero codec dependency — kept for format-agnostic plumbing
    tests and non-image payloads.
    """
    out_schema = StructType(list(MEDIA_SCHEMA.fields) + _DECODED_FIELDS + _PIXEL_STAT_FIELDS)

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import numpy as np

        from .imagecodec import decode_image

        for pdf in batches:
            if "n_bytes" not in pdf.columns:  # e.g. decoding resize_media output
                pdf = pdf.assign(
                    n_bytes=pd.array([len(bytes(b)) for b in pdf["payload"]], dtype="int64")
                )
            if fake:
                # crc32, not hash(): Python's hash is process-salted and
                # would break run-to-run determinism
                h = pdf["payload"].map(lambda b: zlib.crc32(bytes(b)) & 0x7FFFFFFF)
                yield pdf.assign(
                    width=(h % 1920 + 1).astype("int32"),
                    height=(h // 1920 % 1080 + 1).astype("int32"),
                    channels=(h % 3 + 1).astype("int32"),
                    mean_pixel=pd.array([None] * len(pdf), dtype="float64"),
                    top_left=pd.array([None] * len(pdf), dtype="Int32"),
                    bottom_right=pd.array([None] * len(pdf), dtype="Int32"),
                )
                continue
            widths, heights, chans, means, tls, brs = [], [], [], [], [], []
            for b in pdf["payload"]:
                img = decode_image(bytes(b))
                h_, w_, c_ = img.shape
                widths.append(w_)
                heights.append(h_)
                chans.append(c_)
                means.append(int(img.sum(dtype=np.int64)) / img.size)
                tls.append(int(img[0, 0, 0]))
                brs.append(int(img[-1, -1, -1]))
            yield pdf.assign(
                width=pd.array(widths, dtype="int32"),
                height=pd.array(heights, dtype="int32"),
                channels=pd.array(chans, dtype="int32"),
                mean_pixel=pd.array(means, dtype="float64"),
                top_left=pd.array(tls, dtype="Int32"),
                bottom_right=pd.array(brs, dtype="Int32"),
            )

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
    extraction).

    Real path (``fake=False``): decode the BMP/PPM payload, nearest-
    neighbor resample with the floor mapping (``imagecodec.nearest_resize``
    — SQL-reproducible, so the oracle can verify the resized pixels), and
    re-encode the result as BMP.  Composing ``decode_media`` after this
    round-trips encode -> decode twice, which is the strongest offline
    check the codecs can get.

    Fake path: deterministic byte-budget stride slicing — kept for
    format-agnostic plumbing tests (payload size scales with target
    area)."""
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
        from .imagecodec import decode_image, encode_bmp, nearest_resize

        for pdf in batches:
            if not fake:
                payloads = [
                    encode_bmp(nearest_resize(decode_image(bytes(b)), target_w, target_h))
                    for b in pdf["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": payloads,
                        "mime": ["image/bmp"] * len(pdf),
                        "width": pd.array([target_w] * len(pdf), dtype="int32"),
                        "height": pd.array([target_h] * len(pdf), dtype="int32"),
                    }
                )
                continue
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
