"""Multimodal plumbing (stubbed codecs, real Spark mechanics) and the
as-of join operator."""

import pytest
from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.joins import asof_join
from iiot_data_engineering_lab_assignment_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_from_documents,
    sample_frames,
)


def test_media_table_schema(spark, documents):
    media = media_from_documents(documents)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "mime", "n_bytes"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    # payload length equals the metadata byte count
    bad = media.filter(F.length("payload") != F.col("n_bytes")).count()
    assert bad == 0


def test_decode_requires_real_codec(spark, documents):
    """The stub is explicit: without fake=True the decode raises
    NotImplementedError inside the task (surfacing as a Spark job failure),
    it never silently fabricates data."""
    media = media_from_documents(documents.limit(5))
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        decode_media(media, fake=False).collect()


def test_decode_fake_deterministic(spark, documents):
    media = media_from_documents(documents)
    a = {tuple(r) for r in decode_media(media, fake=True).collect()}
    b = {tuple(r) for r in decode_media(media, fake=True).collect()}
    assert a == b
    one = decode_media(media, fake=True).head()
    assert 1 <= one["width"] <= 1920 and 1 <= one["height"] <= 1080


def test_features_unit_norm(spark, documents):
    feats = extract_features(media_from_documents(documents), dim=16, fake=True)
    row = feats.head()
    assert len(row["features"]) == 16
    norm = sum(x * x for x in row["features"]) ** 0.5
    assert abs(norm - 1.0) < 1e-5


def test_frame_sampling_shape(spark, documents):
    media = media_from_documents(documents.limit(20))
    frames = sample_frames(media, every_n_bytes=64, max_frames=4, fake=True)
    rows = frames.collect()
    assert all(0 <= r["frame_idx"] < 4 for r in rows)
    per_doc = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)


def test_asof_join_semantics(spark):
    """The attached right row is the latest with ts <= left.ts per key;
    left rows before any right row get NULL."""
    from datetime import datetime

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(5), "a"), (2, t(10), "a"), (3, t(2), "b"), (4, t(20), "b")],
        "id long, ts timestamp, k string",
    )
    right = spark.createDataFrame(
        [(t(4), "a", 40.0), (t(10), "a", 100.0), (t(3), "b", 30.0)],
        "ts timestamp, k string, v double",
    )
    out = {r["id"]: r["v_right"] for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()}
    assert out[1] == 40.0  # latest right at ts<=5 is ts=4
    assert out[2] == 100.0  # inclusive bound: right at exactly ts=10 wins
    assert out[3] is None  # no right row at ts<=2 for key b
    assert out[4] == 30.0  # carries forward across a gap


def test_asof_join_matches_events_oracle_property(spark, events):
    """Every attached click_ts precedes (or equals) the purchase ts."""
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(purchases, clicks, ["user_id"], "ts", ["ts"], suffix="_c")
    bad = out.filter(F.col("ts_c") > F.col("ts")).count()
    assert bad == 0
    assert out.count() == purchases.count()  # left-preserving


def test_approx_distinct_accuracy(spark, events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.1 * n), k


def test_resize_media_contract(spark, documents):
    from iiot_data_engineering_lab_assignment_spark.operators.multimodal import resize_media

    media = media_from_documents(documents.limit(50))
    small = resize_media(media, 64, 64, fake=True)
    big = resize_media(media, 512, 512, fake=True)
    s_rows = {r["media_id"]: r for r in small.collect()}
    b_rows = {r["media_id"]: r for r in big.collect()}
    assert all(r["width"] == 64 and r["height"] == 64 for r in s_rows.values())
    # payload byte budget scales with target area
    assert all(len(b_rows[k]["payload"]) >= len(s_rows[k]["payload"]) for k in s_rows)
    # deterministic
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_media(media, 64, 64, fake=True).collect()}
    assert all(bytes(s_rows[k]["payload"]) == again[k] for k in s_rows)


def test_rate_stream_live_mode(spark):
    """S4 live mode: the rate-source stream emits 16 readings per tick with
    the wire schema (ingest_data.py:126-146 analogue)."""
    import tempfile
    import time
    import uuid

    from iiot_data_engineering_lab_assignment_spark.sources.generator import generate_rate_stream

    stream = generate_rate_stream(spark, interval_seconds=5)
    name = f"live_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="live_ckpt_"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() == 0:
            time.sleep(1)
        rows = spark.table(name).collect()
    finally:
        q.stop()
    assert len(rows) > 0
    assert len(rows) % 16 == 0  # 4 machines x 4 sensors per tick
    assert {r["machine_id"] for r in rows} <= {"CNC-001", "LATHE-002", "PRESS-003", "WELD-004"}
    assert set(rows[0].asDict()) == {"event_time", "machine_id", "sensor_type", "value"}
    # event_time is bucketed to the interval grid, not epoch-divided: a /5
    # division bug would land every timestamp in ~1981
    for r in rows:
        assert r["event_time"].year >= 2020
        assert int(r["event_time"].timestamp()) % 5 == 0


def test_imagecodec_roundtrip_property():
    """encode->decode is the identity for both BMP (incl. odd widths that
    exercise 4-byte row padding) and PPM, on random pixel content."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.imagecodec import (
        decode_bmp,
        decode_image,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (4, 4), (7, 13), (10, 16), (6, 17)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img), (h, w)
        assert np.array_equal(decode_image(encode_bmp(img)), img)
        assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_imagecodec_bmp_layout_is_spec_conformant():
    """Byte-level spec checks (not just self-consistency): bottom-up row
    order, BGR channel order, rows padded to 4 bytes, pixel offset 54."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.imagecodec import encode_bmp

    img = np.zeros((2, 1, 3), dtype=np.uint8)
    img[0, 0] = [10, 20, 30]  # top row RGB
    img[1, 0] = [40, 50, 60]  # bottom row
    data = encode_bmp(img)
    assert data[:2] == b"BM" and data[10] == 54
    stride = 4  # 1 px * 3 bytes padded to 4
    first_stored = data[54 : 54 + 3]
    assert list(first_stored) == [60, 50, 40]  # bottom row first, BGR
    assert list(data[54 + stride : 54 + stride + 3]) == [30, 20, 10]


def test_imagecodec_rejects_unknown_formats():
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.imagecodec import decode_image

    with _pytest.raises(NotImplementedError, match="codecs unavailable"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    # truncated BMP header
    from iiot_data_engineering_lab_assignment_spark.operators.imagecodec import decode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"BMshort")


def test_real_decode_matches_formula(spark, documents):
    """The Spark-side decode of real BMP/PPM payloads reproduces the
    closed-form pixel statistics the oracle predicts."""
    from iiot_data_engineering_lab_assignment_spark.operators.multimodal import (
        decode_media,
        media_images_from_documents,
    )

    out = decode_media(media_images_from_documents(documents.limit(40)), fake=False).collect()
    assert len(out) == 40
    for r in out:
        did = r["media_id"]
        assert r["width"] == 4 + did % 13
        assert r["height"] == 4 + did % 7
        assert r["channels"] == 3
        assert r["top_left"] == (did * 31) % 256
        assert r["bottom_right"] == (did * 31 + r["height"] - 1 + 170) % 256
        expected_mean = sum(
            (did * 31 + rr + 85 * ch) % 256 for rr in range(r["height"]) for ch in range(3)
        ) / (r["height"] * 3)
        assert abs(r["mean_pixel"] - expected_mean) < 1e-9, did


def test_real_resize_roundtrip_pixels(spark, documents):
    """resize(fake=False) re-encodes actual resampled pixels: decoding the
    output equals nearest_resize applied to the decoded input."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.imagecodec import (
        decode_image,
        nearest_resize,
    )
    from iiot_data_engineering_lab_assignment_spark.operators.multimodal import (
        media_images_from_documents,
        resize_media,
    )

    media = media_images_from_documents(documents.limit(20))
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = resize_media(media, 8, 8, fake=False).collect()
    assert len(out) == 20
    for r in out:
        got = decode_image(bytes(r["payload"]))
        want = nearest_resize(decode_image(src[r["media_id"]]), 8, 8)
        assert np.array_equal(got, want), r["media_id"]


def test_audiocodec_roundtrip_property():
    """encode_wav -> decode_wav is the identity on samples and rate, for
    varied lengths/rates including odd byte counts (RIFF word alignment)."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.audiocodec import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    for n, rate in [(1, 8000), (255, 16000), (256, 44100), (1001, 22050)]:
        s = rng.randint(-32768, 32768, size=n).astype(np.int16)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate
        assert np.array_equal(out, s)


def test_audiocodec_walks_extra_chunks_and_rejects_garbage():
    """Spec-correct chunk walking (a LIST chunk before data is skipped by
    its declared size); non-WAV, compressed, stereo, and truncated
    payloads raise instead of returning garbage."""
    import struct

    import numpy as np
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.audiocodec import (
        decode_wav,
        encode_wav,
    )

    s = np.arange(-5, 5, dtype=np.int16)
    wav = encode_wav(s, 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    listed = wav[:fmt_end] + b"LIST" + struct.pack("<I", 4) + b"INFO" + wav[fmt_end:]
    out, r = decode_wav(listed)
    assert r == 8000 and np.array_equal(out, s)

    with _pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03" + bytes(40))  # mp3-ish
    stereo = bytearray(wav)
    struct.pack_into("<H", stereo, 12 + 8 + 2, 2)  # channels=2
    with _pytest.raises(NotImplementedError):
        decode_wav(bytes(stereo))
    compressed = bytearray(wav)
    struct.pack_into("<H", compressed, 12 + 8, 85)  # format tag = MP3
    with _pytest.raises(NotImplementedError):
        decode_wav(bytes(compressed))

    # odd data chunk size: codec-level message, not numpy's generic
    # buffer-size ValueError (round-3 advice)
    data_hdr = 12 + 8 + 16  # start of the 'data' chunk header
    odd = bytearray(wav)
    struct.pack_into("<I", odd, data_hdr + 4, len(s) * 2 - 1)
    with _pytest.raises(ValueError, match="odd data chunk"):
        decode_wav(bytes(odd))

    # two data chunks: last-wins would silently drop audio — reject
    body = wav[data_hdr:]
    doubled = wav + body  # append a second identical data chunk
    doubled = b"RIFF" + struct.pack("<I", len(doubled) - 8) + doubled[8:]
    with _pytest.raises(ValueError, match="multiple data chunks"):
        decode_wav(doubled)


def test_real_audio_decode_matches_formula(spark, documents):
    """decode_audio over real WAV payloads reproduces the closed-form
    waveform statistics (the pure-python ground truth, no Spark)."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.multimodal import (
        decode_audio,
        media_audio_from_documents,
    )

    sample = (
        decode_audio(media_audio_from_documents(documents.limit(20)))
        .collect()
    )
    assert len(sample) == 20
    for r in sample:
        did = r["media_id"]
        n = 256 + did % 97
        rate = 8000 + (did % 3) * 4000
        i = np.arange(n, dtype=np.int64)
        v = (((did * 31 + i * 7) % 201) - 100) * 250
        assert r["n_samples"] == n
        assert r["sample_rate"] == rate
        assert r["peak"] == int(np.abs(v).max()) == 25000
        assert abs(r["mean_amp"] - v.mean()) < 1e-9
        assert abs(r["rms"] - np.sqrt((v.astype(np.float64) ** 2).mean())) < 1e-6


def test_videocodec_roundtrip_property():
    """encode_y4m -> decode_y4m is the identity on frames and fps for
    varied clip shapes (including 1-frame and odd dimensions)."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.videocodec import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.RandomState(13)
    for t, h, w in [(1, 1, 1), (3, 5, 7), (4, 8, 6)]:
        clip = rng.randint(0, 256, size=(t, h, w, 3)).astype(np.uint8)
        out, fps = decode_y4m(encode_y4m(clip, fps=(30, 1)))
        assert fps == (30, 1)
        assert np.array_equal(out, clip)


def test_videocodec_rejects_unsupported_streams():
    import numpy as np
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.videocodec import (
        decode_y4m,
        encode_y4m,
    )

    with _pytest.raises(NotImplementedError):
        decode_y4m(b"\x00\x00\x00 ftypisom" + bytes(32))  # mp4-ish
    with _pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n" + bytes(24))
    clip = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    truncated = encode_y4m(clip)[:-5]
    with _pytest.raises(ValueError):
        decode_y4m(truncated)


def test_demux_frames_feed_image_pipeline(spark, documents):
    """The demuxer's BMP re-encode composes with decode_media: sampled
    frames run through the REAL image codec and reproduce the closed-form
    video pixel stats — video -> frames -> image pipeline, all real."""
    from iiot_data_engineering_lab_assignment_spark.operators.multimodal import (
        decode_media,
        demux_frames,
        media_video_from_documents,
    )

    frames = demux_frames(
        media_video_from_documents(documents.limit(10)), every_n=2
    )
    as_media = frames.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.col("frame_bmp").alias("payload"),
        F.lit("image/bmp").alias("mime"),
    )
    decoded = {r["media_id"]: r for r in decode_media(as_media, fake=False).collect()}
    for r in frames.collect():
        d = decoded[r["media_id"] * 1000 + r["frame_idx"]]
        did, k = r["media_id"], r["frame_idx"]
        assert k % 2 == 0  # every_n=2 strides the frame index
        assert d["width"] == 4 + did % 9 and d["height"] == 4 + did % 5
        assert d["top_left"] == (did * 17 + k * 29) % 256
        assert abs(d["mean_pixel"] - r["mean_pixel"]) < 1e-9


def test_audiocodec_rejects_degenerate_clips():
    """Review fixes: empty clips refuse to encode; zero-sample and
    zero-rate payloads (craftable even though encode_wav refuses them)
    raise ValueError instead of crashing downstream statistics; a fmt
    chunk truncated by end-of-file raises ValueError, not struct.error."""
    import struct

    import numpy as np
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.audiocodec import (
        decode_wav,
        encode_wav,
    )

    with _pytest.raises(ValueError, match="empty"):
        encode_wav(np.array([], dtype=np.int16), 8000)

    wav = bytearray(encode_wav(np.arange(4, dtype=np.int16), 8000))
    zero_rate = bytearray(wav)
    struct.pack_into("<I", zero_rate, 12 + 8 + 4, 0)  # fmt.sample_rate = 0
    with _pytest.raises(ValueError, match="sample rate"):
        decode_wav(bytes(zero_rate))
    empty_data = wav[: 12 + 8 + 16] + b"data" + struct.pack("<I", 0)
    with _pytest.raises(ValueError, match="empty data"):
        decode_wav(bytes(empty_data))
    truncated_fmt = bytes(wav[: 12 + 8 + 10])  # fmt declares 16, file ends at 10
    with _pytest.raises(ValueError, match="truncated fmt"):
        decode_wav(truncated_fmt)


def test_demux_frames_validates_stride_and_prunes_bmp(spark, documents):
    """Review fixes: non-positive strides raise at the API boundary (a
    negative stride silently produced zero frames); with_bmp=False drops
    the binary column from the schema so the stats path never pays the
    re-encode."""
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.multimodal import (
        demux_frames,
        media_video_from_documents,
    )

    media = media_video_from_documents(documents.limit(3))
    for bad in (0, -1):
        with _pytest.raises(ValueError, match="every_n"):
            demux_frames(media, every_n=bad)
    stats = demux_frames(media, every_n=1, with_bmp=False)
    assert "frame_bmp" not in stats.columns
    assert stats.count() > 0


def test_pngcodec_roundtrip_all_filters():
    """Every scanline filter (None/Sub/Up/Average/Paeth) round-trips
    pixel-exact, including 1-pixel edge shapes."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.pngcodec import decode_png, encode_png

    rng = np.random.RandomState(42)
    for h, w in ((7, 5), (1, 9), (6, 1), (1, 1)):
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ftype in range(5):
            out = decode_png(encode_png(img, filter_type=ftype))
            assert out.shape == img.shape, (h, w, ftype)
            assert (out == img).all(), (h, w, ftype)


def test_pngcodec_sniffed_by_decode_image():
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.imagecodec import decode_image
    from iiot_data_engineering_lab_assignment_spark.operators.pngcodec import encode_png

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    assert (decode_image(encode_png(img)) == img).all()


def test_pngcodec_strict_errors():
    import struct

    import numpy as np
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.pngcodec import decode_png, encode_png

    img = np.full((4, 4, 3), 9, dtype=np.uint8)
    payload = bytearray(encode_png(img))
    # flip one IDAT body byte (IHDR chunk spans bytes 8..32, IDAT data
    # starts at 41 for this 4x4 payload): CRC must catch it
    payload[45] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(payload))
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a whatever")
    with _pytest.raises(ValueError, match="truncated"):
        decode_png(encode_png(img)[:-2])  # cuts into IEND's CRC
    with _pytest.raises(ValueError, match="missing"):
        decode_png(encode_png(img)[:-12])  # IEND gone entirely
    # valid framing + CRCs but corrupt DEFLATE inside IDAT (review
    # finding r5: zlib.error must not escape the ValueError contract)
    bad_idat = b"not-deflate-data"
    crc = __import__("zlib").crc32(b"IDAT" + bad_idat) & 0xFFFFFFFF
    fake_idat = struct.pack(">I", len(bad_idat)) + b"IDAT" + bad_idat + struct.pack(">I", crc)
    framed = encode_png(img)
    ihdr_chunk = framed[8 : 8 + 12 + 13]
    iend = framed[-12:]
    with _pytest.raises(ValueError, match="DEFLATE"):
        decode_png(framed[:8] + ihdr_chunk + fake_idat + iend)
    # color type 6 (RGBA): honestly out of scope
    good = encode_png(img)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)
    import zlib as _zlib

    bad_ihdr = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    rgba = good[:8] + bad_ihdr + good[8 + 12 + 13 :]
    with _pytest.raises(NotImplementedError, match="truecolor"):
        decode_png(rgba)


def test_pngcodec_bounded_against_crafted_payloads():
    """Untrusted-bytes hardening (ADVICE r5): a tiny payload must not be
    able to direct a huge executor allocation — neither via giant IHDR
    dims nor via a deflate bomb whose IDAT inflates far past the raster."""
    import struct
    import zlib as _zlib

    import numpy as np
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.pngcodec import decode_png, encode_png

    def _chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # 1) IHDR claims 2^31 x 2^31 pixels in 12 bytes: rejected pre-alloc
    huge = struct.pack(">IIBBBBB", 2**31 - 1, 2**31 - 1, 8, 2, 0, 0, 0)
    payload = sig + _chunk(b"IHDR", huge) + _chunk(b"IDAT", b"x") + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="unreasonable PNG dimensions"):
        decode_png(payload)
    # zero-dim is equally invalid
    zero = struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0)
    payload = sig + _chunk(b"IHDR", zero) + _chunk(b"IDAT", b"x") + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="unreasonable PNG dimensions"):
        decode_png(payload)
    # 2) deflate bomb: honest 4x4 IHDR, IDAT inflating to 10 MB — the
    # bounded inflate must stop at raster-size+1, not materialize 10 MB
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = _zlib.compress(b"\x00" * 10_000_000, 9)  # ~10 KB compressed
    payload = sig + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="deflate bomb"):
        decode_png(payload)
    # 3) exact-size raster with trailing compressed garbage also rejected
    raster = (b"\x00" + b"\x07" * 12) * 4  # 4 rows, filter 0
    over = _zlib.compress(raster + b"\x00", 9)
    payload = sig + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", over) + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="inflates past"):
        decode_png(payload)
    # and the legitimate round-trip still works after the hardening
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (decode_png(encode_png(img)) == img).all()


def test_all_codecs_reject_malformed_payloads_gracefully():
    """100 TB of untrusted bytes WILL contain truncated and corrupt
    payloads: every decoder must raise ValueError/NotImplementedError —
    never a raw struct/numpy/index error — on any prefix of a valid
    payload and on arbitrary garbage."""
    import numpy as np
    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.operators.audiocodec import decode_wav, encode_wav
    from iiot_data_engineering_lab_assignment_spark.operators.imagecodec import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )
    from iiot_data_engineering_lab_assignment_spark.operators.pngcodec import decode_png, encode_png
    from iiot_data_engineering_lab_assignment_spark.operators.videocodec import decode_y4m, encode_y4m

    img = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    cases = [
        (decode_image, encode_bmp(img)),
        (decode_image, encode_ppm(img)),
        (decode_png, encode_png(img)),
        (decode_wav, encode_wav((np.arange(100) % 32767).astype(np.int16), 8000)),
        (decode_y4m, encode_y4m(np.stack([img, img]), (30, 1))),
    ]
    for dec, payload in cases:
        step = max(1, len(payload) // 40)
        for cut in range(0, len(payload), step):
            with _pytest.raises((ValueError, NotImplementedError)):
                dec(payload[:cut])
    rng = np.random.RandomState(0)
    for dec, _ in cases:
        for n in (0, 3, 60, 300):
            blob = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
            with _pytest.raises((ValueError, NotImplementedError)):
                dec(blob)


def test_asof_join_rejects_bad_tolerance_and_reserved_col(spark):
    """ADVICE r6: the tolerance string lands inside F.expr — only strict
    '<n> <unit>' interval text may pass; and '_rt' is reserved for the
    carried match timestamp, so a right value column by that name must
    be rejected rather than silently collided with."""
    import pytest

    from iiot_data_engineering_lab_assignment_spark.operators.joins import asof_join

    l = spark.createDataFrame([(1, "k", 1.0)], "ts long, k string, v double")
    r = spark.createDataFrame([(1, "k", 2.0)], "ts long, k string, w double")
    for bad in ("15 minutes); DROP TABLE x", "1 fortnight", "'1' minute", "minute"):
        with pytest.raises(ValueError, match="tolerance"):
            asof_join(l, r, ["k"], "ts", ["w"], tolerance=bad)
    with pytest.raises(ValueError, match="_rt"):
        asof_join(l, r.withColumnRenamed("w", "_rt"), ["k"], "ts", ["_rt"])
    # valid forms still accepted (multi-unit included)
    out = asof_join(
        l.withColumn("ts", F.col("ts").cast("timestamp")),
        r.withColumn("ts", F.col("ts").cast("timestamp")),
        ["k"], "ts", ["w"], tolerance="1 hour 30 minutes",
    )
    assert out.collect()[0]["w_right"] == 2.0
