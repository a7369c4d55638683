"""Pure-numpy + stdlib-zlib PNG codec: 8-bit truecolor (RGB) PNG.

Round-5 upgrade to the multimodal codec tier: PNG was previously listed
with JPEG as "needs external libraries", but it does not — DEFLATE is in
the Python standard library (``zlib``), and the rest of the format
(chunk framing with CRC-32, IHDR, the five scanline filters) is
implementable from the public PNG specification (RFC 2083 / ISO 15948)
in ~150 lines.  JPEG/MP3/MP4 remain honestly out of scope: lossy DCT /
psychoacoustic codecs genuinely need real codec libraries.

Scope, mirroring the other codecs' only-what-we-emit strictness:

* 8-bit depth, color type 2 (truecolor RGB), no interlacing.  Palette /
  grayscale / alpha color types and Adam7 interlacing raise
  ``NotImplementedError``; a corrupt payload (bad signature, CRC
  mismatch, short raster) raises ``ValueError``.
* All five scanline filters (None/Sub/Up/Average/Paeth) are decoded;
  ``encode_png`` writes one chosen filter for every row (default 0) so
  tests can exercise each decoder path with real payloads.

Filter arithmetic is mod-256 on bytes with the Paeth predictor computed
in full ints, exactly as specified.  Sub is vectorized as a per-channel
cumulative sum mod 256; Up is pure row arithmetic; Average/Paeth carry a
left-neighbor dependency and run as per-row loops (payload images in
this pipeline are small synthetic tiles — decode cost is not the
bottleneck, the Arrow batch transfer is).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel (8-bit RGB)
# Largest raster a single row's binary cell may decode to (~192 MB RGB).
# IHDR claims beyond this are rejected before any buffer is sized — the
# engine's contract is "100 TB of untrusted bytes", so a 12-byte header
# must never direct a multi-GB executor allocation.
_MAX_PIXELS = 64 * 1024 * 1024


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG.

    ``filter_type`` (0-4) is applied to every scanline — 0 (None) for
    production use; 1-4 exist so tests can round-trip each decoder
    filter path against a real payload.
    """
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got {img.shape}")
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {img.dtype}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w, _ = img.shape
    raw = img.astype(np.int16)
    prev = np.zeros((w, _BPP), dtype=np.int16)
    lines = []
    for r in range(h):
        row = raw[r]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, _BPP), np.int16), row[:-1]])
            filt = (row - left) % 256
        elif filter_type == 2:  # Up
            filt = (row - prev) % 256
        elif filter_type == 3:  # Average
            filt = np.empty_like(row)
            for c in range(w):
                a = row[c - 1] if c > 0 else np.zeros(_BPP, np.int16)
                filt[c] = (row[c] - (a + prev[c]) // 2) % 256
        else:  # Paeth
            filt = np.empty_like(row)
            for c in range(w):
                for ch in range(_BPP):
                    a = int(row[c - 1, ch]) if c > 0 else 0
                    b = int(prev[c, ch])
                    cc = int(prev[c - 1, ch]) if c > 0 else 0
                    filt[c, ch] = (int(row[c, ch]) - _paeth(a, b, cc)) % 256
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor PNG into an (H, W, 3) uint8 RGB array."""
    if len(data) < len(_SIGNATURE) or data[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = len(_SIGNATURE)
    w = h = None
    idat = b""
    saw_end = False
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen or pos + 12 + clen > len(data):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                # cap BEFORE any allocation: a 12-byte IHDR can claim
                # 4G x 4G dims; untrusted bytes must not size our buffers
                raise ValueError(
                    f"unreasonable PNG dimensions {w}x{h} (cap {_MAX_PIXELS} px)"
                )
            if depth != 8 or color != 2:
                raise NotImplementedError(
                    f"only 8-bit truecolor RGB supported (depth={depth}, "
                    f"color type={color}; palette/gray/alpha out of scope)"
                )
            if comp != 0 or filt != 0:
                raise ValueError(f"invalid compression/filter method ({comp}/{filt})")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            saw_end = True
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped by framing
        pos += 12 + clen
    if w is None or not idat or not saw_end:
        raise ValueError("missing IHDR, IDAT, or IEND chunk")
    stride = 1 + w * _BPP
    expected = stride * h
    try:
        # bounded inflate: a deflate bomb (tiny IDAT, huge plaintext) may
        # never allocate past the raster the validated IHDR promised
        dec = zlib.decompressobj()
        raw = dec.decompress(idat, expected + 1)
        if len(raw) > expected or (len(raw) == expected and dec.decompress(b"", 1)):
            raise ValueError(
                f"IDAT inflates past the {expected}-byte raster (deflate bomb?)"
            )
    except zlib.error as e:
        # valid chunk framing + CRCs but a corrupt DEFLATE stream must
        # still honor the ValueError contract (review finding r5)
        raise ValueError(f"corrupt DEFLATE stream in IDAT: {e}") from e
    if len(raw) != expected:
        raise ValueError(
            f"raster size mismatch: got {len(raw)} bytes, expected {expected}"
        )
    out = np.zeros((h, w, _BPP), dtype=np.uint8)
    prev = np.zeros((w, _BPP), dtype=np.int32)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        ftype = line[0]
        row = np.frombuffer(line, dtype=np.uint8, count=w * _BPP, offset=1)
        row = row.reshape(w, _BPP).astype(np.int32)
        if ftype == 0:
            recon = row
        elif ftype == 1:  # Sub: per-channel cumulative sum mod 256
            recon = np.cumsum(row, axis=0) % 256
        elif ftype == 2:  # Up
            recon = (row + prev) % 256
        elif ftype == 3:  # Average
            recon = np.empty_like(row)
            for c in range(w):
                a = recon[c - 1] if c > 0 else np.zeros(_BPP, np.int32)
                recon[c] = (row[c] + (a + prev[c]) // 2) % 256
        elif ftype == 4:  # Paeth
            recon = np.empty_like(row)
            for c in range(w):
                for ch in range(_BPP):
                    a = int(recon[c - 1, ch]) if c > 0 else 0
                    b = int(prev[c, ch])
                    cc = int(prev[c - 1, ch]) if c > 0 else 0
                    recon[c, ch] = (int(row[c, ch]) + _paeth(a, b, cc)) % 256
        else:
            raise ValueError(f"invalid scanline filter type {ftype}")
        out[r] = recon.astype(np.uint8)
        prev = recon
    return out
