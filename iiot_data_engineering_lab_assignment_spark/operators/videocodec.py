"""Pure-numpy video codec: uncompressed YUV4MPEG2 (Y4M), C444 form.

Companion to ``imagecodec``/``audiocodec``: Y4M is the standard
uncompressed interchange container (mplayer/x264/ffmpeg all speak it)
and its public format is simple enough to implement directly —

* stream header: ``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip A1:1 C444]\\n``
* each frame: ``FRAME\\n`` followed by the raw planes.

Only the C444 colorspace (three full-resolution planes per frame — no
chroma subsampling, so the round-trip is lossless) is supported; C420
and friends are a genuine resampling step and raise
``NotImplementedError``, as do compressed containers (MP4/WebM), which
need a real demuxer+decoder stack.  Frames decode to a (T, H, W, 3)
uint8 array whose channel axis is the (Y, Cb, Cr) plane order.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_y4m", "decode_y4m"]


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode a (T, H, W, 3) uint8 array as a C444 Y4M stream."""
    f = np.asarray(frames)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError(f"expected (T, H, W, 3) array, got {f.shape}")
    if f.dtype != np.uint8:
        raise ValueError(f"expected uint8 frames, got {f.dtype}")
    t, h, w, _ = f.shape
    num, den = fps
    out = [f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C444\n".encode("ascii")]
    for k in range(t):
        out.append(b"FRAME\n")
        # plane order: all-Y, all-Cb, all-Cr — channel-major, row-minor
        out.append(np.ascontiguousarray(f[k].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a C444 Y4M stream into ((T, H, W, 3) uint8 frames, fps)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise NotImplementedError("not a YUV4MPEG2 stream")
    w = h = 0
    num, den = 25, 1
    colorspace = "C420"  # the Y4M default when no C tag is present
    for tok in data[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            colorspace = tok
    if w <= 0 or h <= 0:
        raise ValueError("missing W/H in Y4M header")
    if colorspace != "C444":
        raise NotImplementedError(
            f"only C444 supported ({colorspace} needs chroma resampling)"
        )
    frame_bytes = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        start = fnl + 1
        plane = data[start : start + frame_bytes]
        if len(plane) < frame_bytes:
            raise ValueError("truncated frame")
        frames.append(
            np.frombuffer(plane, dtype=np.uint8)
            .reshape(3, h, w)
            .transpose(1, 2, 0)
        )
        pos = start + frame_bytes
    if not frames:
        raise ValueError("stream contains no frames")
    return np.stack(frames), (num, den)
