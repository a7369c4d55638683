"""Pure-numpy audio codec: 16-bit PCM mono WAV (RIFF/WAVE).

Companion to ``imagecodec``: the runtime has no soundfile/librosa/ffmpeg
(pip has no network), but canonical PCM WAV is simple enough to implement
from the public RIFF specification in ~60 lines, which turns the audio
leg of the multimodal pipeline from a stub into a real decode:

* RIFF header: ``RIFF <size> WAVE``.
* ``fmt `` chunk (16-byte PCM form): audio_format=1 (PCM), channels,
  sample_rate, byte_rate, block_align, bits_per_sample.
* ``data`` chunk: little-endian int16 samples.

Only the form ``encode_wav`` emits — PCM16 mono — is accepted by
``decode_wav``; compressed formats (MP3/AAC/FLAC) genuinely need
external libraries and raise ``NotImplementedError``.  Chunk walking is
spec-correct (chunks are skipped by their declared size, so an extra
``LIST`` chunk doesn't break the parse), and the decoder is strict about
everything else: a truncated data chunk, a stereo file, or a 24-bit
sample width raises instead of returning garbage samples.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a PCM16 mono WAV file."""
    s = np.asarray(samples)
    if s.ndim != 1:
        raise ValueError(f"expected a 1-D sample array, got shape {s.shape}")
    if s.size == 0:
        raise ValueError("refusing to encode an empty clip")
    if s.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {s.dtype}")
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 mono WAV file into (int16 samples, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt_seen, rate, samples = 12, False, 0, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if csize < 16:
                raise NotImplementedError(f"fmt chunk too short ({csize} bytes)")
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_format, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_format != 1:
                raise NotImplementedError(
                    f"compressed WAV (format tag {audio_format}) needs an external codec"
                )
            if channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 mono supported, got {channels}ch/{bits}-bit"
                )
            fmt_seen = True
        elif cid == b"data":
            if len(body) < csize:
                raise ValueError("truncated data chunk")
            if csize & 1:
                # would otherwise surface as numpy's generic "buffer size
                # must be a multiple of element size"
                raise ValueError("odd data chunk size for 16-bit samples")
            if samples is not None:
                # last-wins would silently drop audio; the canonical form
                # has exactly one data chunk
                raise ValueError("multiple data chunks in WAV payload")
            samples = np.frombuffer(body[:csize], dtype="<i2")
        # chunks are word-aligned: odd sizes carry one pad byte
        pos += 8 + csize + (csize & 1)
    if not fmt_seen or samples is None:
        raise ValueError("missing fmt or data chunk")
    if samples.size == 0:
        raise ValueError("empty data chunk")
    if rate <= 0:
        raise ValueError(f"non-positive sample rate {rate}")
    return samples, rate
