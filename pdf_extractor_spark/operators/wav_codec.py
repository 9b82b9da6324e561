"""From-scratch WAV (RIFF/PCM) codec — the audio leg of the
multimodal battery, next to the PNG codec (``png_codec.py``).

Public format only (RIFF spec / WAVE PCM): a ``RIFF`` header wrapping
an ``fmt `` chunk (PCM, format tag 1) and a ``data`` chunk of
little-endian interleaved int16 samples. Writer and reader are both
here so the fixture corpus can synthesize real audio bytes and the
decode path can be verified value-for-value against a closed-form
oracle (``functions/multimodal.py``).

Deliberately strict where a crawl needs diagnosis (truncated data
chunk, non-PCM format, bad magic all raise :class:`WavError` — the
crash-proof report variant catches it per document), lenient where
real writers wander (unknown chunks like ``LIST``/``INFO`` are
skipped; a short final chunk is an error, not a crash).
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def wav_encode(
    samples: np.ndarray, sample_rate: int = 8000
) -> bytes:
    """Serialize ``samples`` (shape ``(n, channels)``, int16) into a
    canonical PCM WAV byte string."""
    if samples.ndim != 2:
        raise WavError("samples must be (n, channels)")
    n, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV payload → ``(samples (n, channels) int16,
    sample_rate)``. Unknown chunks are skipped (word-aligned per the
    RIFF spec); anything structurally broken raises :class:`WavError`.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise WavError("not a RIFF container")
    if payload[8:12] != b"WAVE":
        raise WavError("RIFF without WAVE form type")
    pos = 12
    fmt_chunk: bytes | None = None
    data: bytes | None = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > n:
            raise WavError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt_chunk = payload[body_start : body_start + size]
        elif cid == b"data":
            data = payload[body_start : body_start + size]
        # RIFF chunks are word-aligned: odd sizes carry a pad byte
        pos = body_start + size + (size & 1)
    if pos < n:
        # leftover bytes too short to be a chunk header: a cut
        # mid-header is as truncated as a cut mid-body — stay loud
        raise WavError("trailing bytes are not a complete chunk")
    if fmt_chunk is None or len(fmt_chunk) < 16:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    tag, channels, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt_chunk, 0
    )
    if tag != 1 or bits != 16:
        raise WavError(f"unsupported format (tag={tag}, bits={bits})")
    if channels < 1 or block_align != channels * 2:
        raise WavError("inconsistent channel layout")
    if len(data) % block_align:
        raise WavError("data chunk not frame-aligned")
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    return samples, rate
