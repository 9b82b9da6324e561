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


def wav_encode_g711(
    samples: np.ndarray, law: str, sample_rate: int = 8000
) -> bytes:
    """Serialize int16 ``samples`` (n, channels) as a G.711 WAV:
    ``law`` ∈ {"ulaw", "alaw"} → format tag 7 / 6, 8 bits per
    sample — the standard telephony layout."""
    if samples.ndim != 2:
        raise WavError("samples must be (n, channels)")
    if law == "ulaw":
        tag, codes = 7, ulaw_encode(samples)
    elif law == "alaw":
        tag, codes = 6, alaw_encode(samples)
    else:
        raise WavError(f"unknown law {law!r}")
    n, channels = samples.shape
    data = codes.astype(np.uint8).tobytes()
    byte_rate = sample_rate * channels
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, byte_rate, channels, 8
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) & 1:
        data += b"\x00"  # RIFF word alignment pad
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data) - 1) + data
        )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a WAV payload → ``(samples (n, channels) int16,
    sample_rate)``. PCM (tag 1, 16-bit) passes through; G.711 µ-law
    (tag 7) and A-law (tag 6) 8-bit streams expand through the
    from-scratch companding tables. Unknown chunks are skipped
    (word-aligned per the RIFF spec); anything structurally broken
    raises :class:`WavError`.
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
    if tag == 1 and bits == 16:
        if channels < 1 or block_align != channels * 2:
            raise WavError("inconsistent channel layout")
        if len(data) % block_align:
            raise WavError("data chunk not frame-aligned")
        samples = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
        return samples, rate
    if tag in (6, 7) and bits == 8:
        if channels < 1 or block_align != channels:
            raise WavError("inconsistent channel layout")
        if len(data) % block_align:
            # a RIFF pad byte on an odd-sized mono data chunk is
            # already excluded by the declared size slice
            raise WavError("data chunk not frame-aligned")
        codes = np.frombuffer(data, dtype=np.uint8)
        pcm = ulaw_decode(codes) if tag == 7 else alaw_decode(codes)
        return pcm.reshape(-1, channels), rate
    raise WavError(f"unsupported format (tag={tag}, bits={bits})")


# ------------------------------------------------ G.711 companding
#
# ITU-T G.711 (public spec): 8-bit logarithmic PCM — µ-law (North
# America/Japan telephony) and A-law (Europe) — the formats 8 kHz
# voice audio in web archives actually uses. Both are pure integer
# bit-twiddling, vectorized here and mirrored exactly by the SQL
# oracle (same shifts, same bias constants).

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → µ-law bytes (G.711 §4.1, the classic table-free
    form)."""
    s = samples.astype(np.int32)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.minimum(np.abs(s), _ULAW_CLIP) + _ULAW_BIAS
    # segment = position of the leading bit above bit 7, computed by
    # pure integer threshold sums (NOT floating log2: the SQL twin
    # must land on the same side of every 2^k boundary)
    exp = sum(
        (mag >= (1 << e)).astype(np.int32) for e in range(8, 15)
    )
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """µ-law bytes → int16."""
    u = (~codes.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → A-law bytes (G.711 §4.2; even-bit inversion 0x55)."""
    s = samples.astype(np.int32)
    sign = np.where(s >= 0, 0x80, 0)
    mag = np.minimum(np.abs(s), 32767) >> 3  # 13-bit magnitude
    exp = np.zeros_like(mag)
    m = mag.copy()
    for e in range(7, 0, -1):
        exp = np.where(mag >= (1 << (e + 4)), np.maximum(exp, e), exp)
    mant = np.where(
        exp == 0, (mag >> 1) & 0x0F, (mag >> exp) & 0x0F
    )
    del m
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes → int16."""
    a = codes.astype(np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(
        exp == 0, (mant << 1) + 1,
        ((mant << 1) + 1 + 32) << (exp - 1),
    )
    # The 13-bit value above is already the quantization-interval
    # midpoint (ITU-T G.711 table 2 / Sun's (mant<<4)+8, +0x108<<(seg-1)
    # forms); shifting to 16-bit range needs no further half-step.
    mag = mag << 3
    return np.where(sign != 0, mag, -mag).astype(np.int16)
