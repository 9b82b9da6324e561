"""From-scratch YUV4MPEG2 (.y4m) codec — the video leg of the
multimodal battery, next to the PNG (``png_codec.py``) and WAV
(``wav_codec.py``) codecs.

Public format only (the yuv4mpeg stream layout shipped with
mjpegtools and consumed by ffmpeg/x264): a plain-text stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> I<p|t|b> A<n>:<d> C<cs>``
terminated by ``\\n``, then per frame a ``FRAME`` line (optionally
with its own parameters) followed by raw planar YCbCr data. It is the
one real video container that needs no entropy decoder, so the
Spark-side plumbing — frame iteration, plane-size arithmetic per
colorspace, stride-correct sampling — is exercised end to end with
real bytes and a closed-form oracle.

Strict where a crawl needs diagnosis (bad magic, missing W/H,
truncated frame data, unknown colorspace all raise
:class:`Y4MError`); lenient where real writers wander (unknown
``X``-prefixed vendor parameters and per-frame parameters are
skipped, interlacing/aspect default when absent).
"""

from __future__ import annotations

import numpy as np

# bytes per chroma plane, as a fraction of W*H (numerator, denominator)
_CHROMA_FRACTION = {
    "420jpeg": (1, 4),
    "420mpeg2": (1, 4),
    "420paldv": (1, 4),
    "420": (1, 4),
    "422": (1, 2),
    "444": (1, 1),
    "mono": (0, 1),
}


class Y4MError(ValueError):
    """Malformed or unsupported YUV4MPEG2 payload."""


def y4m_encode(
    frames: list[np.ndarray],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420jpeg",
    chroma_fill: int = 128,
) -> bytes:
    """Serialize luma ``frames`` (each ``(h, w)`` uint8, identical
    shapes) into a y4m byte stream; chroma planes are filled with
    ``chroma_fill`` (video "no color")."""
    if not frames:
        raise Y4MError("no frames")
    h, w = frames[0].shape
    frac = _CHROMA_FRACTION.get(colorspace)
    if frac is None:
        raise Y4MError(f"unsupported colorspace {colorspace!r}")
    if colorspace.startswith("420") and (w % 2 or h % 2):
        raise Y4MError("4:2:0 requires even dimensions")
    chroma = bytes([chroma_fill]) * (w * h * frac[0] // frac[1])
    head = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace}\n".encode("ascii")
    )
    out = [head]
    for fr in frames:
        if fr.shape != (h, w):
            raise Y4MError("frame shape mismatch")
        out.append(b"FRAME\n")
        out.append(fr.astype(np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def y4m_decode(
    payload: bytes,
) -> tuple[list[np.ndarray], dict]:
    """Parse a y4m payload → ``(luma frames [(h, w) uint8], meta)``.

    ``meta`` carries width, height, fps_num, fps_den, colorspace.
    Chroma planes are size-validated and skipped — the luma plane is
    what every sampling/feature stage downstream consumes first.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise Y4MError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise Y4MError("unterminated stream header")
    w = h = 0
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"
    for tok in payload[9:nl].split():
        try:
            tag, val = chr(tok[0]), tok[1:].decode("ascii")
        except UnicodeDecodeError as exc:
            raise Y4MError("non-ascii header parameter") from exc
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, _, den = val.partition(":")
            fps_num, fps_den = int(num), int(den or "1")
        elif tag == "C":
            colorspace = val
        elif tag in ("I", "A", "X"):
            continue  # interlacing / aspect / vendor extension
        else:
            raise Y4MError(f"unknown header parameter {tag!r}")
    if w <= 0 or h <= 0:
        raise Y4MError("missing or invalid W/H")
    if fps_den <= 0 or fps_num <= 0:
        raise Y4MError("invalid frame rate")
    frac = _CHROMA_FRACTION.get(colorspace)
    if frac is None:
        raise Y4MError(f"unsupported colorspace {colorspace!r}")
    if colorspace.startswith("420") and (w % 2 or h % 2):
        raise Y4MError("4:2:0 requires even dimensions")
    y_size = w * h
    c_size = w * h * frac[0] // frac[1]
    frames: list[np.ndarray] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        # each frame starts with "FRAME" + optional params + "\n"
        if payload[pos : pos + 5] != b"FRAME":
            raise Y4MError("expected FRAME marker")
        fnl = payload.find(b"\n", pos + 5)
        if fnl < 0:
            raise Y4MError("unterminated FRAME header")
        body = fnl + 1
        end = body + y_size + 2 * c_size
        if end > n:
            raise Y4MError("truncated frame data")
        frames.append(
            np.frombuffer(
                payload, dtype=np.uint8, count=y_size, offset=body
            ).reshape(h, w)
        )
        pos = end
    if not frames:
        raise Y4MError("stream carries no frames")
    return frames, {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
    }
