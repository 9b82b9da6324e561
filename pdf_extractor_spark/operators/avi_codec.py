"""From-scratch RIFF/AVI container codec for MJPEG streams — the
COMPRESSED video leg of the multimodal battery, next to the
uncompressed YUV4MPEG2 leg (``y4m_codec.py``).  Per-frame pixel
decode is delegated to the repo's own baseline JPEG machine
(``jpeg_codec.py``); this module owns only the public container
layout (msdn AVI RIFF form: ``RIFF('AVI ' LIST('hdrl' avih
LIST('strl' strh strf)) LIST('movi' 00dc...) idx1)``).

Reference behavior replicated: pdf-extractor treats every media
payload as an opaque binary column and extracts typed metadata +
content deterministically; the Spark-side contract (payloads born on
the decoding partition, never crossing an exchange) is shared with
every other codec leg.

Strict where a crawl needs diagnosis (bad fourccs, truncated chunks,
stream-count/frame-count lies, non-MJPG compression all raise
:class:`AviError`); lenient where real muxers wander (missing idx1,
unknown junk chunks, extra streams after the video one are skipped).
"""

from __future__ import annotations

import struct

import numpy as np

AVIIF_KEYFRAME = 0x10


class AviError(ValueError):
    """Malformed or unsupported AVI payload."""


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk, padded to an even byte boundary (pad byte is
    NOT counted in the stored size — the classic RIFF quirk)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def avi_encode_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Serialize pre-encoded JPEG frame bytestreams into an AVI with
    a single ``vids/MJPG`` stream and an idx1 index."""
    if not jpeg_frames:
        raise AviError("no frames")
    if width <= 0 or height <= 0:
        raise AviError("invalid dimensions")
    rate, scale = fps
    if rate <= 0 or scale <= 0:
        raise AviError("invalid frame rate")
    n = len(jpeg_frames)
    maxbuf = max(len(f) for f in jpeg_frames)
    usec = (1_000_000 * scale) // rate
    avih = struct.pack(
        "<14I",
        usec, 0, 0, 0x10,  # dwFlags: AVIF_HASINDEX
        n, 0, 1, maxbuf,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I2H8I", 0, 0, 0, 0, scale, rate, 0, n,
                      maxbuf, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, width, height, 1, 24,
        struct.unpack("<I", b"MJPG")[0],
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = [b"movi"]
    idx = []
    offset = 4  # idx1 offsets are relative to the movi list data start
    for fr in jpeg_frames:
        ck = _chunk(b"00dc", fr)
        idx.append(
            b"00dc" + struct.pack("<3I", AVIIF_KEYFRAME, offset, len(fr))
        )
        movi_payload.append(ck)
        offset += len(ck)
    movi = _chunk(b"LIST", b"".join(movi_payload))
    idx1 = _chunk(b"idx1", b"".join(idx))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking pad bytes."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError(
                f"chunk {fourcc!r} overruns its parent by "
                f"{body + size - end} bytes"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)


def _collect_frames(
    data: bytes, pos: int, end: int, frames: list[bytes]
) -> None:
    """Video chunks from a movi body, descending into ``LIST 'rec '``
    groups (interleave muxers batch one frame-time of chunks per rec
    list); JUNK/audio/other chunks are skipped."""
    for fourcc, body, size in _iter_chunks(data, pos, end):
        if fourcc in (b"00dc", b"00db"):
            frames.append(data[body : body + size])
        elif fourcc == b"LIST" and data[body : body + 4] == b"rec ":
            _collect_frames(data, body + 4, body + size, frames)


def avi_decode_mjpeg(payload: bytes) -> tuple[list[bytes], dict]:
    """Parse an AVI payload → ``(jpeg frame bytestreams, meta)``.

    ``meta`` carries width, height, fps_num, fps_den, n_frames (as
    declared by strh.dwLength), and handler. Frames come from the
    ``00dc``/``00db`` chunks of the movi list in stream order — the
    idx1 index, when present, is cross-checked but the movi walk is
    authoritative (real files ship broken indexes; broken MOVI data
    is unrecoverable either way)."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise AviError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if payload[8:12] != b"AVI ":
        raise AviError(f"RIFF form is {payload[8:12]!r}, not AVI")
    end = min(len(payload), 8 + riff_size)
    width = height = 0
    rate, scale, declared = 0, 0, -1
    handler = b""
    frames: list[bytes] = []
    n_indexed = -1
    for fourcc, body, size in _iter_chunks(payload, 12, end):
        if fourcc == b"LIST":
            ltype = payload[body : body + 4]
            if ltype == b"hdrl":
                for f2, b2, s2 in _iter_chunks(
                    payload, body + 4, body + size
                ):
                    if f2 == b"avih":
                        if s2 < 40:
                            raise AviError("short avih")
                        width, height = struct.unpack_from(
                            "<2I", payload, b2 + 32
                        )
                    elif f2 == b"LIST" and payload[
                        b2 : b2 + 4
                    ] == b"strl" and not handler:
                        for f3, b3, s3 in _iter_chunks(
                            payload, b2 + 4, b2 + s2
                        ):
                            if f3 == b"strh":
                                if s3 < 40:
                                    raise AviError("short strh")
                                if payload[b3 : b3 + 4] != b"vids":
                                    break  # not the video stream
                                handler = payload[b3 + 4 : b3 + 8]
                                scale, rate = struct.unpack_from(
                                    "<2I", payload, b3 + 20
                                )
                                (declared,) = struct.unpack_from(
                                    "<I", payload, b3 + 32
                                )
            elif ltype == b"movi":
                _collect_frames(payload, body + 4, body + size, frames)
        elif fourcc == b"idx1":
            n_indexed = sum(
                1
                for off in range(body, body + size - 15, 16)
                if payload[off : off + 4] in (b"00dc", b"00db")
            )
    if not handler:
        raise AviError("no vids stream header")
    if handler not in (b"MJPG", b"mjpg"):
        raise AviError(f"unsupported codec {handler!r}")
    if width <= 0 or height <= 0:
        raise AviError("missing avih dimensions")
    if rate <= 0 or scale <= 0:
        raise AviError("invalid strh frame rate")
    if not frames:
        raise AviError("movi list carries no video chunks")
    if declared >= 0 and declared != len(frames):
        raise AviError(
            f"strh declares {declared} frames, movi carries "
            f"{len(frames)}"
        )
    if n_indexed >= 0 and n_indexed != len(frames):
        raise AviError(
            f"idx1 indexes {n_indexed} frames, movi carries "
            f"{len(frames)}"
        )
    for i, fr in enumerate(frames):
        if fr[:2] != b"\xff\xd8":
            raise AviError(f"frame {i} is not a JPEG (no SOI)")
    return frames, {
        "width": width,
        "height": height,
        "fps_num": rate,
        "fps_den": scale,
        "n_frames": len(frames),
        "handler": handler.decode("ascii"),
    }


def avi_decode_luma_frames(
    payload: bytes,
) -> tuple[list[np.ndarray], dict]:
    """Full decode: container walk + per-frame baseline JPEG decode
    to luma planes ``(h, w) uint8``.  Frame dimensions are validated
    against the container header (muxers and codecs can disagree —
    that is a diagnosable corruption, not a tolerable quirk)."""
    from .jpeg_codec import jpeg_decode

    raw, meta = avi_decode_mjpeg(payload)
    out: list[np.ndarray] = []
    for i, fr in enumerate(raw):
        planes, jmeta = jpeg_decode(fr)
        if (jmeta["width"], jmeta["height"]) != (
            meta["width"], meta["height"]
        ):
            raise AviError(
                f"frame {i} is {jmeta['width']}x{jmeta['height']}, "
                f"container says {meta['width']}x{meta['height']}"
            )
        out.append(planes[0])
    return out, meta
