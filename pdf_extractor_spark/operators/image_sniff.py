"""Image format + dimension sniffing over raw crawl bytes: route by
magic number, then read dimensions from each format's public header
structure — GIF (87a/89a logical screen descriptor), PNG (IHDR),
WebP (RIFF container: lossy VP8 frame tag, lossless VP8L packed
dims, extended VP8X canvas), JPEG via the marker walk in
:mod:`.jpeg_markers`.

This is the first pass an image pipeline runs over a mixed crawl
payload column: no decode, no library, a few hundred header bytes —
enough to size-filter and format-route billions of images before
anything expensive happens. Unknown or truncated bytes come back
('unknown', -1, -1): fail-closed, never garbage.
"""

from __future__ import annotations

import struct

from .jpeg_markers import jpeg_dimensions

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_image(data: bytes) -> tuple[str, int, int]:
    """(format, width, height) — format ∈ {'jpeg','png','gif','webp',
    'unknown'}; -1 dims when the header is truncated/corrupt."""
    if data[:2] == b"\xff\xd8":
        w, h, _c, _p, ok = jpeg_dimensions(data)
        return ("jpeg", w, h) if ok else ("jpeg", -1, -1)
    if data[:8] == _PNG_SIG:
        # IHDR must be first (spec §5.6): length(4) 'IHDR'(4) W(4) H(4)
        if len(data) >= 24 and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            return "png", w, h
        return "png", -1, -1
    if data[:6] in (b"GIF87a", b"GIF89a"):
        if len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
            return "gif", w, h
        return "gif", -1, -1
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return ("webp",) + _webp_dims(data)
    return "unknown", -1, -1


def _webp_dims(data: bytes) -> tuple[int, int]:
    fourcc = data[12:16]
    if fourcc == b"VP8 " and len(data) >= 30:
        # lossy: 3-byte frame tag, start code 9D 01 2A, then 14-bit
        # width/height in little-endian u16s (scaling bits masked)
        if data[23:26] != b"\x9d\x01\x2a":
            return -1, -1
        w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
        return w, h
    if fourcc == b"VP8L" and len(data) >= 25:
        # lossless: signature byte 0x2F, then width-1 in bits 0..13,
        # height-1 in bits 14..27 of the next 4 LE bytes
        if data[20] != 0x2F:
            return -1, -1
        bits = struct.unpack("<I", data[21:25])[0]
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if fourcc == b"VP8X" and len(data) >= 30:
        # extended: 4 bytes flags/reserved, 24-bit canvas w-1 / h-1
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return w, h
    return -1, -1


# ------------------------------------------------- fixture builders

def build_gif_header(width: int, height: int) -> bytes:
    """GIF89a logical screen descriptor + trailer — enough structure
    for any header sniffer, no LZW image data (out of scope)."""
    return (
        b"GIF89a" + struct.pack("<HH", width, height)
        + b"\x00\x00\x00"  # no GCT, bg 0, aspect 0
        + b"\x3b"          # trailer
    )


def build_webp_header(width: int, height: int, kind: str) -> bytes:
    """Minimal RIFF/WEBP container for ``kind`` ∈ {'vp8','vp8l',
    'vp8x'} with the given dimensions in the right bit layout."""
    if kind == "vp8":
        payload = (
            b"\x00\x00\x00"       # frame tag (keyframe bits unused here)
            + b"\x9d\x01\x2a"     # start code
            + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        )
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    elif kind == "vp8l":
        bits = (width - 1) | ((height - 1) << 14)
        payload = b"\x2f" + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    elif kind == "vp8x":
        payload = (
            b"\x00\x00\x00\x00"
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    else:
        raise ValueError(f"unknown webp kind {kind!r}")
    riff_len = 4 + len(chunk)
    return b"RIFF" + struct.pack("<I", riff_len) + b"WEBP" + chunk
