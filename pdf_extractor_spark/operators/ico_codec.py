"""From-scratch ICO (favicon) codec — the container every website
serves at ``/favicon.ico``: an ICONDIR of sized entries whose
payloads are either whole PNG files (the modern form) or the legacy
DIB quirk — a BITMAPINFOHEADER whose ``height`` field is DOUBLED
because the XOR color bitmap is followed by a 1-bit AND transparency
mask, each stored bottom-up with 32-bit row padding.

Public format only (the Windows ICO layout is documented in the PNG
and BMP specs' terms plus the widely published ICONDIR grammar).
Reuses the existing codecs: PNG entries decode through
:mod:`png_codec`; DIB entries share :mod:`bmp_codec`'s conventions
(8-bit palette reads the palette's red channel; the identity palette
written here makes the luma closed-form).

Strict on structure (bad magic, truncated entries, offsets out of
bounds → :class:`IcoError`); the per-entry payload kind is sniffed
from the payload itself (PNG signature vs DIB header size 40), and
decoded dimensions are authoritative over the 1-byte ICONDIRENTRY
size hints (which cannot even express 256 except as 0 — handled).
"""

from __future__ import annotations

import struct

import numpy as np

from .png_codec import png_decode, png_encode


class IcoError(ValueError):
    """Malformed or unsupported ICO payload."""


def _mask_stride(w: int) -> int:
    return ((w + 31) // 32) * 4


def _xor_stride(w: int) -> int:
    return (w + 3) // 4 * 4  # 8-bit rows padded to 32-bit


def ico_encode(
    entries: list[tuple[str, np.ndarray, int]],
    hotspots: list[tuple[int, int]] | None = None,
) -> bytes:
    """Serialize ``(kind, gray_pixels (h, w) uint8,
    n_transparent_cols)`` entries. ``kind`` ∈ {"png", "dib"}. For
    DIB entries the AND mask marks the leftmost
    ``n_transparent_cols`` columns transparent (1-bits); PNG
    entries ignore the mask argument (alpha lives inside PNG).
    ``hotspots`` (one (x, y) per entry) writes a CUR cursor file
    (ICONDIR type 2) instead of an icon."""
    blobs = []
    dir_entries = []
    offset = 6 + 16 * len(entries)
    for kind, px, n_cols in entries:
        h, w = px.shape
        if kind == "png":
            blob = png_encode(px[:, :, None])
        elif kind == "dib":
            # identity grayscale palette: index == luma
            palette = b"".join(
                bytes([i, i, i, 0]) for i in range(256)
            )
            hdr = struct.pack(
                "<IiiHHIIiiII",
                40, w, h * 2, 1, 8, 0, 0, 0, 0, 0, 0,
            )
            xs = _xor_stride(w)
            xor_rows = b"".join(
                px[y].tobytes() + bytes(xs - w)
                for y in range(h - 1, -1, -1)
            )
            ms = _mask_stride(w)
            mask_row = np.zeros(ms * 8, dtype=np.uint8)
            mask_row[:n_cols] = 1
            packed = np.packbits(mask_row).tobytes()
            mask_rows = packed * h
            blob = hdr + palette + xor_rows + mask_rows
        else:
            raise IcoError(f"unknown entry kind {kind!r}")
        if hotspots is None:
            f4, f5 = 1, 8 if kind == "dib" else 32
        else:
            f4, f5 = hotspots[len(dir_entries)]
        dir_entries.append(struct.pack(
            "<BBBBHHII",
            w if w < 256 else 0, h if h < 256 else 0,
            0, 0, f4, f5,
            len(blob), offset,
        ))
        blobs.append(blob)
        offset += len(blob)
    return (
        struct.pack("<HHH", 0, 2 if hotspots is not None else 1,
                    len(entries))
        + b"".join(dir_entries) + b"".join(blobs)
    )


def ico_decode(payload: bytes) -> list[dict]:
    """Parse an ICO (type 1) or CUR cursor (type 2 — same container,
    but ICONDIRENTRY fields 4-5 become the hotspot x/y) → one dict
    per entry: ``{kind, width, height, luma (h, w) uint8,
    transparent_px, hotspot}``. ``hotspot`` is (x, y) for cursors,
    None for icons. PNG entries report transparent_px 0 (alpha is
    PNG-side); DIB entries count the AND mask's 1-bits inside the
    visible width."""
    if len(payload) < 6:
        raise IcoError("truncated ICONDIR")
    reserved, rtype, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or rtype not in (1, 2):
        raise IcoError("not an ICO/CUR (bad ICONDIR)")
    is_cursor = rtype == 2
    if 6 + 16 * count > len(payload):
        raise IcoError("truncated ICONDIRENTRY table")
    out = []
    for k in range(count):
        (
            _w8, _h8, _colors, _rsv, f4, f5, size, off
        ) = struct.unpack_from("<BBBBHHII", payload, 6 + 16 * k)
        hotspot = (f4, f5) if is_cursor else None
        if off + size > len(payload):
            raise IcoError(f"entry {k} beyond payload")
        blob = payload[off:off + size]
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            px = png_decode(blob)
            h, w, c = px.shape
            luma = (
                px[:, :, 0] if c == 1
                else ((77 * px[:, :, 0].astype(np.int64)
                       + 150 * px[:, :, 1] + 29 * px[:, :, 2])
                      >> 8).astype(np.uint8)
            )
            out.append({
                "kind": "png", "width": w, "height": h,
                "luma": luma, "transparent_px": 0,
                "hotspot": hotspot,
            })
            continue
        if len(blob) < 40:
            raise IcoError(f"entry {k} too short for a DIB")
        (hdr_size,) = struct.unpack_from("<I", blob, 0)
        if hdr_size != 40:
            raise IcoError(f"entry {k}: DIB header size {hdr_size}")
        w, h2 = struct.unpack_from("<ii", blob, 4)
        _planes, bits = struct.unpack_from("<HH", blob, 12)
        (comp,) = struct.unpack_from("<I", blob, 16)
        if comp != 0 or bits != 8:
            raise IcoError(
                f"entry {k}: unsupported DIB (bits={bits})"
            )
        if h2 % 2 or h2 <= 0 or w <= 0:
            raise IcoError(f"entry {k}: bad doubled height {h2}")
        h = h2 // 2  # the ICO quirk: XOR + AND share the field
        pal_off = 40
        palette = np.frombuffer(
            blob[pal_off:pal_off + 1024], dtype=np.uint8
        ).reshape(-1, 4)
        if palette.shape[0] < 256:
            raise IcoError(f"entry {k}: short palette")
        xs = _xor_stride(w)
        px_off = pal_off + 1024
        need = px_off + xs * h + _mask_stride(w) * h
        if need > len(blob):
            raise IcoError(f"entry {k}: truncated bitmap data")
        rows = np.frombuffer(
            blob[px_off:px_off + xs * h], dtype=np.uint8
        ).reshape(h, xs)[:, :w]
        idx = rows[::-1]  # bottom-up storage
        luma = palette[idx.reshape(-1), 2].reshape(h, w)  # red chan
        ms = _mask_stride(w)
        mask_off = px_off + xs * h
        mrows = np.frombuffer(
            blob[mask_off:mask_off + ms * h], dtype=np.uint8
        ).reshape(h, ms)
        mbits = np.unpackbits(mrows, axis=1)[:, :w]
        out.append({
            "kind": "dib", "width": w, "height": h,
            "luma": luma.astype(np.uint8),
            "transparent_px": int(mbits.sum()),
            "hotspot": hotspot,
        })
    return out
