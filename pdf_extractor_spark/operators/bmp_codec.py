"""From-scratch BMP codec (BITMAPINFOHEADER, 8-bit palette and
24-bit true color) — the fifth image decode in the family.

Public format only (the Windows DIB layout): ``BM`` file header with
the pixel-data offset, a 40-byte BITMAPINFOHEADER, an optional
palette, and pixel rows stored BOTTOM-UP with each row padded to a
4-byte boundary — the two structural traps every naive reader trips
over (upside-down images / diagonal shear on widths not divisible by
4). A negative height means top-down storage, a rarely-exercised but
spec'd variant the decoder honors.

Strict on structural damage (bad magic, pixel data beyond the file,
unsupported bit depth or compression → :class:`BmpError`); lenient
where real writers wander (extra header bytes before the palette,
file-size field lies — ignored per common practice).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


def _row_stride(width: int, bits: int) -> int:
    return (width * bits // 8 + 3) & ~3


def bmp_encode(
    image: np.ndarray, bits: int = 8, top_down: bool = False
) -> bytes:
    """Serialize ``(h, w)`` uint8 (bits=8, grayscale palette) or
    ``(h, w, 3)`` uint8 BGR (bits=24) as a BMP byte stream."""
    if bits == 8:
        h, w = image.shape
        palette = b"".join(
            bytes([i, i, i, 0]) for i in range(256)
        )
        rows = image.astype(np.uint8)
    elif bits == 24:
        h, w, c = image.shape
        if c != 3:
            raise BmpError("24-bit image must be (h, w, 3)")
        palette = b""
        rows = image.astype(np.uint8)
    else:
        raise BmpError(f"unsupported bit depth {bits}")
    stride = _row_stride(w, bits)
    body = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        raw = rows[y].tobytes()
        body += raw + b"\x00" * (stride - len(raw))
    data_off = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bits,
        0,  # BI_RGB
        len(body),
        2835,
        2835,
        256 if bits == 8 else 0,
        0,
    )
    head = struct.pack(
        "<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off
    )
    return head + info + palette + bytes(body)


def bmp_decode(payload: bytes) -> tuple[np.ndarray, dict]:
    """Parse a BMP → ``((h, w) uint8 luma, meta)``. Palette images
    map through the palette's red channel; 24-bit uses the ITU-R
    BT.601 integer luma ((77 R + 150 G + 29 B) >> 8). meta: width,
    height, bits, top_down."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise BmpError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bits = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if comp != 0:
        raise BmpError(f"unsupported compression {comp}")
    if bits not in (8, 24):
        raise BmpError(f"unsupported bit depth {bits}")
    if w <= 0 or h_raw == 0:
        raise BmpError("invalid dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    palette = None
    if bits == 8:
        (used,) = struct.unpack_from("<I", payload, 46)
        n_colors = used or 256
        pal_at = 14 + hdr_size
        if pal_at + 4 * n_colors > len(payload):
            raise BmpError("palette beyond payload")
        palette = np.frombuffer(
            payload, np.uint8, 4 * n_colors, pal_at
        ).reshape(n_colors, 4)
    stride = _row_stride(w, bits)
    need = data_off + stride * h
    if need > len(payload):
        raise BmpError("pixel data beyond payload")
    out = np.empty((h, w), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        row_at = data_off + i * stride
        if bits == 8:
            idx = np.frombuffer(payload, np.uint8, w, row_at)
            safe = np.minimum(idx, len(palette) - 1)
            out[y] = palette[safe, 2]  # BGRx: red channel
        else:
            bgr = np.frombuffer(
                payload, np.uint8, w * 3, row_at
            ).reshape(w, 3).astype(np.int64)
            out[y] = (
                (77 * bgr[:, 2] + 150 * bgr[:, 1] + 29 * bgr[:, 0])
                >> 8
            ).astype(np.uint8)
    return out, {
        "width": w,
        "height": h,
        "bits": bits,
        "top_down": top_down,
    }
