"""From-scratch baseline-TIFF codec (grayscale, strip-organized,
PackBits or uncompressed) — the fourth full image decode next to
PNG, GIF and the Y4M video leg, and the natural companion of the
Exif IFD parser (``exif_tiff.py``): Exif metadata IS a TIFF file,
and here the same IFD machinery drives pixel access.

Public format only (TIFF 6.0 baseline, §3-§7): image data lives in
STRIPS — ``RowsPerStrip`` rows each, located by the ``StripOffsets``
and ``StripByteCounts`` tag arrays (the last strip short when the
height is not a multiple) — optionally compressed per strip with
PackBits (§9: the Apple RLE — ``n ≤ 127`` literal runs, ``257-n``
repeat runs, ``128`` no-op). Strip organization is TIFF's unit of
random access and parallel decode: a reader seeks any strip without
touching the others, which is exactly the property a distributed
decoder wants (one task per strip range at scale).

Strict on structural damage (offsets beyond the file, PackBits
overruns, missing required tags → :class:`TiffError`); lenient on
what real writers do (either byte order, unknown tags skipped,
strips in any file order).
"""

from __future__ import annotations

import struct

import numpy as np

from .exif_tiff import _TYPE_SIZES, ExifError, parse_exif_tiff  # noqa: F401

COMP_NONE = 1
COMP_PACKBITS = 32773

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""


# ----------------------------------------------------------- PackBits

def packbits_encode(data: bytes) -> bytes:
    """Real PackBits: repeat runs for ≥3 equal bytes, literal runs
    otherwise (the classic encoder; never emits 128)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal: until the next ≥3 run or 128 bytes
        start = i
        i += run
        while i < n and i - start < 128:
            run = 1
            while (
                i + run < n and run < 3 and data[i + run] == data[i]
            ):
                run += 1
            if run >= 3:
                break
            i += run
        lit = data[start : min(i, start + 128)]
        i = start + len(lit)
        out.append(len(lit) - 1)
        out += lit
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    """Inverse of :func:`packbits_encode`, accepting any conforming
    stream (128 skipped per spec). Exactly ``expect`` bytes out."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c == 128:
            continue
        if c < 128:
            if i + c + 1 > n:
                raise TiffError("PackBits literal overruns input")
            out += data[i : i + c + 1]
            i += c + 1
        else:
            if i >= n:
                raise TiffError("PackBits run missing byte")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expect:
        raise TiffError(
            f"PackBits produced {len(out)} bytes, expected {expect}"
        )
    return bytes(out)


# ------------------------------------------------------------- writer

def tiff_encode(
    image: np.ndarray,
    byte_order: str = "II",
    compression: int = COMP_NONE,
    rows_per_strip: int = 4,
) -> bytes:
    """Serialize a grayscale ``(h, w)`` uint8 image as baseline TIFF
    with real strip organization."""
    if byte_order not in ("II", "MM"):
        raise TiffError("byte order must be II or MM")
    e = "<" if byte_order == "II" else ">"
    h, w = image.shape
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = image[y0 : y0 + rows_per_strip].astype(np.uint8).tobytes()
        strips.append(
            packbits_encode(raw)
            if compression == COMP_PACKBITS
            else raw
        )
    n_strips = len(strips)

    def entry(tag, typ, count, value):
        return struct.pack(f"{e}HHI", tag, typ, count) + value

    def short_val(v):
        return struct.pack(f"{e}H", v) + b"\x00\x00"

    def long_val(v):
        return struct.pack(f"{e}I", v)

    # layout: header(8), IFD (2 + 9*12 + 4), then offset/count
    # arrays (if n_strips > 1), then strip data
    ifd_size = 2 + 9 * 12 + 4
    arrays_at = 8 + ifd_size
    if n_strips > 1:
        off_arr_at = arrays_at
        cnt_arr_at = off_arr_at + 4 * n_strips
        data_at = cnt_arr_at + 4 * n_strips
    else:
        off_arr_at = cnt_arr_at = 0
        data_at = arrays_at
    offsets = []
    pos = data_at
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    entries = [
        entry(_TAG_WIDTH, 3, 1, short_val(w)),
        entry(_TAG_HEIGHT, 3, 1, short_val(h)),
        entry(_TAG_BITS, 3, 1, short_val(8)),
        entry(_TAG_COMPRESSION, 3, 1, short_val(compression)),
        entry(_TAG_PHOTOMETRIC, 3, 1, short_val(1)),
        entry(
            _TAG_STRIP_OFFSETS,
            4,
            n_strips,
            long_val(offsets[0] if n_strips == 1 else off_arr_at),
        ),
        entry(_TAG_SAMPLES, 3, 1, short_val(1)),
        entry(_TAG_ROWS_PER_STRIP, 3, 1, short_val(rows_per_strip)),
        entry(
            _TAG_STRIP_COUNTS,
            4,
            n_strips,
            long_val(
                len(strips[0]) if n_strips == 1 else cnt_arr_at
            ),
        ),
    ]
    entries.sort(key=lambda b: struct.unpack(f"{e}H", b[:2])[0])
    out = bytearray()
    out += byte_order.encode() + struct.pack(f"{e}HI", 42, 8)
    out += struct.pack(f"{e}H", len(entries))
    out += b"".join(entries)
    out += struct.pack(f"{e}I", 0)
    if n_strips > 1:
        for o in offsets:
            out += struct.pack(f"{e}I", o)
        for s in strips:
            out += struct.pack(f"{e}I", len(s))
    for s in strips:
        out += s
    return bytes(out)


# ------------------------------------------------------------- reader

def tiff_decode(payload: bytes) -> tuple[np.ndarray, dict]:
    """Parse baseline grayscale TIFF → ``((h, w) uint8, meta)`` with
    meta: width, height, byte_order, compression, n_strips."""
    if len(payload) < 8:
        raise TiffError("TIFF header truncated")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise TiffError(f"bad byte order {order!r}")
    magic, ifd_off = struct.unpack_from(f"{e}HI", payload, 2)
    if magic != 42:
        raise TiffError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(payload):
        raise TiffError("IFD offset out of bounds")
    (count,) = struct.unpack_from(f"{e}H", payload, ifd_off)
    if ifd_off + 2 + count * 12 + 4 > len(payload):
        raise TiffError("IFD truncated")
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(count):
        base = ifd_off + 2 + i * 12
        tag, typ, n = struct.unpack_from(f"{e}HHI", payload, base)
        tags[tag] = (typ, n, payload[base + 8 : base + 12])

    def values(tag: int) -> list[int]:
        if tag not in tags:
            raise TiffError(f"required tag {tag} missing")
        typ, n, field = tags[tag]
        size = _TYPE_SIZES.get(typ)
        if size is None or typ not in (3, 4):
            raise TiffError(f"unsupported type {typ} for tag {tag}")
        fmt = "H" if typ == 3 else "I"
        total = size * n
        if total <= 4:
            return list(
                struct.unpack_from(f"{e}{n}{fmt}", field, 0)
            )
        (off,) = struct.unpack(f"{e}I", field)
        if off + total > len(payload):
            raise TiffError(f"tag {tag} value offset out of bounds")
        return list(struct.unpack_from(f"{e}{n}{fmt}", payload, off))

    w = values(_TAG_WIDTH)[0]
    h = values(_TAG_HEIGHT)[0]
    if _TAG_BITS in tags and values(_TAG_BITS)[0] != 8:
        raise TiffError("only 8-bit samples supported")
    comp = (
        values(_TAG_COMPRESSION)[0]
        if _TAG_COMPRESSION in tags
        else COMP_NONE
    )
    if comp not in (COMP_NONE, COMP_PACKBITS):
        raise TiffError(f"unsupported compression {comp}")
    rps = (
        values(_TAG_ROWS_PER_STRIP)[0]
        if _TAG_ROWS_PER_STRIP in tags
        else h
    )
    offsets = values(_TAG_STRIP_OFFSETS)
    counts = values(_TAG_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise TiffError("StripOffsets/StripByteCounts length mismatch")
    out = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise TiffError(f"strip {si} beyond payload")
        rows = min(rps, h - si * rps)
        raw = payload[off : off + cnt]
        if comp == COMP_PACKBITS:
            raw = packbits_decode(raw, rows * w)
        elif len(raw) != rows * w:
            raise TiffError(f"strip {si} wrong size")
        out += raw
    if len(out) != w * h:
        raise TiffError("strip data does not cover the image")
    return (
        np.frombuffer(bytes(out), np.uint8).reshape(h, w),
        {
            "width": w,
            "height": h,
            "byte_order": order.decode(),
            "compression": comp,
            "n_strips": len(offsets),
        },
    )
