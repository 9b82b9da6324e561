"""From-scratch Exif/TIFF IFD parsing — the image-metadata harvest
next to the dimension sniff (``jpeg_markers.py``).

Public formats only: the Exif APP1 payload is ``Exif\\x00\\x00``
followed by a TIFF file (TIFF 6.0 §2 / Exif 2.x §4.5): a 2-byte byte
order (``II`` little / ``MM`` big), magic 42, the IFD0 offset, then
IFDs of 12-byte entries (tag, type, count, value-or-offset — values
wider than 4 bytes live at an offset into the same payload). A crawl
pipeline harvests orientation (to normalize pixels before any
perceptual hash), capture timestamp, and camera make — the fields
this parser extracts.

Writer and reader live together so the fixture corpus synthesizes
real Exif bytes with closed-form field values; the reader is strict
where diagnosis matters (bad magic, out-of-bounds value offsets,
truncated IFDs raise :class:`ExifError`) and lenient where real
writers wander (unknown tags/types are skipped, missing NUL
terminators tolerated, either endianness throughout).
"""

from __future__ import annotations

import struct

TAG_MAKE = 0x010F
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_XRESOLUTION = 0x011A

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


class ExifError(ValueError):
    """Malformed or unsupported Exif/TIFF payload."""


# ------------------------------------------------------------- writer

TAG_GPS_IFD = 0x8825
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002


def build_exif_tiff(
    byte_order: str,
    orientation: int,
    make: str,
    datetime: str,
    x_res: tuple[int, int],
    corrupt_offset: bool = False,
    gps: tuple[int, int, int] | None = None,
) -> bytes:
    """Serialize one IFD0 with the four harvest tags into TIFF bytes
    (not yet APP1-wrapped). ``corrupt_offset`` plants an
    out-of-bounds value offset on XResolution — the truncated-crawl
    shape the parser must refuse loudly. ``gps`` ((deg, min, sec))
    adds a real GPS sub-IFD (pointer tag 0x8825 → GPSLatitudeRef +
    GPSLatitude rationals) — the location-privacy payload an image
    scrub exists to remove."""
    if byte_order not in ("II", "MM"):
        raise ExifError("byte order must be II or MM")
    e = "<" if byte_order == "II" else ">"
    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime.encode("ascii") + b"\x00"
    n_entries = 5 if gps is not None else 4
    # layout: header(8) + count(2) + entries(12 each) + next(4),
    # then the out-of-line data area, then (optionally) the GPS IFD
    # and its out-of-line rationals
    data_start = 8 + 2 + n_entries * 12 + 4
    make_off = data_start
    dt_off = make_off + len(make_b)
    res_off = dt_off + len(dt_b)
    if corrupt_offset:
        res_off = 1 << 20  # far beyond the payload
    gps_ifd_off = res_off + 8 if not corrupt_offset else (
        dt_off + len(dt_b) + 8
    )

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        return struct.pack(f"{e}HHI", tag, typ, count) + value

    def inline_short(v: int) -> bytes:
        # SHORT count=1: value occupies the first two bytes of the
        # 4-byte field in stream order, rest padding
        return struct.pack(f"{e}H", v) + b"\x00\x00"

    entries = [
        entry(TAG_MAKE, 2, len(make_b), struct.pack(f"{e}I", make_off)),
        entry(TAG_ORIENTATION, 3, 1, inline_short(orientation)),
        entry(
            TAG_XRESOLUTION, 5, 1, struct.pack(f"{e}I", res_off)
        ),
        entry(TAG_DATETIME, 2, len(dt_b), struct.pack(f"{e}I", dt_off)),
    ]
    if gps is not None:
        entries.append(entry(
            TAG_GPS_IFD, 4, 1, struct.pack(f"{e}I", gps_ifd_off)
        ))
    # IFD entries must be sorted by tag per TIFF 6.0
    entries.sort(key=lambda b: struct.unpack(f"{e}H", b[:2])[0])
    head = byte_order.encode("ascii") + struct.pack(f"{e}HI", 42, 8)
    ifd = struct.pack(f"{e}H", len(entries)) + b"".join(entries)
    ifd += struct.pack(f"{e}I", 0)  # no next IFD
    data = make_b + dt_b + struct.pack(f"{e}II", *x_res)
    out = head + ifd + data
    if gps is not None:
        # GPS IFD: 2 entries (ref inline, latitude out-of-line)
        lat_off = gps_ifd_off + 2 + 2 * 12 + 4
        gps_ifd = struct.pack(f"{e}H", 2)
        gps_ifd += entry(TAG_GPS_LAT_REF, 2, 2, b"N\x00\x00\x00")
        gps_ifd += entry(
            TAG_GPS_LAT, 5, 3, struct.pack(f"{e}I", lat_off)
        )
        gps_ifd += struct.pack(f"{e}I", 0)
        rats = b"".join(
            struct.pack(f"{e}II", v, 1) for v in gps
        )
        out += gps_ifd + rats
    return out


def build_exif_app1(tiff: bytes) -> bytes:
    """Wrap TIFF bytes into the APP1 marker segment body."""
    return b"Exif\x00\x00" + tiff


# ------------------------------------------------------------- reader

def parse_exif_tiff(tiff: bytes) -> dict:
    """Parse IFD0 → the harvested fields:

        {byte_order, orientation, make, datetime,
         x_res_num, x_res_den}

    Missing tags come back None; structural damage raises
    :class:`ExifError`.
    """
    if len(tiff) < 8:
        raise ExifError("TIFF header truncated")
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ExifError(f"bad byte order {order!r}")
    magic, ifd_off = struct.unpack_from(f"{e}HI", tiff, 2)
    if magic != 42:
        raise ExifError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(tiff):
        raise ExifError("IFD0 offset out of bounds")
    (count,) = struct.unpack_from(f"{e}H", tiff, ifd_off)
    end = ifd_off + 2 + count * 12
    if end + 4 > len(tiff):
        raise ExifError("IFD0 truncated")
    out: dict = {
        "byte_order": order.decode("ascii"),
        "orientation": None,
        "make": None,
        "datetime": None,
        "x_res_num": None,
        "x_res_den": None,
        "has_gps": False,
    }

    def value_bytes(typ: int, n: int, field: bytes) -> bytes:
        size = _TYPE_SIZES.get(typ)
        if size is None:
            return b""  # unknown type: skip (lenient)
        total = size * n
        if total <= 4:
            return field[:total]
        (off,) = struct.unpack(f"{e}I", field)
        if off + total > len(tiff):
            raise ExifError(
                f"value offset {off} out of bounds for type {typ}"
            )
        return tiff[off : off + total]

    for i in range(count):
        base = ifd_off + 2 + i * 12
        tag, typ, n = struct.unpack_from(f"{e}HHI", tiff, base)
        field = tiff[base + 8 : base + 12]
        if tag == TAG_ORIENTATION and typ == 3 and n >= 1:
            out["orientation"] = struct.unpack(
                f"{e}H", value_bytes(typ, n, field)[:2]
            )[0]
        elif tag == TAG_MAKE and typ == 2:
            raw = value_bytes(typ, n, field)
            out["make"] = raw.split(b"\x00")[0].decode(
                "ascii", "replace"
            )
        elif tag == TAG_DATETIME and typ == 2:
            raw = value_bytes(typ, n, field)
            out["datetime"] = raw.split(b"\x00")[0].decode(
                "ascii", "replace"
            )
        elif tag == TAG_XRESOLUTION and typ == 5 and n >= 1:
            num, den = struct.unpack(
                f"{e}II", value_bytes(typ, n, field)[:8]
            )
            out["x_res_num"], out["x_res_den"] = num, den
        elif tag == TAG_GPS_IFD:
            out["has_gps"] = True
        # any other tag: skipped (lenient) — IFD walk continues
    return out


def exif_from_jpeg(data: bytes) -> bytes | None:
    """Walk JPEG marker segments and return the TIFF payload of the
    first APP1 Exif segment, or None when the image carries none.
    Marker-length walk (never a byte scan), same discipline as the
    dimension sniff."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:
            return None  # entropy data begins: no Exif before scan
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        if seglen < 2 or i + 2 + seglen > n:
            return None
        if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
            return data[i + 10 : i + 2 + seglen]
        i += 2 + seglen
    return None
