"""JPEG marker-segment parsing: dimensions/components/progressive
from the header, no entropy decode (ITU-T T.81 §B — the public
marker grammar; what ``identify`` reads).

An image pipeline filters by size BEFORE paying for fetch+decode, so
the dimension sniff must walk the MARKER LENGTH FIELDS, not scan for
byte patterns: an APP1 Exif payload legally contains bytes that look
exactly like an SOF marker (a thumbnail's own SOI..SOF!), and a
pattern scan reads the thumbnail's dimensions instead of the
image's. The fixture plants that trap.

Writer side synthesizes a structurally-valid JPEG header stream
(SOI, APP0/JFIF, the Exif trap, DQT, SOF0/SOF2, DHT, SOS, token
entropy bytes, EOI) with known dimensions; entropy data is
deliberately NOT a real scan — full pixel decode is out of scope
(and honestly so: dimension sniffing never needs it).
"""

from __future__ import annotations

import struct

# markers with NO length field (standalone)
_STANDALONE = frozenset(
    [0xD8, 0xD9, 0x01] + list(range(0xD0, 0xD8))  # SOI EOI TEM RSTn
)
# SOF markers carrying frame dimensions: C0-CF except C4 (DHT),
# C8 (JPG extension) and CC (DAC)
_SOF = frozenset(
    c for c in range(0xC0, 0xD0) if c not in (0xC4, 0xC8, 0xCC)
)


def jpeg_dimensions(data: bytes) -> tuple[int, int, int, bool, bool]:
    """(width, height, components, progressive, ok) — ok=False (and
    -1 dims) for truncated/non-JPEG bytes. Walks marker length
    fields; APPn/COM payloads are skipped whole, so lookalike bytes
    inside them cannot fool the walk."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return -1, -1, -1, False, False
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return -1, -1, -1, False, False  # desynced: not a marker
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            i += 1
            continue
        if marker in _STANDALONE:
            i += 2
            continue
        seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
        if seglen < 2 or i + 2 + seglen > n:
            return -1, -1, -1, False, False  # truncated segment
        if marker in _SOF:
            if seglen < 8:
                return -1, -1, -1, False, False
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            ncomp = data[i + 9]
            return w, h, ncomp, marker == 0xC2, True
        if marker == 0xDA:  # SOS before any SOF: malformed
            return -1, -1, -1, False, False
        i += 2 + seglen
    return -1, -1, -1, False, False


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(
        ">H", len(payload) + 2
    ) + payload


def build_jpeg_header(
    width: int, height: int, components: int = 3,
    progressive: bool = False, exif_trap: bool = True,
    truncate: bool = False,
) -> bytes:
    """Structurally-valid JPEG byte stream with the given frame
    dimensions. ``exif_trap`` embeds an APP1 payload containing a
    fake thumbnail SOF claiming 16x16 — a pattern scanner reports
    the thumbnail, the length-field walk never sees it.
    ``truncate`` cuts the stream before the SOF (a crawl-truncated
    image): dimensions must come back unreadable, never garbage."""
    out = [b"\xff\xd8"]  # SOI
    out.append(_seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"))
    if exif_trap:
        fake_sof = (
            b"\xff\xd8" + _seg(
                0xC0, b"\x08\x00\x10\x00\x10\x01\x01\x11\x00"
            )
        )
        out.append(_seg(0xE1, b"Exif\x00\x00" + fake_sof))
    out.append(_seg(0xDB, b"\x00" + bytes(64)))  # DQT (one table)
    if truncate:
        return b"".join(out)
    comps = bytes().join(
        bytes([cid + 1, 0x11, 0x00]) for cid in range(components)
    )
    sof_payload = (
        b"\x08" + struct.pack(">HH", height, width)
        + bytes([components]) + comps
    )
    out.append(_seg(0xC2 if progressive else 0xC0, sof_payload))
    out.append(_seg(0xC4, b"\x00" + bytes(16) + b"\x00"))  # DHT stub
    sos_comps = bytes().join(
        bytes([cid + 1, 0x00]) for cid in range(components)
    )
    out.append(_seg(0xDA, bytes([components]) + sos_comps
                    + b"\x00\x3f\x00"))
    out.append(b"\x12\x34\x56\x78")  # token entropy bytes (not a scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)
