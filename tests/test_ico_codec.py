"""ICO favicon codec: the doubled-height DIB quirk, PNG entries,
and structural strictness."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_extractor_spark.operators.ico_codec import (
    IcoError,
    ico_decode,
    ico_encode,
)


def _ramp(n: int) -> np.ndarray:
    return (
        np.arange(n * n, dtype=np.int64) % 256
    ).astype(np.uint8).reshape(n, n)


def test_mixed_entries_roundtrip():
    data = ico_encode([
        ("png", _ramp(16), 0),
        ("dib", _ramp(32), 7),
        ("dib", _ramp(16), 0),
    ])
    ents = ico_decode(data)
    assert [e["kind"] for e in ents] == ["png", "dib", "dib"]
    assert np.array_equal(ents[0]["luma"], _ramp(16))
    assert np.array_equal(ents[1]["luma"], _ramp(32))
    assert ents[1]["transparent_px"] == 7 * 32
    assert ents[2]["transparent_px"] == 0


def test_dib_height_field_is_doubled_on_the_wire():
    """The ICO quirk itself: a 16-tall DIB entry stores 32 in its
    header's height field (XOR + AND share it)."""
    data = ico_encode([("dib", _ramp(16), 3)])
    (off,) = struct.unpack_from("<I", data, 6 + 12)
    _hdr, w, h2 = struct.unpack_from("<Iii", data, off)
    assert (w, h2) == (16, 32)
    assert ico_decode(data)[0]["height"] == 16


def test_odd_doubled_height_rejected():
    data = bytearray(ico_encode([("dib", _ramp(16), 0)]))
    (off,) = struct.unpack_from("<I", data, 6 + 12)
    struct.pack_into("<i", data, off + 8, 31)  # not even
    with pytest.raises(IcoError, match="doubled height"):
        ico_decode(bytes(data))


def test_truncation_and_bad_magic_raise():
    data = ico_encode([("png", _ramp(16), 0)])
    for cut in (3, 10, len(data) - 5):
        with pytest.raises(IcoError):
            ico_decode(data[:cut])
    # a CUR header whose entry is all zeros: valid container type
    # (2 = cursor, accepted), garbage entry -> still loud
    with pytest.raises(IcoError):
        ico_decode(b"\x00\x00\x02\x00\x01\x00" + bytes(32))


def test_bottom_up_row_order_recovered():
    px = np.zeros((16, 16), dtype=np.uint8)
    px[0, :] = 200  # top row bright
    ents = ico_decode(ico_encode([("dib", px, 0)]))
    assert ents[0]["luma"][0, 0] == 200 and ents[0]["luma"][15, 0] == 0


def test_cur_cursor_carries_hotspots():
    """CUR is the same container with type 2 and hotspot fields in
    place of planes/bitcount."""
    data = ico_encode(
        [("dib", _ramp(16), 0), ("png", _ramp(32), 0)],
        hotspots=[(3, 5), (10, 12)],
    )
    assert struct.unpack_from("<H", data, 2)[0] == 2
    ents = ico_decode(data)
    assert ents[0]["hotspot"] == (3, 5)
    assert ents[1]["hotspot"] == (10, 12)
    assert np.array_equal(ents[0]["luma"], _ramp(16))
    # icons keep hotspot None
    assert ico_decode(
        ico_encode([("dib", _ramp(16), 0)])
    )[0]["hotspot"] is None
