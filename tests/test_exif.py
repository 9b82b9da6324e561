"""Unit tests for the Exif/TIFF IFD parser (operators/exif_tiff.py)
and the harvest fixture schedule (functions/multimodal.py)."""

from __future__ import annotations

import struct

import pytest

from pdf_extractor_spark.functions.multimodal import fixture_exif_jpeg
from pdf_extractor_spark.operators.exif_tiff import (
    ExifError,
    build_exif_app1,
    build_exif_tiff,
    exif_from_jpeg,
    parse_exif_tiff,
)


def _tiff(order="II", **kw):
    args = dict(
        orientation=6,
        make="Acme",
        datetime="2026:08:20 12:34:56",
        x_res=(300, 1),
    )
    args.update(kw)
    return build_exif_tiff(order, **args)


class TestRoundtrip:
    @pytest.mark.parametrize("order", ["II", "MM"])
    def test_both_byte_orders(self, order):
        got = parse_exif_tiff(_tiff(order))
        assert got["byte_order"] == order
        assert got["orientation"] == 6
        assert got["make"] == "Acme"
        assert got["datetime"] == "2026:08:20 12:34:56"
        assert (got["x_res_num"], got["x_res_den"]) == (300, 1)

    def test_unknown_tags_skipped(self):
        # append a fifth entry with an unknown tag between known ones
        tiff = _tiff("II")
        # parse is lenient: inject via a fresh IFD would be complex —
        # instead verify unknown TYPE is skipped: patch DateTime's
        # type (2 → 200) and expect datetime to stay None
        dt_tag = struct.pack("<H", 0x0132)
        idx = tiff.index(dt_tag)
        bad = tiff[: idx + 2] + struct.pack("<H", 200) + tiff[idx + 4 :]
        got = parse_exif_tiff(bad)
        assert got["datetime"] is None
        assert got["orientation"] == 6  # rest of the IFD still parsed


class TestStrict:
    def test_bad_byte_order(self):
        with pytest.raises(ExifError, match="byte order"):
            parse_exif_tiff(b"XX\x2a\x00\x08\x00\x00\x00")

    def test_bad_magic(self):
        with pytest.raises(ExifError, match="magic"):
            parse_exif_tiff(b"II\x2b\x00\x08\x00\x00\x00")

    def test_corrupt_value_offset(self):
        with pytest.raises(ExifError, match="out of bounds"):
            parse_exif_tiff(_tiff("II", corrupt_offset=True))

    def test_truncated_ifd(self):
        with pytest.raises(ExifError):
            parse_exif_tiff(_tiff("MM")[:20])


class TestJpegWalk:
    def test_harvests_from_fixture(self):
        tiff = exif_from_jpeg(fixture_exif_jpeg(4))
        got = parse_exif_tiff(tiff)
        assert got["byte_order"] == "II"
        assert got["orientation"] == 5
        assert got["make"] == "Maker4"

    def test_comment_trap_not_matched(self):
        # doc 10 has NO APP1 but DOES carry 'Exif\0\0' inside a COM
        # segment — the marker walk must come back empty
        payload = fixture_exif_jpeg(10)
        assert b"Exif\x00\x00" in payload
        assert exif_from_jpeg(payload) is None

    def test_corrupt_schedule_raises(self):
        tiff = exif_from_jpeg(fixture_exif_jpeg(12))
        with pytest.raises(ExifError):
            parse_exif_tiff(tiff)

    def test_non_jpeg_returns_none(self):
        assert exif_from_jpeg(b"%PDF-1.4 not an image") is None

    def test_app1_wrapper(self):
        assert build_exif_app1(b"IIdata").startswith(b"Exif\x00\x00")
