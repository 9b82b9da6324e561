"""Exif/GPS privacy strip: metadata leaves, pixels stay."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_spark.functions.multimodal import (
    fixture_jpeg_full,
    fixture_jpeg_private,
)
from pdf_extractor_spark.operators.exif_tiff import (
    build_exif_tiff,
    parse_exif_tiff,
)
from pdf_extractor_spark.operators.jpeg_codec import (
    JpegError,
    jpeg_decode,
    jpeg_strip_metadata,
)


def test_strip_restores_exact_clean_bytes():
    """fixture_jpeg_private is the clean fixture plus planted
    segments: the strip must return the clean bytes EXACTLY."""
    for d in (0, 3, 7, 8, 17, 26):
        clean = fixture_jpeg_full(d)
        stripped, removed = jpeg_strip_metadata(
            fixture_jpeg_private(d)
        )
        assert stripped == clean, d
        assert removed == len(fixture_jpeg_private(d)) - len(clean)


def test_pixels_identical_before_and_after():
    for d in (0, 5, 12):
        a, _ = jpeg_decode(fixture_jpeg_private(d))
        b, _ = jpeg_decode(jpeg_strip_metadata(
            fixture_jpeg_private(d)
        )[0])
        for pa, pb in zip(a, b):
            assert np.array_equal(pa, pb)


def test_gps_subifd_roundtrips_and_flags():
    tiff = build_exif_tiff(
        "MM", 3, "Cam", "2026:01:01 00:00:00", (300, 1),
        gps=(48, 51, 24),
    )
    parsed = parse_exif_tiff(tiff)
    assert parsed["has_gps"] and parsed["orientation"] == 3
    no_gps = build_exif_tiff(
        "MM", 3, "Cam", "2026:01:01 00:00:00", (300, 1)
    )
    assert not parse_exif_tiff(no_gps)["has_gps"]


def test_schedule_constants_match_oracle_arithmetic():
    """The SQL twin hardcodes APP1 totals 173 (GPS) / 107 (no GPS)
    and COM 21 — pin them against the real builders."""
    for d, expect in ((0, 173 + 21), (1, 107 + 21), (8, 21)):
        _s, removed = jpeg_strip_metadata(fixture_jpeg_private(d))
        assert removed == expect, (d, removed)


def test_strip_rejects_non_jpeg():
    with pytest.raises(JpegError):
        jpeg_strip_metadata(b"PK\x03\x04not a jpeg")
