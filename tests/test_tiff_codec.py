"""Unit tests for the baseline-TIFF codec (operators/tiff_codec.py):
PackBits machine, strip reassembly, both byte orders, strict
failure modes."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_spark.functions.multimodal import fixture_tiff
from pdf_extractor_spark.operators.tiff_codec import (
    COMP_PACKBITS,
    TiffError,
    packbits_decode,
    packbits_encode,
    tiff_decode,
    tiff_encode,
)


def _img(h=15, w=24, seed=1):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w)
    ).astype(np.uint8)


class TestPackBits:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"a",
            b"ab",
            b"aaa",
            b"aaaa" * 50,               # long run, splits at 128
            b"abcabcabc",               # pure literal
            bytes(range(256)) * 3,      # literal split at 128
            b"ab" + b"c" * 200 + b"de",
        ],
    )
    def test_roundtrip(self, data):
        assert packbits_decode(packbits_encode(data), len(data)) == data

    def test_noop_128_skipped(self):
        # 0x80 is a spec'd no-op between runs
        enc = b"\x80" + packbits_encode(b"xyz") + b"\x80"
        assert packbits_decode(enc, 3) == b"xyz"

    def test_overrun_raises(self):
        with pytest.raises(TiffError, match="overruns"):
            packbits_decode(b"\x05ab", 6)  # literal claims 6, has 2

    def test_wrong_total_raises(self):
        with pytest.raises(TiffError, match="expected"):
            packbits_decode(packbits_encode(b"abc"), 5)


class TestTiff:
    @pytest.mark.parametrize("order", ["II", "MM"])
    @pytest.mark.parametrize("comp", [1, COMP_PACKBITS])
    def test_roundtrip(self, order, comp):
        img = _img()
        got, meta = tiff_decode(
            tiff_encode(img, byte_order=order, compression=comp)
        )
        assert np.array_equal(got, img)
        assert meta["byte_order"] == order
        assert meta["compression"] == comp
        assert meta["n_strips"] == 4  # ceil(15/4): short last strip

    def test_single_strip_inline_offsets(self):
        img = _img(h=6)
        got, meta = tiff_decode(tiff_encode(img, rows_per_strip=100))
        assert meta["n_strips"] == 1
        assert np.array_equal(got, img)

    def test_strip_beyond_payload_raises(self):
        data = tiff_encode(_img())
        with pytest.raises(TiffError):
            tiff_decode(data[: len(data) - 30])

    def test_missing_required_tag_raises(self):
        with pytest.raises(TiffError, match="truncated|missing"):
            tiff_decode(b"II\x2a\x00\x08\x00\x00\x00\x00\x00")

    def test_bad_magic(self):
        with pytest.raises(TiffError, match="magic"):
            tiff_decode(b"II\x2b\x00\x08\x00\x00\x00")

    def test_fixture_closed_form(self):
        for doc_id in (0, 1, 2, 3, 4, 7):
            img, meta = tiff_decode(fixture_tiff(doc_id))
            w = 24 + 8 * (doc_id % 3)
            h = 15 + doc_id % 4
            base = (doc_id * 13) % 200
            assert (meta["width"], meta["height"]) == (w, h)
            assert meta["n_strips"] == (h + 3) // 4
            want = w * (h * base + h * (h - 1) // 2)
            assert int(img.astype(np.int64).sum()) == want
