"""Unit tests for the BMP codec (operators/bmp_codec.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_spark.functions.multimodal import fixture_bmp
from pdf_extractor_spark.operators.bmp_codec import (
    BmpError,
    bmp_decode,
    bmp_encode,
)


class TestBmp:
    @pytest.mark.parametrize("w", [12, 13, 14, 15])  # stride classes
    @pytest.mark.parametrize("top_down", [False, True])
    def test_palette_roundtrip_all_strides(self, w, top_down):
        img = np.random.RandomState(w).randint(
            0, 256, (7, w)
        ).astype(np.uint8)
        got, meta = bmp_decode(bmp_encode(img, 8, top_down=top_down))
        assert np.array_equal(got, img)
        assert meta["top_down"] is top_down

    def test_row_order_actually_flips(self):
        # distinct row values: a decoder ignoring bottom-up storage
        # returns the vertical mirror
        img = np.repeat(
            np.arange(5, dtype=np.uint8)[:, None] * 11, 4, axis=1
        )
        got, _ = bmp_decode(bmp_encode(img, 8))
        assert np.array_equal(got, img)

    def test_bt601_luma(self):
        bgr = np.zeros((1, 2, 3), np.uint8)
        bgr[0, 0] = (255, 0, 0)   # pure blue
        bgr[0, 1] = (0, 255, 0)   # pure green
        got, _ = bmp_decode(bmp_encode(bgr, 24))
        assert got[0, 0] == (29 * 255) >> 8
        assert got[0, 1] == (150 * 255) >> 8

    def test_bad_magic(self):
        with pytest.raises(BmpError, match="not a BMP"):
            bmp_decode(b"PNG" + bytes(60))

    def test_truncated_pixels(self):
        data = bmp_encode(np.zeros((8, 8), np.uint8), 8)
        with pytest.raises(BmpError, match="beyond payload"):
            bmp_decode(data[:-10])

    def test_rle_compression_rejected_loudly(self):
        data = bytearray(bmp_encode(np.zeros((4, 4), np.uint8), 8))
        data[30] = 1  # BI_RLE8
        with pytest.raises(BmpError, match="compression"):
            bmp_decode(bytes(data))

    def test_fixture_closed_form(self):
        for doc_id in (0, 1, 2, 3, 4, 5, 11):
            img, meta = bmp_decode(fixture_bmp(doc_id))
            w = 13 + doc_id % 8
            h = 6 + doc_id % 5
            base = (doc_id * 7) % 200
            assert (meta["width"], meta["height"]) == (w, h)
            assert meta["bits"] == (8 if doc_id % 2 == 0 else 24)
            assert meta["top_down"] == (doc_id % 3 == 1)
            want = h * (w * base + w * (w - 1) // 2)
            assert int(img.astype(np.int64).sum()) == want
