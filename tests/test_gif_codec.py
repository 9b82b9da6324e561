"""Unit tests for the from-scratch GIF codec (operators/gif_codec.py):
LZW machine (including the KwKwK case a literal encoder never emits),
interlace undo, extension skipping, strict failure modes."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_spark.functions.multimodal import fixture_gif
from pdf_extractor_spark.operators.gif_codec import (
    GifError,
    _lzw_decode,
    gif_decode,
    gif_encode,
)


def _frames(n=2, h=6, w=9, seed=11):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


class TestRoundtrip:
    @pytest.mark.parametrize("interlaced", [False, True])
    def test_frames_roundtrip_exactly(self, interlaced):
        frames = _frames(n=3)
        got, meta = gif_decode(gif_encode(frames, interlaced=interlaced))
        assert meta["interlaced"] is interlaced
        assert meta["n_frames"] == 3
        for a, b in zip(frames, got):
            assert np.array_equal(a, b)

    def test_clear_code_cycles_on_large_frame(self):
        # >253 pixels forces the encoder's CLEAR discipline repeatedly
        frames = _frames(n=1, h=40, w=40)
        got, _ = gif_decode(gif_encode(frames))
        assert np.array_equal(frames[0], got[0])

    def test_interlace_rows_restored(self):
        # a vertical ramp makes row-order bugs visible: every row is
        # its own value, so any residual shuffle breaks equality
        h, w = 13, 5  # odd height: uneven pass sizes
        fr = np.repeat(
            np.arange(h, dtype=np.uint8)[:, None] * 7, w, axis=1
        )
        got, meta = gif_decode(gif_encode([fr], interlaced=True))
        assert meta["interlaced"] is True
        assert np.array_equal(fr, got[0])


class TestLzwMachine:
    def test_kwkwk_case(self):
        # min_code=2: clear=4, eoi=5. Stream [clear, 0, 6, eoi] where
        # code 6 == len(table) exercises the first-use (KwKwK) branch:
        # entry = prev + prev[0] = b'\x00\x00' -> output [0, 0, 0]
        codes = [4, 0, 6, 5]
        width = 3
        acc = 0
        nbits = 0
        out = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        got = _lzw_decode(bytes(out), 2, 3)
        assert got.tolist() == [0, 0, 0]

    def test_code_beyond_table_raises(self):
        # code 7 > len(table)=6 right after clear: structurally broken
        codes = [4, 7]
        acc = codes[0] | (codes[1] << 3)
        with pytest.raises(GifError, match="beyond table"):
            _lzw_decode(bytes([acc & 0xFF]), 2, 4)

    def test_early_eoi_raises(self):
        codes = [4, 0, 5]  # one pixel, but expect=3
        acc = codes[0] | (codes[1] << 3) | (codes[2] << 6)
        data = bytes([acc & 0xFF, (acc >> 8) & 0xFF])
        with pytest.raises(GifError, match="ended early"):
            _lzw_decode(data, 2, 3)


class TestStructure:
    def test_bad_magic(self):
        with pytest.raises(GifError, match="not a GIF"):
            gif_decode(b"PNG!" + bytes(20))

    def test_truncated_sub_blocks(self):
        data = gif_encode(_frames(n=1))
        with pytest.raises(GifError, match="truncated"):
            gif_decode(data[: len(data) - 20])

    def test_extensions_skipped_by_length(self):
        # the NETSCAPE block the encoder writes contains arbitrary
        # bytes; additionally inject a comment extension whose body
        # contains an image-descriptor lookalike (0x2C)
        data = gif_encode(_frames(n=1))
        idx = data.index(b"\x21\xf9")  # before the first GCE
        trap = b"\x21\xfe\x05hi\x2c\x00\x01\x00"
        mutated = data[:idx] + trap + data[idx:]
        got, meta = gif_decode(mutated)
        assert meta["n_frames"] == 1

    def test_fixture_closed_form(self):
        for doc_id in (0, 1, 2, 3, 5, 9):
            frames, meta = gif_decode(fixture_gif(doc_id))
            w = 20 + 4 * (doc_id % 3)
            h = 10 + 2 * (doc_id % 2)
            assert (meta["width"], meta["height"]) == (w, h)
            assert meta["n_frames"] == 1 + doc_id % 3
            assert meta["interlaced"] == (doc_id % 4 == 1)
            for f, fr in enumerate(frames):
                base = (doc_id * 17 + f * 11) % 200
                want = h * (w * base + w * (w - 1) // 2)
                assert int(fr.astype(np.int64).sum()) == want
