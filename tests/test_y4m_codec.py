"""Unit tests for the from-scratch YUV4MPEG2 codec (operators/
y4m_codec.py) and the video leg wiring (functions/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_spark.functions.multimodal import fixture_video
from pdf_extractor_spark.operators.y4m_codec import (
    Y4MError,
    y4m_decode,
    y4m_encode,
)


def _frames(n=3, h=4, w=6, seed=7):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


class TestRoundtrip:
    @pytest.mark.parametrize("cs", ["420jpeg", "422", "444", "mono"])
    def test_luma_roundtrips_exactly(self, cs):
        frames = _frames()
        got, meta = y4m_decode(y4m_encode(frames, colorspace=cs))
        assert meta["colorspace"] == cs
        assert len(got) == len(frames)
        for a, b in zip(frames, got):
            assert np.array_equal(a, b)

    def test_fps_and_dims_carried(self):
        _, meta = y4m_decode(y4m_encode(_frames(h=8, w=10), fps=(30000, 1001)))
        assert (meta["width"], meta["height"]) == (10, 8)
        assert (meta["fps_num"], meta["fps_den"]) == (30000, 1001)

    def test_c420_variants_share_plane_size(self):
        frames = _frames(h=4, w=6)
        data = y4m_encode(frames, colorspace="420jpeg")
        for variant in (b"C420mpeg2", b"C420paldv", b"C420"):
            mutated = data.replace(b"C420jpeg", variant, 1)
            got, meta = y4m_decode(mutated)
            assert np.array_equal(got[0], frames[0])


class TestLenient:
    def test_vendor_x_params_skipped(self):
        data = y4m_encode(_frames())
        mutated = data.replace(
            b" C420jpeg\n", b" XYSCSS=420JPEG C420jpeg\n", 1
        )
        got, _ = y4m_decode(mutated)
        assert len(got) == 3

    def test_frame_level_params_skipped(self):
        data = y4m_encode(_frames(n=2))
        mutated = data.replace(b"FRAME\n", b"FRAME Xsecret\n", 1)
        got, _ = y4m_decode(mutated)
        assert len(got) == 2

    def test_defaults_when_f_and_c_absent(self):
        frames = _frames(h=4, w=6)
        data = y4m_encode(frames)
        # strip F and C params entirely: defaults 25:1, 420jpeg
        mutated = data.replace(b" F25:1", b"").replace(b" C420jpeg", b"")
        got, meta = y4m_decode(mutated)
        assert (meta["fps_num"], meta["fps_den"]) == (25, 1)
        assert meta["colorspace"] == "420jpeg"
        assert np.array_equal(got[0], frames[0])


class TestStrict:
    def test_bad_magic(self):
        with pytest.raises(Y4MError, match="YUV4MPEG2"):
            y4m_decode(b"RIFF not a video")

    def test_truncated_frame_data(self):
        data = y4m_encode(_frames())
        with pytest.raises(Y4MError, match="truncated"):
            y4m_decode(data[:-10])

    def test_unknown_colorspace(self):
        data = y4m_encode(_frames()).replace(b"C420jpeg", b"C410weird")
        with pytest.raises(Y4MError, match="colorspace"):
            y4m_decode(data)

    def test_missing_dimensions(self):
        with pytest.raises(Y4MError, match="W/H"):
            y4m_decode(b"YUV4MPEG2 F25:1\nFRAME\n")

    def test_odd_dims_rejected_for_420(self):
        with pytest.raises(Y4MError, match="even"):
            y4m_encode([np.zeros((3, 6), np.uint8)], colorspace="420jpeg")
        # ...but fine for 4:4:4
        got, _ = y4m_decode(
            y4m_encode([np.zeros((3, 6), np.uint8)], colorspace="444")
        )
        assert got[0].shape == (3, 6)

    def test_garbage_between_frames(self):
        data = y4m_encode(_frames(n=2))
        # corrupt the second FRAME marker
        idx = data.find(b"FRAME", data.find(b"FRAME") + 1)
        bad = data[:idx] + b"JUNK!" + data[idx + 5 :]
        with pytest.raises(Y4MError, match="FRAME"):
            y4m_decode(bad)

    def test_zero_frames(self):
        with pytest.raises(Y4MError, match="no frames"):
            y4m_decode(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n")


class TestFixture:
    def test_fixture_decodes_to_closed_form(self):
        # doc_id % 3 == 2 routes to the AVI/MJPEG container
        # (tests/test_avi_codec.py) — the Y4M thirds stay here
        for doc_id in (0, 1, 3, 7, 12, 42):
            frames, meta = y4m_decode(fixture_video(doc_id))
            w = 16 * (1 + doc_id % 2)
            h = 12 + 4 * (doc_id % 3)
            assert (meta["width"], meta["height"]) == (w, h)
            assert meta["fps_num"] == 24 + doc_id % 7
            assert len(frames) == 3 + doc_id % 4
            for f, fr in enumerate(frames):
                base = (doc_id * 31 + f * 7) % 200
                want = h * (w * base + w * (w - 1) // 2)
                assert int(fr.astype(np.int64).sum()) == want
