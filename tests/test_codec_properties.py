"""Property tests (hypothesis) for the session's codecs: any valid
image roundtrips bit-exactly through GIF, TIFF, BMP and Y4M,
including degenerate shapes (1x1, 1xN, Nx1) and all parameter
combinations."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.operators.bmp_codec import bmp_decode, bmp_encode
from pdf_extractor_spark.operators.gif_codec import gif_decode, gif_encode
from pdf_extractor_spark.operators.tiff_codec import (
    COMP_PACKBITS,
    packbits_decode,
    packbits_encode,
    tiff_decode,
    tiff_encode,
)
from pdf_extractor_spark.operators.y4m_codec import y4m_decode, y4m_encode


@st.composite
def images(draw, max_h=24, max_w=24):
    h = draw(st.integers(1, max_h))
    w = draw(st.integers(1, max_w))
    seed = draw(st.integers(0, 2**31 - 1))
    # mix of random and runs-heavy content (exercises RLE paths)
    runny = draw(st.booleans())
    rng = np.random.RandomState(seed)
    if runny:
        vals = rng.randint(0, 4, (h, w)) * 63
        return vals.astype(np.uint8)
    return rng.randint(0, 256, (h, w)).astype(np.uint8)


@settings(max_examples=40, deadline=None)
@given(images(), st.booleans())
def test_gif_roundtrip(img, interlaced):
    got, meta = gif_decode(gif_encode([img], interlaced=interlaced))
    assert np.array_equal(got[0], img)
    assert (meta["width"], meta["height"]) == (
        img.shape[1], img.shape[0],
    )


@settings(max_examples=40, deadline=None)
@given(images(), st.sampled_from([1, COMP_PACKBITS]),
       st.sampled_from(["II", "MM"]), st.integers(1, 9))
def test_tiff_roundtrip(img, comp, order, rps):
    got, meta = tiff_decode(
        tiff_encode(
            img, byte_order=order, compression=comp,
            rows_per_strip=rps,
        )
    )
    assert np.array_equal(got, img)
    assert meta["n_strips"] == (img.shape[0] + rps - 1) // rps


@settings(max_examples=40, deadline=None)
@given(images(), st.booleans())
def test_bmp_palette_roundtrip(img, top_down):
    got, _ = bmp_decode(bmp_encode(img, 8, top_down=top_down))
    assert np.array_equal(got, img)


@settings(max_examples=30, deadline=None)
@given(images(max_h=12, max_w=12), st.integers(1, 4),
       st.sampled_from(["444", "mono"]))
def test_y4m_roundtrip(img, n_frames, cs):
    frames = [img] * n_frames
    got, meta = y4m_decode(y4m_encode(frames, colorspace=cs))
    assert len(got) == n_frames
    assert meta["colorspace"] == cs
    for fr in got:
        assert np.array_equal(fr, img)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=600))
def test_packbits_roundtrip_any_bytes(data):
    assert packbits_decode(packbits_encode(data), len(data)) == data
