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


@given(images(max_h=40, max_w=40), st.integers(1, 100),
       st.booleans(), st.integers(0, 4))
@settings(max_examples=40, deadline=None)
def test_jpeg_baseline_progressive_agree(img, quality, sub, ri):
    """For ANY image, quality, sampling and restart interval: the
    progressive encoding decodes to exactly the baseline pixels
    (same quantized coefficients, different delivery), and both
    roundtrips are deterministic."""
    from pdf_extractor_spark.operators.jpeg_codec import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    planes = [img] if img.shape[0] % 2 else [img, img, img]
    base = jpeg_encode(
        planes, quality=quality, subsample=sub, restart_interval=ri
    )
    prog = jpeg_encode_progressive(
        planes, quality=quality, subsample=sub, restart_interval=ri
    )
    pb, mb = jpeg_decode(base)
    pp, mp = jpeg_decode(prog)
    assert mp["progressive"] and not mb["progressive"]
    for a, b in zip(pb, pp):
        assert np.array_equal(a, b)
    # determinism: byte-identical re-encode
    assert base == jpeg_encode(
        planes, quality=quality, subsample=sub, restart_interval=ri
    )


@given(images(max_h=40, max_w=40), st.integers(1, 10))
@settings(max_examples=25, deadline=None)
def test_apng_composites_any_patch(img, seed):
    """Any base frame plus any in-bounds patch: frame 1 equals the
    numpy composite, frame 0 equals the base, and a plain PNG
    decoder sees exactly frame 0."""
    from pdf_extractor_spark.operators.apng_codec import (
        apng_decode,
        apng_encode,
    )
    from pdf_extractor_spark.operators.png_codec import png_decode

    h, w = img.shape
    rng = np.random.RandomState(seed)
    ph = rng.randint(1, h + 1)
    pw = rng.randint(1, w + 1)
    py = rng.randint(0, h - ph + 1)
    px = rng.randint(0, w - pw + 1)
    patch = rng.randint(0, 256, size=(ph, pw)).astype(np.uint8)
    data = apng_encode([(img, 0, 0), (patch, px, py)])
    frames, meta = apng_decode(data)
    assert meta["n_frames"] == 2
    assert np.array_equal(frames[0][:, :, 0], img)
    expect = img.copy()
    expect[py:py + ph, px:px + pw] = patch
    assert np.array_equal(frames[1][:, :, 0], expect)
    assert np.array_equal(png_decode(data)[:, :, 0], img)


@given(st.integers(0, 400))
@settings(max_examples=60, deadline=None)
def test_g711_projection_any_block(seed):
    """decode(encode(x)) is a projection for both laws on random
    int16 blocks, and the quantization error is bounded by the
    largest segment step."""
    from pdf_extractor_spark.operators.wav_codec import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=257).astype(np.int16)
    for enc, dec in (
        (ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)
    ):
        q = dec(enc(s))
        assert np.abs(
            q.astype(np.int32) - s.astype(np.int32)
        ).max() <= 1024
        assert np.array_equal(dec(enc(q)), q)
