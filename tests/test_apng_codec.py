"""APNG codec: compositing semantics, the PNG-compat invariant, and
structural strictness."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_extractor_spark.operators.apng_codec import (
    apng_decode,
    apng_encode,
)
from pdf_extractor_spark.operators.png_codec import (
    PngError,
    png_decode,
    png_encode,
)


def _base() -> np.ndarray:
    return (
        np.arange(24 * 24, dtype=np.int64) % 256
    ).astype(np.uint8).reshape(24, 24)


def test_composites_patches_and_keeps_frame0_png_compatible():
    p1 = np.full((8, 8), 200, dtype=np.uint8)
    data = apng_encode([(_base(), 0, 0), (p1, 8, 8)], num_plays=2)
    frames, meta = apng_decode(data)
    assert meta["n_frames"] == 2 and meta["num_plays"] == 2
    expect = _base().copy()
    assert np.array_equal(frames[0][:, :, 0], expect)
    expect[8:16, 8:16] = 200
    assert np.array_equal(frames[1][:, :, 0], expect)
    # the compatibility trick: an ordinary PNG decoder sees frame 0
    assert np.array_equal(png_decode(data)[:, :, 0], _base())


def test_dispose_background_clears_before_next_frame():
    p1 = np.full((8, 8), 200, dtype=np.uint8)
    p2 = np.full((8, 8), 50, dtype=np.uint8)
    data = apng_encode(
        [(_base(), 0, 0), (p1, 0, 0), (p2, 16, 16)],
        dispose_background={1},
    )
    frames, _ = apng_decode(data)
    # frame 1's region cleared to 0 before frame 2 rendered
    assert frames[2][0, 0, 0] == 0
    assert frames[2][16, 16, 0] == 50


def test_plain_png_is_a_one_frame_animation():
    frames, meta = apng_decode(png_encode(_base()[:, :, None]))
    assert meta["n_frames"] == 1
    assert np.array_equal(frames[0][:, :, 0], _base())


def test_broken_sequence_numbers_raise():
    data = bytearray(apng_encode(
        [(_base(), 0, 0), (np.full((8, 8), 9, np.uint8), 0, 0)]
    ))
    # corrupt the fdAT sequence number (fcTL seq 0,1 then fdAT 2)
    i = bytes(data).find(b"fdAT")
    struct.pack_into(">I", data, i + 4, 7)
    # fix the CRC so only the SEMANTIC breakage remains
    import zlib as _z
    (ln,) = struct.unpack_from(">I", data, i - 4)
    crc = _z.crc32(bytes(data[i:i + 4 + ln])) & 0xFFFFFFFF
    struct.pack_into(">I", data, i + 4 + ln, crc)
    with pytest.raises(PngError, match="sequence"):
        apng_decode(bytes(data))


def test_out_of_canvas_region_and_truncation_raise():
    with pytest.raises(PngError, match="region"):
        apng_encode([
            (_base(), 0, 0),
            (np.full((8, 8), 1, np.uint8), 20, 20),
        ])
    data = apng_encode([(_base(), 0, 0)])
    with pytest.raises(PngError):
        apng_decode(data[:len(data) // 2])


def test_frame_count_mismatch_raises():
    data = bytearray(apng_encode(
        [(_base(), 0, 0), (np.full((8, 8), 9, np.uint8), 0, 0)]
    ))
    i = bytes(data).find(b"acTL")
    struct.pack_into(">I", data, i + 4, 5)  # claim 5 frames
    import zlib as _z
    crc = _z.crc32(bytes(data[i:i + 12])) & 0xFFFFFFFF
    struct.pack_into(">I", data, i + 12, crc)
    with pytest.raises(PngError, match="declares"):
        apng_decode(bytes(data))
