"""Baseline-JPEG codec: roundtrip vs an independent naive-DCT
reference, structural traps, and the closed-form fixture contract.

The reference IDCT/FDCT here is the textbook O(N^4) double loop
written directly from the T.81 formulas — deliberately a different
algorithm and code path from the codec's einsum matrix form, so a
transposition/scale bug in one cannot hide in the other.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from pdf_extractor_spark.operators.jpeg_codec import (
    jpeg_encode_progressive,
    AC_SYMBOLS,
    DC_SYMBOLS,
    HUFF_AC,
    HUFF_DC,
    JpegError,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _canonical_codes,
    jpeg_decode,
    jpeg_encode,
    jpeg_to_rgb,
    scale_quant,
)
from pdf_extractor_spark.operators.jpeg_markers import jpeg_dimensions


# ------------------------------------------------ naive reference

def _naive_fdct(block: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def _naive_idct(coef: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = 0.25 * s
    return out


def _reference_roundtrip(
    img: np.ndarray, quant: np.ndarray
) -> np.ndarray:
    """Encode-side quantize + decode-side reconstruct of one padded
    grayscale plane via the naive loops, matching the codec's
    rounder (floor(x + 0.5 + 1e-9))."""
    h, w = img.shape
    out = np.zeros_like(img, dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[
                8 * by:8 * by + 8, 8 * bx:8 * bx + 8
            ].astype(np.float64) - 128.0
            coef = _naive_fdct(blk)
            q = np.floor(coef / quant + 0.5 + 1e-9)
            rec = _naive_idct(q * quant)
            out[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = np.clip(
                np.floor(rec + 0.5 + 1e-9) + 128, 0, 255
            )
    return out.astype(np.uint8)


# -------------------------------------------------------- roundtrip

def test_gray_matches_naive_reference_with_ac():
    """Random 32x24 grayscale (full AC content, quality 90 so many
    AC survive): codec decode == naive-loop reference, pixel exact."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(24, 32)).astype(np.uint8)
    data = jpeg_encode([img], quality=90)
    planes, meta = jpeg_decode(data)
    assert (meta["width"], meta["height"]) == (32, 24)
    expect = _reference_roundtrip(img, scale_quant(QUANT_LUMA, 90))
    assert np.array_equal(planes[0], expect)


def test_color_444_matches_naive_reference():
    rng = np.random.RandomState(7)
    planes_in = [
        rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
        for _ in range(3)
    ]
    data = jpeg_encode(planes_in, quality=75, subsample=False)
    planes, meta = jpeg_decode(data)
    assert meta["n_components"] == 3 and not meta["subsampled"]
    qy = scale_quant(QUANT_LUMA, 75)
    qc = scale_quant(QUANT_CHROMA, 75)
    for got, src, q in zip(planes, planes_in, [qy, qc, qc]):
        assert np.array_equal(got, _reference_roundtrip(src, q))


def test_partial_mcu_crop_and_edge_padding():
    """Dims not multiples of the MCU: decode crops to the frame
    size; padded region must not bleed into real pixels (reference
    computed on the explicitly edge-padded image)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(13, 19)).astype(np.uint8)
    data = jpeg_encode([img], quality=80)
    planes, meta = jpeg_decode(data)
    assert planes[0].shape == (13, 19)
    padded = np.pad(img, ((0, 3), (0, 5)), mode="edge")
    expect = _reference_roundtrip(padded, scale_quant(QUANT_LUMA, 80))
    assert np.array_equal(planes[0], expect[:13, :19])


def test_subsampled_chroma_comes_back_half_size():
    rng = np.random.RandomState(11)
    planes_in = [
        rng.randint(0, 256, size=(21, 33)).astype(np.uint8)
        for _ in range(3)
    ]
    data = jpeg_encode(planes_in, quality=70, subsample=True)
    planes, meta = jpeg_decode(data)
    assert meta["subsampled"]
    assert planes[0].shape == (21, 33)
    assert planes[1].shape == planes[2].shape == (11, 17)
    rgb = jpeg_to_rgb(planes, meta)
    assert rgb.shape == (21, 33, 3) and rgb.dtype == np.uint8


def test_restart_markers_roundtrip_and_appear():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(40, 40)).astype(np.uint8)
    plain = jpeg_encode([img], quality=85)
    with_rst = jpeg_encode([img], quality=85, restart_interval=3)
    assert b"\xff\xdd" in with_rst and b"\xff\xdd" not in plain
    assert any(
        bytes([0xFF, 0xD0 + m]) in with_rst for m in range(8)
    )
    a, _ = jpeg_decode(plain)
    b, _ = jpeg_decode(with_rst)
    # restart intervals change entropy framing, never pixels
    assert np.array_equal(a[0], b[0])


def test_dc_prediction_crosses_many_blocks():
    """A smooth wide ramp: DC prediction chains across 16 blocks;
    a broken predictor shifts later blocks visibly."""
    x = np.arange(128, dtype=np.float64)[None, :]
    img = np.broadcast_to(64 + x, (8, 128)).astype(np.uint8)
    planes, _ = jpeg_decode(jpeg_encode([img], quality=95))
    expect = _reference_roundtrip(img, scale_quant(QUANT_LUMA, 95))
    assert np.array_equal(planes[0], expect)


# ------------------------------------------------------- structure

def test_header_sniffer_reads_real_files():
    """jpeg_markers' dimension walk agrees with the full decoder on
    real encoder output (the two modules meet here)."""
    img = np.full((26, 44), 99, dtype=np.uint8)
    data = jpeg_encode([img, img, img], quality=60, subsample=True)
    w, h, ncomp, progressive, ok = jpeg_dimensions(data)
    assert (w, h, ncomp, progressive, ok) == (44, 26, 3, False, True)


def test_truncation_raises():
    img = np.full((16, 16), 7, dtype=np.uint8)
    data = jpeg_encode([img], quality=75)
    for cut in (2, 20, len(data) // 2, len(data) - 3):
        with pytest.raises(JpegError):
            jpeg_decode(data[:cut])


def test_non_jpeg_and_frankenstein_rejected():
    with pytest.raises(JpegError):
        jpeg_decode(b"GIF89a" + bytes(64))
    # flip SOF0 -> SOF2 on a BASELINE stream: the sequential scan
    # header (Ss=0, Se=63) is illegal for a progressive DC scan —
    # must refuse, not mis-decode
    img = np.full((8, 8), 50, dtype=np.uint8)
    data = bytearray(jpeg_encode([img], quality=75))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(JpegError, match="DC scan"):
        jpeg_decode(bytes(data))


# ------------------------------------------------------ progressive

def test_progressive_equals_baseline_pixels():
    """The headline progressive pin: same quantized coefficients
    delivered over 10 scans (spectral selection + successive
    approximation) must reconstruct bit-identical pixels to the
    single-scan baseline encoding — for gray, 4:4:4 and 4:2:0,
    partial MCUs, with and without restart markers."""
    rng = np.random.RandomState(99)
    cases = [
        (1, False, 90, 0, (24, 32)),
        (3, False, 75, 0, (21, 35)),
        (3, True, 50, 0, (37, 26)),
        (3, True, 85, 2, (48, 48)),
        (1, False, 95, 3, (13, 61)),
    ]
    for ncomp, sub, qf, ri, (h, w) in cases:
        planes = [
            rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            for _ in range(ncomp)
        ]
        base, _ = jpeg_decode(
            jpeg_encode(planes, quality=qf, subsample=sub,
                        restart_interval=ri)
        )
        prog, meta = jpeg_decode(
            jpeg_encode_progressive(planes, quality=qf,
                                    subsample=sub,
                                    restart_interval=ri)
        )
        assert meta["progressive"]
        for a, b in zip(base, prog):
            assert np.array_equal(a, b)


def test_progressive_custom_scan_script():
    """A pathological script (single-coefficient bands, deep
    successive approximation) still reconstructs exactly."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    scans = [
        ((0,), 0, 0, 0, 3),
        ((0,), 0, 0, 3, 2),
        ((0,), 0, 0, 2, 1),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 1, 0, 2),
        ((0,), 2, 63, 0, 2),
        ((0,), 1, 63, 2, 1),
        ((0,), 1, 63, 1, 0),
    ]
    base, _ = jpeg_decode(jpeg_encode([img], quality=90))
    prog, _ = jpeg_decode(
        jpeg_encode_progressive([img], quality=90, scans=scans)
    )
    assert np.array_equal(base[0], prog[0])


def test_progressive_truncated_mid_scan_raises():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = jpeg_encode_progressive([img, img, img], quality=75)
    with pytest.raises(JpegError):
        jpeg_decode(data[: int(len(data) * 0.6)])


def test_progressive_header_sniffer_sees_sof2():
    img = np.full((20, 30), 120, dtype=np.uint8)
    data = jpeg_encode_progressive([img], quality=75)
    w, h, ncomp, progressive, ok = jpeg_dimensions(data)
    assert (w, h, ncomp, progressive, ok) == (30, 20, 1, True, True)


def test_huffman_tables_are_valid_canonical():
    """Kraft inequality holds, no duplicate symbols, and the
    all-ones code of the table's max length is never assigned
    (Annex C reserved pattern)."""
    for bits, values in (HUFF_DC, HUFF_AC):
        assert sum(bits) == len(values) == len(set(values))
        assert sum(n * 2.0 ** -length
                   for length, n in enumerate(bits) if length) <= 1.0
        codes = _canonical_codes(bits, values)
        maxlen = max(length for _c, length in codes.values())
        assert all(
            code != (1 << length) - 1 or length < maxlen
            for code, length in codes.values()
        )
    assert set(DC_SYMBOLS) == set(range(12))
    assert {0x00, 0xF0} <= set(AC_SYMBOLS)


def test_zigzag_is_the_standard_order():
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[63] == 63


def test_quality_scaling_monotone():
    q50 = scale_quant(QUANT_LUMA, 50)
    q85 = scale_quant(QUANT_LUMA, 85)
    q10 = scale_quant(QUANT_LUMA, 10)
    assert np.array_equal(q50, QUANT_LUMA)
    assert np.all(q85 <= q50) and np.all(q10 >= q50)
    assert scale_quant(QUANT_LUMA, 100).min() == 1


def test_fixture_oracle_contract_spot():
    """One fixture doc against the closed form the SQL twin uses
    (the full 60-doc sweep runs in the crosscheck harness)."""
    from pdf_extractor_spark.functions.multimodal import (
        fixture_jpeg_full,
    )

    doc_id = 9  # gray=(9%5==4) -> True, quality 95? no: 50+5*(9%8)=55
    planes, meta = jpeg_decode(fixture_jpeg_full(doc_id))
    assert meta["n_components"] == 1  # doc_id % 5 == 4 -> grayscale
    q00 = int(scale_quant(QUANT_LUMA, 55)[0, 0])
    w, h = meta["width"], meta["height"]
    total = 0
    for by in range((h + 15) // 16):
        for bx in range((w + 15) // 16):
            v = (doc_id * 7 + 13 * bx + 29 * by) % 256
            qv = math.floor(8.0 * (v - 128) / q00 + 0.5)
            d = min(max(math.floor(qv * q00 / 8.0 + 0.5) + 128, 0), 255)
            total += min(16, w - 16 * bx) * min(16, h - 16 * by) * d
    assert int(planes[0].astype(np.int64).sum()) == total


# ------------------------------------------------------ mutation fuzz

def test_mutation_fuzz_never_hangs_or_crashes():
    """Random single-byte corruptions of valid streams (baseline and
    progressive): every mutant either decodes to well-formed planes
    or raises JpegError — never an unhandled exception, never a
    wrong-shaped result. Mirrors the PDF tokenizer's mutation-fuzz
    contract."""
    rng = np.random.RandomState(123)
    img = rng.randint(0, 256, size=(24, 32)).astype(np.uint8)
    for data in (
        jpeg_encode([img], quality=80, restart_interval=2),
        jpeg_encode_progressive([img], quality=80),
        jpeg_encode([img, img, img], quality=70, subsample=True),
    ):
        for _ in range(120):
            mut = bytearray(data)
            pos = rng.randint(0, len(mut))
            mut[pos] = rng.randint(0, 256)
            try:
                planes, meta = jpeg_decode(bytes(mut))
            except JpegError:
                continue
            # anything other than JpegError is a contract violation
            # (batch harvests catch exactly that one type)
            assert planes and all(
                p.dtype == np.uint8 and p.ndim == 2 for p in planes
            )
            assert 0 < meta["width"] <= 65535
            assert 0 < meta["height"] <= 65535


def test_truncation_sweep_progressive():
    img = np.arange(240, dtype=np.uint8).reshape(12, 20) % 256
    data = jpeg_encode_progressive([img], quality=85)
    ok = 0
    for cut in range(4, len(data), 7):
        try:
            jpeg_decode(data[:cut])
            ok += 1
        except JpegError:
            pass
    # a prefix never decodes "successfully" before the last scan's
    # data exists — truncation is loud, not silent
    assert ok == 0


# --------------------------------------------------------- salvage

def test_salvage_reconstructs_from_complete_scans():
    from pdf_extractor_spark.operators.jpeg_codec import (
        jpeg_decode_salvage,
    )

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, size=(32, 48)).astype(np.uint8)
    data = jpeg_encode_progressive([img], quality=80)
    offs = []
    i = 0
    while True:
        i = data.find(b"\xff\xda", i + 1)
        if i < 0:
            break
        offs.append(i)
    full, mfull = jpeg_decode(data)
    assert mfull["n_scans"] == len(offs) == 6
    prev_err = None
    for k in range(1, 6):
        planes, meta = jpeg_decode_salvage(data[:offs[k]])
        assert meta["salvaged"] and meta["n_scans"] == k
        err = np.abs(
            planes[0].astype(np.int32) - full[0].astype(np.int32)
        ).mean()
        # each extra scan refines toward the full image
        if prev_err is not None:
            assert err <= prev_err + 1e-9, (k, err, prev_err)
        prev_err = err
    assert prev_err < 16  # 5 of 6 scans: already close
    # full stream through salvage == plain decode, not salvaged
    ps, ms = jpeg_decode_salvage(data)
    assert not ms["salvaged"] and np.array_equal(ps[0], full[0])


def test_salvage_rolls_back_partial_scan_and_raises_pre_scan():
    from pdf_extractor_spark.operators.jpeg_codec import (
        jpeg_decode_salvage,
    )

    img = np.arange(768, dtype=np.uint8).reshape(16, 48) % 256
    data = jpeg_encode_progressive([img], quality=75)
    first_sos = data.find(b"\xff\xda")
    second_sos = data.find(b"\xff\xda", first_sos + 1)
    # mid-second-scan cut: exactly one complete scan survives
    _p, meta = jpeg_decode_salvage(data[:second_sos + 40])
    assert meta["n_scans"] == 1 and meta["salvaged"]
    # cut before any complete scan: nothing to show -> raise
    with pytest.raises(JpegError):
        jpeg_decode_salvage(data[:first_sos + 6])
