"""Uniform corruption-containment property across every media
codec: random byte corruption of a valid payload must either still
decode or raise that codec's typed error (a ValueError subclass) —
never IndexError / struct.error / zlib.error / KeyError.  This is
what lets the Arrow decode stages catch per-document failures with
one except clause instead of crashing the task."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pdf_extractor_spark.functions import multimodal as mm
from pdf_extractor_spark.operators.apng_codec import apng_decode
from pdf_extractor_spark.operators.avi_codec import avi_decode_mjpeg
from pdf_extractor_spark.operators.bmp_codec import bmp_decode
from pdf_extractor_spark.operators.gif_codec import gif_decode
from pdf_extractor_spark.operators.ico_codec import ico_decode
from pdf_extractor_spark.operators.jpeg_codec import jpeg_decode
from pdf_extractor_spark.operators.tiff_codec import tiff_decode
from pdf_extractor_spark.operators.wav_codec import wav_decode
from pdf_extractor_spark.operators.y4m_codec import y4m_decode


def _video(b: bytes):
    return avi_decode_mjpeg(b) if b[:4] == b"RIFF" else y4m_decode(b)


CASES = [
    ("gif", mm.fixture_gif, gif_decode),
    ("tiff", mm.fixture_tiff, tiff_decode),
    ("bmp", mm.fixture_bmp, bmp_decode),
    ("ico", mm.fixture_ico, ico_decode),
    ("apng", mm.fixture_apng, apng_decode),
    ("jpeg", mm.fixture_jpeg_full, jpeg_decode),
    ("video", mm.fixture_video, _video),
    ("g711wav", mm.fixture_g711_wav, wav_decode),
]


@pytest.mark.parametrize(
    "name,fix,dec", CASES, ids=[c[0] for c in CASES]
)
def test_corruption_stays_inside_typed_errors(name, fix, dec):
    # str hash() is salted per process — crc32 keeps the
    # corruption schedule identical across pytest runs
    rng = np.random.RandomState(zlib.crc32(name.encode()))
    for d in range(0, 24, 3):
        base = bytearray(fix(d))
        for _ in range(25):
            mut = bytearray(base)
            for _ in range(rng.randint(1, 12)):
                mut[rng.randint(len(mut))] = rng.randint(256)
            try:
                dec(bytes(mut))
            except ValueError:
                pass  # the codec's typed error — the contract
