"""Embedded-image harvest: tokenizer x jpeg_codec integration."""

from __future__ import annotations

import numpy as np

from pdf_extractor_spark.functions.pdfimages import (
    _fixture_image,
    wrap_pdf_images,
)
from pdf_extractor_spark.operators.jpeg_codec import jpeg_decode
from pdf_extractor_spark.operators.pdf_generator import (
    PageSpec,
    build_pdf,
)
from pdf_extractor_spark.operators.pdf_tokenizer import parse_pdf
from pdf_extractor_spark.operators.jpeg_codec import jpeg_encode


def _one_jpeg(v: int = 99, w: int = 24, h: int = 16) -> bytes:
    return jpeg_encode(
        [np.full((h, w), v, dtype=np.uint8)], quality=75
    )


def test_harvest_dimensions_and_draw_counts():
    page = PageSpec()
    page.put_words(72, 100, 12, ["text", "survives"])
    data = build_pdf(
        [page],
        images=[
            ("Im0", 24, 16, True, _one_jpeg(), 3),
            ("Im1", 24, 16, True, _one_jpeg(50), 1),
        ],
    )
    doc = parse_pdf(data)
    by_name = {im[1]: im for im in doc.images}
    assert set(by_name) == {"Im0", "Im1"}
    assert by_name["Im0"][7] == 3 and by_name["Im1"][7] == 1
    for im in doc.images:
        assert im[6] == "DCTDecode"
        planes, meta = jpeg_decode(bytes(im[8]))
        assert (meta["width"], meta["height"]) == (24, 16)
    # and the text still extracted
    assert list(doc.pages[0].words["text"]) == ["text", "survives"]


def test_encrypted_image_stream_decrypts_before_decode():
    """Per-object encryption wraps the DCT stream (§7.6.2): the
    harvested payload must be plaintext JPEG again."""
    for enc in ("rc4-128", "aes-128"):
        page = PageSpec()
        page.put_words(72, 100, 12, ["secret"])
        data = build_pdf(
            [page], encrypt=enc,
            images=[("Im0", 24, 16, True, _one_jpeg(), 1)],
        )
        # ciphertext on disk: the JPEG SOI must NOT appear raw
        # inside the image object region for AES (IV prefix); for
        # RC4 the keystream differs per object id — just check the
        # harvest roundtrips
        doc = parse_pdf(data)
        assert len(doc.images) == 1
        planes, meta = jpeg_decode(bytes(doc.images[0][8]))
        assert (meta["width"], meta["height"]) == (24, 16)
        assert int(planes[0][0, 0]) in range(95, 104)


def test_draw_count_scans_decoded_content_stream():
    """Flate-compressed content: the /Im0 Do occurrences are only
    visible AFTER the content stream inflates."""
    page = PageSpec()
    page.put_words(72, 100, 12, ["compressed"])
    data = build_pdf(
        [page], compress=True,
        images=[("Im0", 24, 16, True, _one_jpeg(), 2)],
    )
    assert b"/Im0 Do" not in data  # really compressed away
    doc = parse_pdf(data)
    assert doc.images[0][7] == 2


def test_damaged_image_never_costs_text():
    """Garbage bytes under /DCTDecode: the harvest surfaces the
    entry (decode fails later, harmlessly); text is untouched."""
    page = PageSpec()
    page.put_words(72, 100, 12, ["alive"])
    data = build_pdf(
        [page],
        images=[("Im0", 24, 16, True, b"\x00garbage" * 9, 1)],
    )
    doc = parse_pdf(data)
    assert list(doc.pages[0].words["text"]) == ["alive"]
    assert len(doc.images) == 1
    try:
        jpeg_decode(bytes(doc.images[0][8]))
        raise AssertionError("garbage decoded")
    except Exception:
        pass


def test_fixture_schedule_spot():
    """doc 7: n_images = 2; image 1 is gray ((7+1)%4 == 0? no:
    8%4==0 -> not gray; (7+0)%4=3 not gray either) — check the
    schedule constants against _fixture_image directly."""
    name, w, h, gray, payload, n_draws = _fixture_image(7, 0)
    assert name == "Im0"
    assert w == 16 + 8 * ((7 + 0) % 3) and h == 16 + 8 * ((7 + 0) % 2)
    planes, meta = jpeg_decode(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["progressive"] == ((7 + 0) % 5 == 2)
    doc = parse_pdf(wrap_pdf_images("alpha beta", 7))
    assert len(doc.images) == 1 + 7 % 3


def test_progressive_subset_rides_inside_pdfs():
    """(doc_id + j) % 5 == 2 images are SOF2: find one and confirm
    the decoder reports it progressive after the PDF roundtrip."""
    doc = parse_pdf(wrap_pdf_images("w", 2))  # j=0 -> (2+0)%5 == 2
    planes, meta = jpeg_decode(bytes(doc.images[0][8]))
    assert meta["progressive"]
