"""PDF generator ↔ tokenizer roundtrip tests (SURVEY.md §7.2 stage 2)."""

from __future__ import annotations

from pdf_extractor_spark.operators.pdf_generator import (
    PageSpec,
    build_pdf,
)
from pdf_extractor_spark.operators.pdf_tokenizer import parse_pdf


def test_roundtrip_word_boxes():
    p = PageSpec()
    p.put_words(72, 100, 12, ["Alpha", "Beta"])
    doc = parse_pdf(build_pdf([p]))
    assert not doc.errors
    assert len(doc.pages) == 1
    w = doc.pages[0].words
    assert w["text"].tolist() == ["Alpha", "Beta"]
    # known-by-construction geometry: Alpha = 5 ASCII chars * 6pt
    assert w.iloc[0]["x0"] == 72.0 and w.iloc[0]["x1"] == 102.0
    assert w.iloc[0]["top"] == 100.0  # put() places the top edge
    assert w.iloc[0]["bottom"] == 112.0


def test_roundtrip_cjk_hex_strings():
    p = PageSpec()
    p.put(72, 100, 12, "日本語テキスト")
    doc = parse_pdf(build_pdf([p]))
    w = doc.pages[0].words
    assert w["text"].tolist() == ["日本語テキスト"]
    assert w.iloc[0]["x1"] - w.iloc[0]["x0"] == 7 * 12.0  # wide glyphs


def test_space_splitting_inside_one_tj():
    p = PageSpec()
    p.put(72, 100, 12, "one two")
    doc = parse_pdf(build_pdf([p]))
    w = doc.pages[0].words
    assert w["text"].tolist() == ["one", "two"]
    # "one" 3 chars -> x1=90; space 6pt; "two" starts at 96
    assert w.iloc[1]["x0"] == 96.0


def test_escaped_parentheses_literal():
    p = PageSpec()
    p.put(72, 100, 12, "f(x)=y")
    doc = parse_pdf(build_pdf([p]))
    assert doc.pages[0].words["text"].tolist() == ["f(x)=y"]


def test_multi_page_and_rotation():
    p1, p2 = PageSpec(), PageSpec(rotate=90)
    p1.put(72, 100, 12, "one")
    p2.put(72, 100, 12, "two")
    doc = parse_pdf(build_pdf([p1, p2]))
    assert [pg.page_number for pg in doc.pages] == [1, 2]
    assert doc.pages[1].rotation == 90
    assert any(e["type"] == "rotation" for e in doc.errors)


def test_empty_page_yields_empty_frame():
    doc = parse_pdf(build_pdf([PageSpec()]))
    assert len(doc.pages) == 1
    assert len(doc.pages[0].words) == 0


def test_broken_xref_falls_back_to_scan():
    data = build_pdf([_page_with("recovered")])
    # corrupt the startxref pointer
    broken = data.replace(b"startxref", b"startxrEF")
    doc = parse_pdf(broken)
    assert doc.pages and doc.pages[0].words["text"].tolist() == ["recovered"]
    assert any(e["type"] == "malformed" for e in doc.errors)


def test_total_garbage_never_raises():
    doc = parse_pdf(b"%PDF-1.4 garbage" + bytes(range(256)))
    assert doc.pages == [] or doc.pages is not None
    assert any(e["severity"] in ("critical", "warning") for e in doc.errors)


def _page_with(text: str) -> PageSpec:
    p = PageSpec()
    p.put(72, 100, 12, text)
    return p


def test_flate_compressed_stream_identical():
    """FlateDecode path: a compressed PDF must tokenize to the exact
    same word frames as its uncompressed twin (and the fixture corpus
    goldens must hold through compression end-to-end)."""
    from pdf_extractor_spark.operators.document import extract_document

    pages = []
    for i in range(3):
        p = PageSpec()
        p.put(72, 72, 12, f"compressed stream roundtrip {i} 日本語も含む")
        p.put(72, 100, 10, "second line here with more words")
        p.put(300, 300, 12, "1.2 Section heading kept always")
        pages.append(p)
    plain_bytes = build_pdf(pages)
    flate_bytes = build_pdf(pages, compress=True)
    assert b"/FlateDecode" in flate_bytes

    plain = parse_pdf(plain_bytes)
    flate = parse_pdf(flate_bytes)
    assert not flate.errors
    for a, b in zip(plain.pages, flate.pages):
        assert a.words.equals(b.words)

    # end-to-end through the full kernel (filters/layout/spacing/etc.)
    ra = extract_document(plain_bytes)
    rb = extract_document(flate_bytes)
    assert ra["extracted_text"] == rb["extracted_text"] != ""
    assert ra["spans"] == rb["spans"]


def test_unknown_filter_recorded_not_raised():
    p = PageSpec()
    p.put(72, 72, 12, "some words here")
    pdf = build_pdf([p], compress=True)
    # same-length name: xref offsets stay valid, so the failure path
    # exercised is the filter check itself, not xref recovery
    bad = pdf.replace(b"/FlateDecode", b"/LZWWDecodee", 1)
    assert len(bad) == len(pdf)
    doc = parse_pdf(bad)
    assert any(e["type"] == "corruption" for e in doc.errors)


def test_indirect_length_ref_not_misparsed():
    """'/Length 27 0 R' (indirect ref) must fall back to the
    endstream heuristic, not slice 2 bytes via a backtracked match."""
    from pdf_extractor_spark.operators.pdf_tokenizer import _stream_bytes

    body = (b"<< /Length 27 0 R >>\nstream\n"
            b"BT (hello world) Tj ET xx\nendstream")
    assert _stream_bytes(body) == b"BT (hello world) Tj ET xx"


def test_filter_chain_not_raw_inflated():
    """'/Filter [/ASCII85Decode /FlateDecode]' is a chain — must raise
    (caller records corruption), never raw-inflate the outer encoding."""
    import pytest as _pytest

    from pdf_extractor_spark.operators.pdf_tokenizer import _stream_bytes

    body = (b"<< /Length 5 /Filter [/ASCII85Decode /FlateDecode] >>\n"
            b"stream\nabcde\nendstream")
    with _pytest.raises(ValueError):
        _stream_bytes(body)
    # one-element array IS sole-Flate: must inflate
    import zlib

    data = zlib.compress(b"BT ET", 9)
    body2 = (b"<< /Length " + str(len(data)).encode()
             + b" /Filter [ /FlateDecode ] >>\nstream\n" + data
             + b"\nendstream")
    assert _stream_bytes(body2) == b"BT ET"
