"""Adversarial structural probes for the PDF parser: inputs crafted
to hang or crash a naive implementation (xref /Prev cycles, nesting
bombs, lying /Length). The contract is bounded time and graceful
degradation — parse_pdf must return, never spin or raise out."""

from __future__ import annotations

import time

from pdf_extractor_spark.operators.pdf_tokenizer import parse_pdf


def _minimal_pdf(length_field: bytes = b"/Length 44") -> tuple[bytes, bytes, bytes]:
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + length_field + b" >> stream\n"
        b"BT /F1 12 Tf 72 720 Td (Hello cycle) Tj ET\n"
        b"endstream endobj\n"
    )
    xref_pos = len(body)
    xref = b"xref\n0 5\n0000000000 65535 f \n" + b"".join(
        b"%010d 00000 n \n" % body.index(b"%d 0 obj" % i)
        for i in range(1, 5)
    )
    return body, xref, b"%d" % xref_pos


def _assert_bounded(data: bytes, budget_s: float = 10.0):
    t = time.time()
    result = parse_pdf(data)
    assert time.time() - t < budget_s
    return result


class TestXrefCycles:
    def test_prev_self_cycle_terminates(self):
        # trailer /Prev pointing at its OWN section: the seen-set
        # guard must break the loop, and the document still extracts
        body, xref, off = _minimal_pdf()
        trailer = (
            b"trailer << /Size 5 /Root 1 0 R /Prev " + off
            + b" >>\nstartxref\n" + off + b"\n%%EOF"
        )
        doc = _assert_bounded(body + xref + trailer)
        assert "Hello" in " ".join(doc.pages[0].words.text)

    def test_two_section_prev_cycle_terminates(self):
        # A -> B -> A cycle across two identical sections
        body, xref, off_a = _minimal_pdf()
        sec_a = body + xref
        # section B: a second copy of the xref placed right after A,
        # whose trailer /Prev points back at A — A's /Prev (absent
        # here) plus startxref at B gives the B -> A walk; a parser
        # without the seen-set would bounce A <-> B forever when A's
        # offset reappears
        sec_b_start = len(sec_a)
        trailer_b = (
            b"trailer << /Size 5 /Root 1 0 R /Prev " + off_a
            + b" >>\nstartxref\n%d\n%%%%EOF" % sec_b_start
        )
        doc = _assert_bounded(sec_a + xref + trailer_b)
        assert "Hello" in " ".join(doc.pages[0].words.text)


class TestBombs:
    def test_deeply_nested_arrays_bounded(self):
        deep = (
            b"%PDF-1.4\n1 0 obj "
            + b"[" * 20000 + b"]" * 20000
            + b" endobj\nstartxref\n0\n%%EOF"
        )
        _assert_bounded(deep)

    def test_huge_length_field_bounded(self):
        body, xref, off = _minimal_pdf(b"/Length 999999999")
        trailer = (
            b"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n"
            + off + b"\n%%EOF"
        )
        _assert_bounded(body + xref + trailer)

    def test_indirect_length_resolved_by_endstream_scan(self):
        body, xref, off = _minimal_pdf(b"/Length 9 0 R")
        trailer = (
            b"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n"
            + off + b"\n%%EOF"
        )
        doc = _assert_bounded(body + xref + trailer)
        assert "Hello" in " ".join(doc.pages[0].words.text)

    def test_empty_and_header_only(self):
        _assert_bounded(b"")
        _assert_bounded(b"%PDF-1.7\n")


class TestPageTreeCycles:
    def test_kids_cycle_keeps_sibling_pages(self):
        # the Pages node lists itself as a kid next to a real page:
        # the cycle must be skipped with a warning while the sibling
        # page still extracts (a RecursionError-to-backstop path
        # would destroy the whole document)
        body = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R 2 0 R] /Count 2 "
            b">> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R "
            b"/MediaBox [0 0 612 792] /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Length 46 >> stream\n"
            b"BT /F1 12 Tf 72 720 Td (tree cycle ok) Tj ET\n"
            b"endstream endobj\n"
        )
        xref_pos = len(body)
        xref = b"xref\n0 5\n0000000000 65535 f \n" + b"".join(
            b"%010d 00000 n \n" % body.index(b"%d 0 obj" % i)
            for i in range(1, 5)
        )
        tr = (
            b"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % xref_pos
        )
        doc = _assert_bounded(body + xref + tr)
        assert len(doc.pages) == 1
        assert "cycle" in " ".join(doc.pages[0].words.text)
        assert any(
            "cycle" in e["message"] for e in doc.errors
        )
