"""Deterministic minimal-grammar PDF writer for fixtures.

Emits well-formed, UNCOMPRESSED PDFs (real xref table + trailer,
page-tree objects, per-page content streams using only
``BT/ET, Tf, Td, Tj`` operators). ASCII text is written as literal
``( )`` strings; CJK text as UTF-16BE hex ``< >`` strings under a
second font resource — mirroring the WinAnsi / Identity-H split the
reference consumes through pdfplumber (``extractor.py:101``,
``extractor.py:164-169`` in ``/root/reference/pdf_extractor_new/``).

Because this generator and the tokenizer
(:mod:`pdf_extractor_spark.operators.pdf_tokenizer`) share the glyph
width model in :mod:`.charclass`, word boxes — and therefore golden
extraction outputs — are known by construction (SURVEY.md §7.0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .charclass import text_advance

LETTER_W = 612.0
LETTER_H = 792.0


@dataclass
class TextOp:
    """One text-showing operation: place ``text`` at baseline (x, y)
    in PDF coordinates (origin bottom-left) at ``size`` pt."""

    x: float
    y: float
    size: float
    text: str


@dataclass
class PageSpec:
    width: float = LETTER_W
    height: float = LETTER_H
    rotate: int = 0
    ops: list[TextOp] = field(default_factory=list)

    # -- convenience builders (used by fixtures) --------------------
    def put(self, x: float, y_top: float, size: float, text: str) -> None:
        """Place ``text`` with its TOP edge at ``y_top`` from the page
        top (reader coordinates) — converts to PDF baseline y."""
        baseline = self.height - y_top - 0.8 * size
        self.ops.append(TextOp(x=x, y=baseline, size=size, text=text))

    def put_words(
        self,
        x: float,
        y_top: float,
        size: float,
        words: list[str],
        gap: float = 6.0,
    ) -> float:
        """Place ``words`` left-to-right starting at ``x`` with a fixed
        inter-word ``gap`` (pt). Returns the x just past the last word."""
        cx = x
        for w in words:
            self.put(cx, y_top, size, w)
            cx += text_advance(w, size) + gap
        return cx


def _is_ascii(text: str) -> bool:
    return all(ord(c) < 128 for c in text)


def _escape_literal(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(page: PageSpec) -> bytes:
    parts: list[str] = []
    for op in page.ops:
        if _is_ascii(op.text):
            font, shown = "/F1", f"({_escape_literal(op.text)})"
        else:
            hexs = op.text.encode("utf-16-be").hex().upper()
            font, shown = "/F2", f"<{hexs}>"
        parts.append(
            f"BT {font} {op.size:g} Tf {op.x:g} {op.y:g} Td {shown} Tj ET"
        )
    return ("\n".join(parts)).encode("latin-1", errors="strict")


def build_pdf(
    pages: list[PageSpec], compress: bool = False,
    xref_stream: bool = False,
) -> bytes:
    """Serialize pages into a complete PDF byte string.

    ``compress=True`` Flate-encodes each content stream (zlib level 9,
    deterministic) the way real-world PDFs ship — exercises the
    tokenizer's ``/Filter /FlateDecode`` path.

    ``xref_stream=True`` emits the PDF 1.5+ layout modern producers
    write: dictionary objects packed into a Flate ``/ObjStm`` and a
    binary ``/Type /XRef`` cross-reference stream (W [1 4 2], Flate +
    PNG Up predictor) instead of the classic xref table — exercises
    the tokenizer's §7.5.7/§7.5.8 paths end to end."""
    if xref_stream:
        return _build_pdf_xref_stream(pages, compress)
    # object numbering: 1=catalog, 2=pages, 3=/F1, 4=/F2,
    # then per page: page object, content object.
    objs: dict[int, bytes] = {}
    n_fixed = 4
    page_ids = []
    next_id = n_fixed + 1
    for p in pages:
        page_id, content_id = next_id, next_id + 1
        next_id += 2
        page_ids.append(page_id)
        stream = _content_stream(p)
        filt = ""
        if compress:
            import zlib

            stream = zlib.compress(stream, 9)
            filt = " /Filter /FlateDecode"
        rotate = f" /Rotate {p.rotate}" if p.rotate else ""
        objs[page_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {p.width:g} "
            f"{p.height:g}]{rotate} /Contents {content_id} 0 R "
            f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> >>"
        ).encode("latin-1")
        objs[content_id] = (
            f"<< /Length {len(stream)}{filt} >>\nstream\n".encode("latin-1")
            + stream
            + b"\nendstream"
        )

    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>"
    ).encode("latin-1")
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    objs[4] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCJK "
        b"/Encoding /Identity-H >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode("latin-1")
        out += objs[oid]
        out += b"\nendobj\n"

    xref_pos = len(out)
    n_objs = max(objs) + 1
    out += f"xref\n0 {n_objs}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for oid in range(1, n_objs):
        out += f"{offsets[oid]:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


def _png_up_encode(rows: list[bytes]) -> bytes:
    """PNG Up-predictor (filter type 2) encoding of fixed-width rows."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def _build_pdf_xref_stream(pages: list[PageSpec], compress: bool) -> bytes:
    """PDF 1.5 layout: dict objects in an /ObjStm, binary /XRef stream.

    Object numbering: 1=catalog, 2=pages, 3=/F1, 4=/F2, then per page
    (page obj, content obj); content streams stay standalone (streams
    cannot live in an ObjStm); ObjStm and XRef stream take the last
    two ids."""
    import zlib

    packed: dict[int, bytes] = {}   # members of the ObjStm
    direct: dict[int, bytes] = {}   # standalone stream objects
    page_ids = []
    next_id = 5
    for p in pages:
        page_id, content_id = next_id, next_id + 1
        next_id += 2
        page_ids.append(page_id)
        stream = _content_stream(p)
        filt = ""
        if compress:
            stream = zlib.compress(stream, 9)
            filt = " /Filter /FlateDecode"
        rotate = f" /Rotate {p.rotate}" if p.rotate else ""
        packed[page_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {p.width:g} "
            f"{p.height:g}]{rotate} /Contents {content_id} 0 R "
            f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> >>"
        ).encode("latin-1")
        direct[content_id] = (
            f"<< /Length {len(stream)}{filt} >>\nstream\n".encode("latin-1")
            + stream
            + b"\nendstream"
        )
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    packed[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    packed[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>"
    ).encode("latin-1")
    packed[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    packed[4] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCJK "
        b"/Encoding /Identity-H >>"
    )

    objstm_id = next_id
    xref_id = next_id + 1
    # ObjStm payload: "(id off)*" header then concatenated bodies
    member_ids = sorted(packed)
    offs, bodyparts, cursor = [], [], 0
    for oid in member_ids:
        offs.append((oid, cursor))
        bodyparts.append(packed[oid])
        cursor += len(packed[oid]) + 1  # "\n" separator
    header = " ".join(f"{oid} {off}" for oid, off in offs) + "\n"
    payload = header.encode("latin-1") + b"\n".join(bodyparts) + b"\n"
    first = len(header)
    zpayload = zlib.compress(payload, 9)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for oid in sorted(direct):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode("latin-1") + direct[oid] + b"\nendobj\n"
    offsets[objstm_id] = len(out)
    out += (
        f"{objstm_id} 0 obj\n<< /Type /ObjStm /N {len(member_ids)} "
        f"/First {first} /Filter /FlateDecode /Length {len(zpayload)} "
        f">>\nstream\n".encode("latin-1")
        + zpayload
        + b"\nendstream\nendobj\n"
    )

    # xref stream: W [1 4 2], entries 0..size-1, PNG Up predictor
    xref_pos = len(out)
    offsets[xref_id] = xref_pos
    size = xref_id + 1
    rows: list[bytes] = []
    objstm_index = {oid: i for i, (oid, _off) in enumerate(offs)}
    for oid in range(size):
        if oid == 0:
            rows.append(b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big"))
        elif oid in offsets:
            rows.append(b"\x01" + offsets[oid].to_bytes(4, "big") + (0).to_bytes(2, "big"))
        elif oid in objstm_index:
            rows.append(
                b"\x02" + objstm_id.to_bytes(4, "big")
                + objstm_index[oid].to_bytes(2, "big")
            )
        else:
            rows.append(b"\x00" + (0).to_bytes(4, "big") + (0).to_bytes(2, "big"))
    xdata = zlib.compress(_png_up_encode(rows), 9)
    out += (
        f"{xref_id} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Index [0 {size}] /Root 1 0 R /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 7 >> "
        f"/Length {len(xdata)} >>\nstream\n".encode("latin-1")
        + xdata
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode("latin-1")
    return bytes(out)
