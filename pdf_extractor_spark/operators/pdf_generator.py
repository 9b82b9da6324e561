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

import re
from dataclasses import dataclass, field

from .charclass import text_advance

LETTER_W = 612.0
LETTER_H = 792.0


@dataclass
class TextOp:
    """One text-showing operation: place ``text`` at baseline (x, y)
    in PDF coordinates (origin bottom-left) at ``size`` pt.

    ``font`` forces a specific resource name (e.g. the ToUnicode
    fixture fonts F3/F4); ``text`` then carries RAW CODE bytes as a
    latin-1 string, shown as a literal (1-byte codes) or hex string
    (``hex_show``, 2-byte CID codes)."""

    x: float
    y: float
    size: float
    text: str
    font: str | None = None
    hex_show: bool = False
    # verbatim shown-string token (latin-1 str incl. the delimiters),
    # bypassing this writer's escaping — for fixtures exercising
    # string syntax the canonical writer never emits (nested balanced
    # parens, \<EOL> continuations, raw EOL bytes; ISO 32000 §7.3.4.2)
    raw_shown: str | None = None
    # marked-content wrapping (ISO 32000 §14.6/§14.8.2.2): an artifact
    # subtype ("Pagination", "Layout", …) wraps the block in
    # /Artifact <</Type /X>> BDC … EMC; "" uses the bare BMC form;
    # a non-artifact structure tag ("P", "Span") wraps in /P BDC …
    # EMC — content that a reader MUST keep
    artifact: str | None = None
    mc_tag: str | None = None
    # /ActualText replacement (§14.9.4): wraps the block in
    # /Span <</ActualText (…)>> BDC … EMC — the shown string is what
    # a renderer paints, actual_text is what the text really is
    actual_text: str | None = None
    # text rendering mode (§9.3.6): 3 = invisible — the OCR-text-
    # layer convention of scanned PDFs. Tr is TEXT STATE, which
    # persists across BT/ET (§9.3.1), so once any op on a page sets
    # a mode the writer emits an explicit "<n> Tr" in every block
    # (defaulting unset ops to 0) — no mode leaks between blocks.
    render_mode: int | None = None
    # optional-content layer NAME (§8.11): wraps the block in
    # /OC /<resource> BDC … EMC; the layer's default visibility comes
    # from build_pdf(ocg_layers={name: visible})
    oc: str | None = None


@dataclass
class PageSpec:
    width: float = LETTER_W
    height: float = LETTER_H
    rotate: int = 0
    ops: list[TextOp] = field(default_factory=list)
    # emit an inline image (BI..ID <binary> EI, ISO 32000 §8.9.7)
    # whose payload contains token-lookalike bytes — the tokenizer
    # must skip it, not hallucinate words from it
    inline_image: bool = False
    # link annotations: (rect, uri, form) where form selects the
    # layout — "inline" (/A << /S /URI … >> in the annot dict),
    # "indirect" (/A as its own object), "hex" (URI as a hex string),
    # "goto" (internal /GoTo action: a Link with NO URI — trap),
    # "square" (/Subtype /Square: not a Link at all — trap)
    links: list[tuple[tuple[float, float, float, float], str, str]] = \
        field(default_factory=list)
    # markup annotations (ISO 32000 §12.5.6): (subtype, contents,
    # author) — subtype "Popup" writes a popup whose /Contents mirrors
    # text (harvest must skip it); contents=None writes a
    # geometry-only markup with NO /Contents (also skipped)
    annots: list[tuple[str, str | None, str | None]] = \
        field(default_factory=list)

    def put_annot(self, subtype: str, contents: str | None,
                  author: str | None = None) -> None:
        self.annots.append((subtype, contents, author))

    def put_link(
        self, uri: str, form: str = "inline",
        rect: tuple[float, float, float, float] = (72, 72, 200, 90),
    ) -> None:
        self.links.append((rect, uri, form))

    # -- convenience builders (used by fixtures) --------------------
    def put(self, x: float, y_top: float, size: float, text: str,
            artifact: str | None = None,
            mc_tag: str | None = None,
            actual_text: str | None = None,
            oc: str | None = None,
            render_mode: int | None = None) -> None:
        """Place ``text`` with its TOP edge at ``y_top`` from the page
        top (reader coordinates) — converts to PDF baseline y.
        ``artifact``/``mc_tag``/``actual_text``/``oc`` wrap the block
        in marked content; ``render_mode=3`` shows it invisibly
        (see ``TextOp``)."""
        baseline = self.height - y_top - 0.8 * size
        self.ops.append(TextOp(x=x, y=baseline, size=size, text=text,
                               artifact=artifact, mc_tag=mc_tag,
                               actual_text=actual_text, oc=oc,
                               render_mode=render_mode))

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

    def put_codes(
        self, x: float, y_top: float, size: float, codes: bytes,
        font: str = "F3", hex_show: bool = False,
    ) -> None:
        """Place raw font CODE bytes under a named font resource (the
        ToUnicode fixture fonts) — what the codes render as is decided
        by the font's CMap, not by this writer."""
        baseline = self.height - y_top - 0.8 * size
        self.ops.append(
            TextOp(
                x=x, y=baseline, size=size,
                text=codes.decode("latin-1"), font=font,
                hex_show=hex_show,
            )
        )

    def put_raw_shown(
        self, x: float, y_top: float, size: float, shown: str
    ) -> None:
        """Place a VERBATIM shown-string token (including delimiters)
        under /F1 — see ``TextOp.raw_shown``."""
        baseline = self.height - y_top - 0.8 * size
        self.ops.append(
            TextOp(x=x, y=baseline, size=size, text="", raw_shown=shown)
        )


def _is_ascii(text: str) -> bool:
    return all(ord(c) < 128 for c in text)


def _escape_literal(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_literal(raw: bytes) -> str:
    """Bytes → PDF literal-string syntax ``(...)`` with octal escapes
    for non-printables (ISO 32000 §7.3.4.2)."""
    out = []
    for c in raw:
        if c in (0x28, 0x29, 0x5C):
            out.append("\\" + chr(c))
        elif 32 <= c < 127:
            out.append(chr(c))
        else:
            out.append(f"\\{c:03o}")
    return "(" + "".join(out) + ")"


def _text_string_bytes(value: str) -> bytes:
    """Raw *text string* bytes (§7.9.2.2): PDFDocEncoding≈Latin-1
    when ASCII, else BOM'd UTF-16BE — the plaintext a string
    encryptor consumes."""
    if _is_ascii(value):
        return value.encode("ascii")
    return b"\xfe\xff" + value.encode("utf-16-be")


def _pdf_text_string(value: str) -> str:
    """String → PDF *text string* syntax (ISO 32000 §7.9.2.2): ASCII
    values as literal strings, anything wider as a UTF-16BE hex
    string with BOM — the two spellings real writers emit for /Info
    values and outline titles."""
    if _is_ascii(value):
        return _pdf_literal(value.encode("ascii"))
    return "<" + _text_string_bytes(value).hex().upper() + ">"


# 16 bytes of 4×4 gray samples that LOOK like text-show tokens —
# the adversarial payload an inline-image skip must not trip on
_INLINE_IMG_BLOB = b"(fake) Tj 72 0\xff\x00"


def _content_stream(
    page: PageSpec, oc_res: dict[str, str] | None = None
) -> bytes:
    parts: list[str] = []
    any_tr = any(op.render_mode is not None for op in page.ops)
    if page.inline_image:
        parts.append(
            "BI /W 4 /H 4 /CS /G /BPC 8 ID "
            + _INLINE_IMG_BLOB.decode("latin-1")
            + " EI"
        )
    for op in page.ops:
        if op.raw_shown is not None:
            font, shown = "/F1", op.raw_shown
        elif op.font is not None:
            font = "/" + op.font
            if op.hex_show:
                shown = "<{}>".format(
                    op.text.encode("latin-1").hex().upper()
                )
            else:
                shown = f"({_escape_literal(op.text)})"
        elif _is_ascii(op.text):
            font, shown = "/F1", f"({_escape_literal(op.text)})"
        else:
            hexs = op.text.encode("utf-16-be").hex().upper()
            font, shown = "/F2", f"<{hexs}>"
        tr = f" {op.render_mode or 0} Tr" if any_tr else ""
        block = (
            f"BT {font} {op.size:g} Tf{tr} "
            f"{op.x:g} {op.y:g} Td {shown} Tj ET"
        )
        if op.artifact is not None:
            if op.artifact:
                block = (
                    f"/Artifact <</Type /{op.artifact}>> BDC {block} EMC"
                )
            else:
                block = f"/Artifact BMC {block} EMC"
        elif op.actual_text is not None:
            block = (
                f"/Span <</ActualText "
                f"{_pdf_text_string(op.actual_text)}>> BDC {block} EMC"
            )
        elif op.mc_tag is not None:
            block = f"/{op.mc_tag} <</MCID 0>> BDC {block} EMC"
        elif op.oc is not None:
            # the NAMED-resource property-list form (§14.6: a BDC
            # property operand may be a name in /Resources
            # /Properties) — the layout Acrobat emits for layers
            block = f"/OC /{(oc_res or {})[op.oc]} BDC {block} EMC"
        parts.append(block)
    return ("\n".join(parts)).encode("latin-1", errors="strict")


def _cmap_stream(
    chars: dict[int, str] | None,
    ranges: list[tuple[int, int, str]] | None,
    two_byte: bool,
) -> bytes:
    """Serialize a /ToUnicode CMap (Adobe CMap syntax, ISO 32000
    §9.10.3): bfchar entries from ``chars``, scalar-form bfrange
    entries from ``ranges`` (lo, hi, start-string)."""
    cw = 4 if two_byte else 2
    space = "<0000> <FFFF>" if two_byte else "<00> <FF>"
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /FixtureToUnicode def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        space,
        "endcodespacerange",
    ]
    if chars:
        lines.append(f"{len(chars)} beginbfchar")
        for code in sorted(chars):
            dst = chars[code].encode("utf-16-be").hex().upper()
            lines.append(f"<{code:0{cw}X}> <{dst}>")
        lines.append("endbfchar")
    if ranges:
        lines.append(f"{len(ranges)} beginbfrange")
        for lo, hi, start in ranges:
            dst = start.encode("utf-16-be").hex().upper()
            lines.append(f"<{lo:0{cw}X}> <{hi:0{cw}X}> <{dst}>")
        lines.append("endbfrange")
    lines += ["endcmap", "CMap defined", "end", "end"]
    return "\n".join(lines).encode("latin-1")


# deterministic fixture file identifier (any value works — the id is
# just salt in the key derivation; fixed for byte-stable fixtures)
_FIXTURE_ID = bytes.fromhex("0123456789abcdef0123456789abcdef")
_FIXTURE_P = -44  # typical owner-restricted permission bits

_ENCRYPT_MODES = {
    # mode: (V, R, key bits, aes)
    "rc4-40": (1, 2, 40, False),
    "rc4-128": (2, 3, 128, False),
    "aes-128": (4, 4, 128, True),
    "aes-256": (5, 6, 256, "v5"),     # PDF 2.0 AESV3, hardened hash
    "aes-256-r5": (5, 5, 256, "v5"),  # withdrawn ext.-3 single-SHA256
}

# deterministic V5 salts and file key (spec says random; fixtures
# pin them — the reader re-derives everything from /U//UE anyway)
_V5_FILE_KEY = bytes(range(32))
_V5_SALTS = {  # (user vsalt, user ksalt, owner vsalt, owner ksalt)
    "u_v": b"uvsalt01", "u_k": b"uksalt02",
    "o_v": b"ovsalt03", "o_k": b"oksalt04",
}


def _encrypt_setup_v5(r: int, p_unsigned: bool, encrypt_metadata: bool):
    """AES-256 (AESV3) twin of :func:`_encrypt_setup`: Algorithm 8/9/10
    writer entries around a pinned 256-bit file key."""
    from . import pdf_crypt

    u, ue = pdf_crypt.compute_u_entry_v5(
        b"", _V5_FILE_KEY, _V5_SALTS["u_v"], _V5_SALTS["u_k"], r
    )
    o, oe = pdf_crypt.compute_o_entry_v5(
        b"", _V5_FILE_KEY, _V5_SALTS["o_v"], _V5_SALTS["o_k"], u, r
    )
    perms = pdf_crypt.compute_perms_v5(
        _FIXTURE_P, encrypt_metadata, _V5_FILE_KEY
    )
    p_text = _FIXTURE_P & 0xFFFFFFFF if p_unsigned else _FIXTURE_P
    em = "" if encrypt_metadata else " /EncryptMetadata false"
    enc_dict = (
        f"<< /Filter /Standard /V 5 /R {r} /Length 256 "
        f"/P {p_text}{em} /O <{o.hex().upper()}> /U <{u.hex().upper()}> "
        f"/OE <{oe.hex().upper()}> /UE <{ue.hex().upper()}> "
        f"/Perms <{perms.hex().upper()}> "
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
        "/Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
    ).encode("latin-1")
    return _V5_FILE_KEY, "v5", enc_dict


def _encrypt_setup(
    mode: str, p_unsigned: bool = False, encrypt_metadata: bool = True
):
    """Standard-security parameters for an EMPTY user/owner password
    fixture: returns (file_key, aes, encrypt-dict bytes).

    ``p_unsigned`` writes /P in the unsigned-decimal form some real
    writers emit (e.g. 4294967252 for -44) — same 32-bit flag word,
    different spelling; the derived key must be identical.
    ``encrypt_metadata=False`` declares the XMP packet stored in the
    clear (/EncryptMetadata false — affects R4/R6 key derivation)."""
    from . import pdf_crypt

    v, r, bits, aes = _ENCRYPT_MODES[mode]
    if not encrypt_metadata and v < 4:
        # /EncryptMetadata is a V4+ crypt-filter-dict key; V1/V2
        # documents have no serialized form for it (§7.6.4.2)
        raise ValueError("EncryptMetadata=false needs V4+ encryption")
    if aes == "v5":
        return _encrypt_setup_v5(r, p_unsigned, encrypt_metadata)
    o = pdf_crypt.compute_o_entry(b"", b"", r, bits)
    sec = pdf_crypt.StdSecurity(
        v=v, r=r, length=bits, p=_FIXTURE_P, o=o, u=b"\x00" * 32,
        id0=_FIXTURE_ID, aes=aes, encrypt_metadata=encrypt_metadata,
    )
    key = pdf_crypt.compute_file_key(sec, b"")
    u = pdf_crypt.compute_u_entry(key, r, _FIXTURE_ID)
    cf = (
        " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
        "/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        if aes
        else ""
    )
    # /EncryptMetadata is a V4+ crypt-filter-dict key (§7.6.4.2);
    # for V<4 the flag has no serialized form and no key effect
    em = "" if encrypt_metadata or v < 4 else " /EncryptMetadata false"
    p_text = _FIXTURE_P & 0xFFFFFFFF if p_unsigned else _FIXTURE_P
    enc_dict = (
        f"<< /Filter /Standard /V {v} /R {r} /Length {bits} "
        f"/P {p_text}{em} /O <{o.hex().upper()}> "
        f"/U <{u.hex().upper()}>{cf} >>"
    ).encode("latin-1")
    return key, aes, enc_dict


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """LZW compressor (ISO 32000 §7.4.4 / TIFF convention): 9→12-bit
    MSB-first codes, 256 = clear, 257 = EOD. Width grows one step
    AFTER the decoder's mirrored rule accounting for the decoder's
    one-entry table lag: the decoder (pdf_tokenizer._lzw_decode)
    bumps when its table length reaches ``2^w − early_change``; its
    table trails this encoder's by exactly one entry, so the encoder
    bumps when ``next_code > 2^w − early_change``. Emits a clear code
    when the table fills (4096 entries)."""
    out = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    def reset() -> tuple[dict[bytes, int], int]:
        return {bytes([i]): i for i in range(256)}, 258

    table, next_code = reset()
    emit(256)
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code > (1 << width) - early_change:
            if width < 12:
                width += 1
            else:  # table full: clear and restart (spec-mandated)
                emit(256)
                table, next_code = reset()
                width = 9
        w = c
    if w:
        emit(table[w])
    emit(257)
    if nbits:  # flush: pad the tail byte with zero bits
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def rle_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder (ISO 32000 §7.4.5): repeats
    of ≥ 3 become (257−n, byte) runs, the rest literal blocks of
    ≤ 128 bytes; 128 terminates."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    def flush_literal(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(end, j + 128)
            out.append(k - j - 1)
            out.extend(data[j:k])
            j = k
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literal(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literal(n)
    out.append(128)
    return bytes(out)


def build_pdf(
    pages: list[PageSpec], compress: bool | str = False,
    xref_stream: bool = False, encrypt: str | None = None,
    tounicode_chars: dict[int, str] | None = None,
    tounicode_ranges: list[tuple[int, int, str]] | None = None,
    cid_tounicode_chars: dict[int, str] | None = None,
    differences: dict[int, str] | None = None,
    type3_glyphs: dict[int, str] | None = None,
    ocg_layers: dict[str, bool] | None = None,
    header_xobject: list[str] | None = None,
    inherit_attrs: bool = False, content_parts: int = 1,
    encrypt_p_unsigned: bool = False, id_literal: bool = False,
    predefined_cmap: str | None = None,
    info: dict[str, str] | None = None,
    outline: list[tuple[int, str]] | None = None,
    outline_cycle: bool = False,
    form_fields: list[tuple[str, str | bool | list]] | None = None,
    attachments: list[tuple[str, bytes]] | None = None,
    attachments_kids_tree: bool = False,
    xmp: dict[str, str] | None = None,
    encrypt_metadata: bool = True,
    xmp_crypt_identity: bool = False,
    widths_font: tuple[int, list[float]] | None = None,
    cid_widths: tuple[float, list[tuple]] | None = None,
    mac_roman_font: bool = False,
    images: list[tuple[str, int, int, bool, bytes, int]] | None = None,
) -> bytes:
    """Serialize pages into a complete PDF byte string.

    ``compress=True`` (or ``"flate"``) Flate-encodes each content
    stream; ``compress="lzw"`` / ``"rle"`` use LZWDecode /
    RunLengthDecode instead (zlib level 9,
    deterministic) the way real-world PDFs ship — exercises the
    tokenizer's ``/Filter /FlateDecode`` path.

    ``xref_stream=True`` emits the PDF 1.5+ layout modern producers
    write: dictionary objects packed into a Flate ``/ObjStm`` and a
    binary ``/Type /XRef`` cross-reference stream (W [1 4 2], Flate +
    PNG Up predictor) instead of the classic xref table — exercises
    the tokenizer's §7.5.7/§7.5.8 paths end to end. Composes with
    ``encrypt`` (the modern encrypted layout: /Encrypt referenced
    from the XRef stream dict, ObjStm payload encrypted as the
    container, XRef stream itself in the clear).

    ``encrypt`` ∈ {"rc4-40", "rc4-128", "aes-128"} writes a
    standard-security document with EMPTY user and owner passwords
    (the owner-restricted-but-readable layout that dominates real
    crawls) — content streams encrypted per-object (ISO 32000 §7.6.2,
    encryption OUTSIDE the Flate filter), deterministic IVs for AES.
    Exercises the tokenizer's :mod:`.pdf_crypt` path end to end.

    ``tounicode_chars``/``tounicode_ranges`` add a simple font /F3
    whose 1-byte codes decode through a /ToUnicode CMap;
    ``cid_tounicode_chars`` adds a /Type0 font /F4 with 2-byte codes
    and its own CMap — show raw codes with
    :meth:`PageSpec.put_codes`. Exercises the tokenizer's §9.10.3
    CMap path.

    ``differences`` ({code: glyph name}) adds a simple font /F5 with
    NO /ToUnicode but an indirect ``/Encoding << /Differences [..]
    >>`` object (ISO 32000 §9.6.6.3) — the non-embedded custom-
    encoding layout whose text is only recoverable through the AGL.

    ``header_xobject`` (a word list) paints those words near the top
    of EVERY page through a shared /Form XObject invoked as
    ``/Xh Do`` (ISO 32000 §8.10 — the letterhead/stamp layout real
    writers emit); the form carries its own /Resources.

    ``inherit_attrs=True`` moves /MediaBox and /Resources onto the
    root /Pages node (pages carry neither) — the inherited-attribute
    layout real writers emit (ISO 32000 §7.7.3.4).
    ``content_parts > 1`` splits each page's content stream at text-
    block boundaries into that many objects referenced as a
    ``/Contents [..]`` array.

    ``info`` ({key: value}) writes a document-information dictionary
    referenced as ``/Info`` from the trailer (ISO 32000 §14.3.3);
    values are PDF text strings — ASCII as literals, anything else as
    UTF-16BE-with-BOM hex strings, the two spellings real writers
    emit (§7.9.2.2).  ``outline`` ([(depth, title), ..], depth-0 =
    top level, deeper rows children of the nearest shallower row)
    writes the document-outline tree (§12.3.3): items linked
    /First /Last /Next /Prev /Parent with per-node /Count, the
    catalog gaining ``/Outlines``.  ``outline_cycle=True`` points the
    LAST top-level item's /Next back at the FIRST (a malformed-writer
    trap — a reader without a visited guard loops forever).

    ``form_fields`` writes an interactive-form dictionary (AcroForm,
    §12.7): the catalog gains ``/AcroForm << /Fields [..] >>``.  Each
    entry is ``(name, value)`` where a str value makes a text field
    (/FT /Tx, /V a text string), a bool makes a checkbox (/FT /Btn,
    /V the NAME /Yes or /Off — not a string, a trap for readers that
    assume strings), and a list of (name, value) pairs makes a
    non-terminal field whose kids inherit the dotted name prefix
    (§12.7.3.2 fully qualified names).

    ``attachments`` ([(filename, bytes)]) embeds files (§7.11): the
    catalog gains ``/Names << /EmbeddedFiles <name tree> >>``; each
    entry becomes a /Filespec whose /EF /F is an /EmbeddedFile
    stream — odd entries Flate-compressed, even stored raw.
    ``attachments_kids_tree=True`` splits the name tree into an
    intermediate-node layout with /Kids and /Limits (§7.9.6 — the
    two-level shape mass writers emit for large trees).

    ``xmp`` ({"title":…, "creator":…, "create_date":…}) writes an XMP
    metadata stream (§14.3.2, XMP Part 1): the catalog gains
    ``/Metadata``, the packet carries dc:title as an rdf:Alt,
    dc:creator as an rdf:Seq and xmp:CreateDate in ATTRIBUTE form —
    stored uncompressed, as the spec recommends so packet scanners
    find it."""
    if xref_stream:
        if tounicode_chars or tounicode_ranges or \
                cid_tounicode_chars or differences or type3_glyphs or \
                ocg_layers or header_xobject or \
                predefined_cmap or info or outline or form_fields or \
                attachments or xmp or images:
            raise ValueError(
                "tounicode/differences/xobject supported on the "
                "classic layout only"
            )
        return _build_pdf_xref_stream(pages, compress, encrypt)
    enc_key, enc_aes, enc_dict = (None, False, b"")
    if encrypt is not None:
        enc_key, enc_aes, enc_dict = _encrypt_setup(
            encrypt, p_unsigned=encrypt_p_unsigned,
            encrypt_metadata=encrypt_metadata,
        )

    def _ts(oid: int, value: str) -> str:
        """Text string owned by object ``oid``: plaintext syntax when
        the document is unencrypted, else the value's raw bytes
        encrypted with oid's object key and emitted as a hex string —
        strings in encrypted documents are encrypted exactly like
        streams (ISO 32000 §7.6.2). IV derived from (oid, plaintext)
        for byte-stable fixtures."""
        if enc_key is None:
            return _pdf_text_string(value)
        return "<" + _enc_str(oid, _text_string_bytes(value)) + ">"

    def _enc_str(oid: int, raw: bytes) -> str:
        import hashlib

        from . import pdf_crypt

        iv = hashlib.md5(
            f"fixture-siv:{oid}:".encode() + raw
        ).digest()
        return pdf_crypt.encrypt_object_bytes(
            enc_aes, enc_key, oid, 0, raw, iv=iv
        ).hex().upper()
    # object numbering: 1=catalog, 2=pages, 3=/F1, 4=/F2,
    # [5=/F3 6=its CMap] [7=/F4 8=its CMap],
    # then per page: page object, content object.
    objs: dict[int, bytes] = {}
    font_refs = {"F1": 3, "F2": 4}
    n_fixed = 4
    if tounicode_chars or tounicode_ranges:
        font_refs["F3"] = n_fixed + 1
        n_fixed += 2
    if cid_tounicode_chars:
        font_refs["F4"] = n_fixed + 1
        n_fixed += 2
    if differences:
        font_refs["F5"] = n_fixed + 1
        n_fixed += 2  # font object + indirect /Encoding object
    if predefined_cmap:
        font_refs["F6"] = n_fixed + 1
        n_fixed += 1  # Type0 font, predefined /Encoding, NO ToUnicode
    if type3_glyphs:
        font_refs["F7"] = n_fixed + 1
        n_fixed += 2  # Type3 font + shared glyph-procedure stream
    if widths_font:
        font_refs["F8"] = n_fixed + 1
        n_fixed += 1  # simple font with /FirstChar + /Widths metrics
    if mac_roman_font:
        font_refs["F9"] = n_fixed + 1
        n_fixed += 1  # simple font with /Encoding /MacRomanEncoding
    cid_desc_id = None
    if cid_widths:
        cid_desc_id = n_fixed + 1
        n_fixed += 1  # F2's descendant CIDFont carrying /DW + /W
    ocg_ids: dict[str, int] = {}
    oc_res: dict[str, str] = {}
    if ocg_layers:
        for i, lname in enumerate(sorted(ocg_layers)):
            ocg_ids[lname] = n_fixed + 1
            oc_res[lname] = f"oc{i}"
            n_fixed += 1
    xobj_id = None
    if header_xobject:
        xobj_id = n_fixed + 1
        n_fixed += 1
    # image XObjects (§8.9.5): (name, width, height, gray, payload,
    # n_draws) — payload is a ready JPEG byte stream stored with
    # /Filter /DCTDecode (encrypted per-object like every stream
    # when ``encrypt`` is set), drawn n_draws times on each page
    img_ids: dict[str, int] = {}
    for name, *_rest in images or []:
        img_ids[name] = n_fixed + 1
        n_fixed += 1
    font_dict = " ".join(
        f"/{name} {oid} 0 R" for name, oid in font_refs.items()
    )
    xobj_entries = []
    if xobj_id:
        xobj_entries.append(f"/Xh {xobj_id} 0 R")
    xobj_entries.extend(
        f"/{name} {oid} 0 R" for name, oid in img_ids.items()
    )
    xobj_dict = (
        " /XObject << " + " ".join(xobj_entries) + " >>"
        if xobj_entries else ""
    )
    props_dict = (
        " /Properties << " + " ".join(
            f"/{oc_res[n]} {ocg_ids[n]} 0 R" for n in sorted(ocg_ids)
        ) + " >>"
        if ocg_ids else ""
    )
    resources = (
        f"/Resources << /Font << {font_dict} >>{xobj_dict}"
        f"{props_dict} >>"
    )
    page_ids = []
    next_id = n_fixed + 1

    def _finish_stream(
        stream: bytes, content_id: int, extra: str = ""
    ) -> bytes:
        filt = ""
        if compress == "lzw":
            stream = lzw_encode(stream)
            filt = " /Filter /LZWDecode"
        elif compress == "rle":
            stream = rle_encode(stream)
            filt = " /Filter /RunLengthDecode"
        elif compress:
            import zlib

            stream = zlib.compress(stream, 9)
            filt = " /Filter /FlateDecode"
        if enc_key is not None:
            import hashlib

            from . import pdf_crypt

            iv = hashlib.md5(f"fixture-iv:{content_id}".encode()).digest()
            stream = pdf_crypt.encrypt_object_bytes(
                enc_aes, enc_key, content_id, 0, stream, iv=iv
            )
        return (
            f"<< {extra}/Length {len(stream)}{filt} >>\nstream\n".encode(
                "latin-1"
            )
            + stream
            + b"\nendstream"
        )

    for p in pages:
        page_id = next_id
        next_id += 1
        page_ids.append(page_id)
        stream = _content_stream(p, oc_res)
        if xobj_id is not None:
            stream = b"q /Xh Do Q\n" + stream
        if images:
            ops = []
            for name, iw, ih, _gray, _payload, n_draws in images:
                for d in range(n_draws):
                    ops.append(
                        f"q {iw * 2:g} 0 0 {ih * 2:g} "
                        f"{40 + 30 * d:g} {60 + 15 * d:g} cm "
                        f"/{name} Do Q".encode("latin-1")
                    )
            stream = b"\n".join(ops) + b"\n" + stream
        if content_parts > 1:
            # split at text-block boundaries into ~equal byte parts —
            # tokens never span parts, per §7.8.2
            blocks = stream.split(b"\n")
            per = max(1, -(-len(blocks) // content_parts))
            chunks = [
                b"\n".join(blocks[i : i + per])
                for i in range(0, len(blocks), per)
            ]
            cids = list(range(next_id, next_id + len(chunks)))
            next_id += len(chunks)
            for cid_, chunk in zip(cids, chunks):
                objs[cid_] = _finish_stream(chunk, cid_)
            contents_ref = "/Contents [{}]".format(
                " ".join(f"{c} 0 R" for c in cids)
            )
        else:
            content_id = next_id
            next_id += 1
            objs[content_id] = _finish_stream(stream, content_id)
            contents_ref = f"/Contents {content_id} 0 R"
        rotate = f" /Rotate {p.rotate}" if p.rotate else ""
        annots_ref = ""
        if p.links or p.annots:
            annot_ids = []
            for rect, uri, form in p.links:
                rect_s = " ".join(f"{v:g}" for v in rect)
                aid = next_id
                next_id += 1
                annot_ids.append(aid)
                if form == "square":
                    objs[aid] = (
                        f"<< /Type /Annot /Subtype /Square "
                        f"/Rect [{rect_s}] >>"
                    ).encode("latin-1")
                    continue
                if form == "goto":
                    objs[aid] = (
                        f"<< /Type /Annot /Subtype /Link /Rect [{rect_s}]"
                        f" /A << /S /GoTo /D [2 0 R /Fit] >> >>"
                    ).encode("latin-1")
                    continue
                # the URI string is owned by the object it appears
                # in: the action object (indirect form) or the annot
                act_id = None
                str_oid = aid
                if form == "indirect":
                    act_id = next_id
                    next_id += 1
                    str_oid = act_id
                if enc_key is not None:
                    ustr = (
                        "<"
                        + _enc_str(str_oid, uri.encode("utf-8"))
                        + ">"
                    )
                elif form == "hex":
                    ustr = "<" + uri.encode("utf-8").hex().upper() + ">"
                else:
                    ustr = _pdf_literal(uri.encode("utf-8"))
                action = f"<< /S /URI /URI {ustr} >>"
                if form == "indirect":
                    objs[act_id] = action.encode("latin-1")
                    objs[aid] = (
                        f"<< /Type /Annot /Subtype /Link /Rect [{rect_s}]"
                        f" /A {act_id} 0 R >>"
                    ).encode("latin-1")
                else:
                    objs[aid] = (
                        f"<< /Type /Annot /Subtype /Link /Rect [{rect_s}]"
                        f" /A {action} >>"
                    ).encode("latin-1")
            for subtype, contents, author in p.annots:
                aid = next_id
                next_id += 1
                annot_ids.append(aid)
                extra = ""
                if contents is not None:
                    extra += f" /Contents {_ts(aid, contents)}"
                if author is not None:
                    extra += f" /T {_ts(aid, author)}"
                objs[aid] = (
                    f"<< /Type /Annot /Subtype /{subtype} "
                    f"/Rect [72 72 200 90]{extra} >>"
                ).encode("latin-1")
            annots_ref = " /Annots [{}]".format(
                " ".join(f"{a} 0 R" for a in annot_ids)
            )
        page_attrs = (
            "" if inherit_attrs
            else f" /MediaBox [0 0 {p.width:g} {p.height:g}] {resources}"
        )
        objs[page_id] = (
            f"<< /Type /Page /Parent 2 0 R{page_attrs}{rotate}"
            f"{annots_ref} "
            f"{contents_ref} >>"
        ).encode("latin-1")

    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    info_ref = ""
    if info:
        info_id = next_id
        next_id += 1
        items = " ".join(
            f"/{k} {_ts(info_id, v)}" for k, v in info.items()
        )
        objs[info_id] = f"<< {items} >>".encode("latin-1")
        info_ref = f" /Info {info_id} 0 R"
    outlines_ref = ""
    if outline:
        root_oid = next_id
        next_id += 1
        item_ids = list(range(next_id, next_id + len(outline)))
        next_id += len(outline)
        # parent = nearest shallower preceding row (depth-0 rows are
        # top level, children of the invisible Outlines root)
        children: dict[int | None, list[int]] = {None: []}
        parent: dict[int, int | None] = {}
        stack: list[tuple[int, int]] = []
        for i, (depth, _title) in enumerate(outline):
            while stack and stack[-1][0] >= depth:
                stack.pop()
            par = stack[-1][1] if stack else None
            parent[i] = par
            children.setdefault(par, []).append(i)
            children.setdefault(i, [])
            stack.append((depth, i))

        def _descendants(i: int) -> int:
            return sum(1 + _descendants(c) for c in children[i])

        top = children[None]
        for i, (_depth, title) in enumerate(outline):
            sibs = children[parent[i]]
            k = sibs.index(i)
            pid = root_oid if parent[i] is None else item_ids[parent[i]]
            parts = [
                f"/Title {_ts(item_ids[i], title)}",
                f"/Parent {pid} 0 R",
            ]
            if k > 0:
                parts.append(f"/Prev {item_ids[sibs[k - 1]]} 0 R")
            if k + 1 < len(sibs):
                parts.append(f"/Next {item_ids[sibs[k + 1]]} 0 R")
            elif outline_cycle and parent[i] is None and len(top) > 0:
                # the malformed-writer trap: last top-level item's
                # /Next points back at the first — a reader without a
                # visited guard walks the ring forever
                parts.append(f"/Next {item_ids[top[0]]} 0 R")
            if children[i]:
                parts.append(f"/First {item_ids[children[i][0]]} 0 R")
                parts.append(f"/Last {item_ids[children[i][-1]]} 0 R")
                parts.append(f"/Count {_descendants(i)}")
            objs[item_ids[i]] = (
                "<< " + " ".join(parts) + " >>"
            ).encode("latin-1")
        objs[root_oid] = (
            f"<< /Type /Outlines /First {item_ids[top[0]]} 0 R "
            f"/Last {item_ids[top[-1]]} 0 R /Count {len(outline)} >>"
        ).encode("latin-1")
        outlines_ref = f" /Outlines {root_oid} 0 R"
    acroform_ref = ""
    if form_fields:
        def _emit_field(name: str, value) -> int:
            nonlocal next_id
            fid = next_id
            next_id += 1
            if isinstance(value, list):
                kid_ids = [
                    _emit_field(kn, kv) for kn, kv in value
                ]
                kids = " ".join(f"{k} 0 R" for k in kid_ids)
                body = (
                    f"<< /T {_ts(fid, name)} "
                    f"/Kids [{kids}] >>"
                )
                for k in kid_ids:
                    # splice the /Parent back-ref in (kids were
                    # emitted before this node's id was known)
                    objs[k] = objs[k][:-3] + (
                        f" /Parent {fid} 0 R >>"
                    ).encode("latin-1")
            elif isinstance(value, bool):
                state = "/Yes" if value else "/Off"
                body = (
                    f"<< /FT /Btn /T {_ts(fid, name)} "
                    f"/V {state} >>"
                )
            else:
                body = (
                    f"<< /FT /Tx /T {_ts(fid, name)} "
                    f"/V {_ts(fid, value)} >>"
                )
            objs[fid] = body.encode("latin-1")
            return fid

        root_fields = [
            _emit_field(n, v) for n, v in form_fields
        ]
        acro_id = next_id
        next_id += 1
        flist = " ".join(f"{f} 0 R" for f in root_fields)
        objs[acro_id] = (
            f"<< /Fields [{flist}] >>"
        ).encode("latin-1")
        acroform_ref = f" /AcroForm {acro_id} 0 R"
    metadata_ref = ""
    if xmp:
        def _x(v: str) -> str:
            return (v.replace("&", "&amp;").replace("<", "&lt;")
                    .replace(">", "&gt;").replace('"', "&quot;"))
        packet = (
            '<?xpacket begin="\ufeff" '
            'id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
            '<x:xmpmeta xmlns:x="adobe:ns:meta/">\n'
            '<rdf:RDF xmlns:rdf='
            '"http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
            '<rdf:Description rdf:about="" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/" '
            'xmlns:xmp="http://ns.adobe.com/xap/1.0/" '
            f'xmp:CreateDate="{_x(xmp.get("create_date", ""))}">\n'
            "<dc:title><rdf:Alt>"
            '<rdf:li xml:lang="x-default">'
            f'{_x(xmp.get("title", ""))}</rdf:li>'
            "</rdf:Alt></dc:title>\n"
            "<dc:creator><rdf:Seq>"
            f"<rdf:li>{_x(xmp.get('creator', ''))}</rdf:li>"
            "</rdf:Seq></dc:creator>\n"
            "</rdf:Description>\n</rdf:RDF>\n</x:xmpmeta>\n"
            '<?xpacket end="w"?>'
        ).encode("utf-8")
        meta_id = next_id
        next_id += 1
        filt = ""
        if enc_key is not None and xmp_crypt_identity:
            # explicit per-stream opt-out: stored in the clear,
            # tagged /Crypt /Identity (§7.4.10)
            filt = (
                " /Filter /Crypt /DecodeParms "
                "<< /Type /CryptFilterDecodeParms /Name /Identity >>"
            )
        elif enc_key is not None and encrypt_metadata:
            import hashlib

            from . import pdf_crypt

            iv = hashlib.md5(f"fixture-iv:{meta_id}".encode()).digest()
            packet = pdf_crypt.encrypt_object_bytes(
                enc_aes, enc_key, meta_id, 0, packet, iv=iv
            )
        # else: /EncryptMetadata false — packet stays plaintext
        objs[meta_id] = (
            f"<< /Type /Metadata /Subtype /XML{filt} "
            f"/Length {len(packet)} >>\nstream\n".encode("latin-1")
            + packet + b"\nendstream"
        )
        metadata_ref = f" /Metadata {meta_id} 0 R"
    names_ref = ""
    if attachments:
        import zlib as _zlib

        pair_parts: list[tuple[str, int]] = []
        for i, (fname, payload) in enumerate(attachments):
            stream_id = next_id
            fs_id = next_id + 1
            next_id += 2
            if i % 2 == 1:
                sdata = _zlib.compress(payload, 9)
                sfilt = " /Filter /FlateDecode"
            else:
                sdata, sfilt = payload, ""
            if enc_key is not None:
                # encryption wraps the ENCODED stream bytes (§7.6.2)
                import hashlib

                from . import pdf_crypt

                iv = hashlib.md5(
                    f"fixture-iv:{stream_id}".encode()
                ).digest()
                sdata = pdf_crypt.encrypt_object_bytes(
                    enc_aes, enc_key, stream_id, 0, sdata, iv=iv
                )
            objs[stream_id] = (
                f"<< /Type /EmbeddedFile{sfilt} "
                f"/Length {len(sdata)} >>\nstream\n".encode("latin-1")
                + sdata + b"\nendstream"
            )
            objs[fs_id] = (
                f"<< /Type /Filespec /F {_ts(fs_id, fname)} "
                f"/EF << /F {stream_id} 0 R >> >>"
            ).encode("latin-1")
            pair_parts.append((fname, fs_id))
        pair_parts.sort()  # name trees are lexicographically ordered
        def _names_array(pairs, node_oid: int) -> str:
            # name-tree keys are strings OWNED by the node object
            return " ".join(
                f"{_ts(node_oid, n)} {fs} 0 R" for n, fs in pairs
            )
        tree_id = next_id
        next_id += 1
        if attachments_kids_tree and len(pair_parts) >= 2:
            mid = len(pair_parts) // 2
            halves = [pair_parts[:mid], pair_parts[mid:]]
            kid_ids = []
            for half in halves:
                kid = next_id
                next_id += 1
                kid_ids.append(kid)
                objs[kid] = (
                    f"<< /Limits [{_ts(kid, half[0][0])} "
                    f"{_ts(kid, half[-1][0])}] "
                    f"/Names [{_names_array(half, kid)}] >>"
                ).encode("latin-1")
            kid_refs = " ".join(f"{k} 0 R" for k in kid_ids)
            objs[tree_id] = (
                f"<< /Kids [{kid_refs}] >>"
            ).encode("latin-1")
        else:
            objs[tree_id] = (
                f"<< /Names [{_names_array(pair_parts, tree_id)}] >>"
            ).encode("latin-1")
        names_id = next_id
        next_id += 1
        objs[names_id] = (
            f"<< /EmbeddedFiles {tree_id} 0 R >>"
        ).encode("latin-1")
        names_ref = f" /Names {names_id} 0 R"
    ocprops_ref = ""
    if ocg_ids:
        # OCG dicts (§8.11.2) + the catalog /OCProperties default
        # configuration: /OFF lists the layers whose content a
        # conforming reader does not draw — and an extractor must
        # not read
        for lname, oid in ocg_ids.items():
            objs[oid] = (
                f"<< /Type /OCG /Name ({lname}) >>"
            ).encode("latin-1")
        all_refs = " ".join(
            f"{ocg_ids[n]} 0 R" for n in sorted(ocg_ids)
        )
        off_refs = " ".join(
            f"{ocg_ids[n]} 0 R" for n in sorted(ocg_ids)
            if not ocg_layers[n]
        )
        ocprops_ref = (
            f" /OCProperties << /OCGs [{all_refs}] "
            f"/D << /Order [{all_refs}] /OFF [{off_refs}] >> >>"
        )
    objs[1] = (
        f"<< /Type /Catalog /Pages 2 0 R{outlines_ref}"
        f"{acroform_ref}{names_ref}{metadata_ref}{ocprops_ref} >>"
    ).encode("latin-1")
    pages_attrs = (
        f" /MediaBox [0 0 {pages[0].width:g} {pages[0].height:g}] "
        f"{resources}"
        if inherit_attrs and pages
        else ""
    )
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)}"
        f"{pages_attrs} >>"
    ).encode("latin-1")
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    if cid_desc_id is not None:
        dw, groups = cid_widths
        parts = []
        for g in groups:
            if len(g) == 2:  # (c, [w...]) consecutive form
                c, warr = g
                parts.append(
                    f"{c} [{' '.join(f'{w:g}' for w in warr)}]"
                )
            else:            # (lo, hi, w) range form
                lo, hi, w = g
                parts.append(f"{lo} {hi} {w:g}")
        objs[4] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCJK "
            f"/Encoding /Identity-H "
            f"/DescendantFonts [{cid_desc_id} 0 R] >>"
        ).encode("latin-1")
        objs[cid_desc_id] = (
            f"<< /Type /Font /Subtype /CIDFontType2 "
            f"/BaseFont /FixtureCJK /DW {dw:g} "
            f"/W [{' '.join(parts)}] >>"
        ).encode("latin-1")
    else:
        objs[4] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCJK "
            b"/Encoding /Identity-H >>"
        )
    def _maybe_encrypt(oid: int, stream: bytes) -> bytes:
        # every stream in an encrypted document is encrypted — the
        # ToUnicode CMaps included (ISO 32000 §7.6.1)
        if enc_key is None:
            return stream
        import hashlib

        from . import pdf_crypt

        iv = hashlib.md5(f"fixture-iv:{oid}".encode()).digest()
        return pdf_crypt.encrypt_object_bytes(
            enc_aes, enc_key, oid, 0, stream, iv=iv
        )

    if "F3" in font_refs:
        fid, cid = font_refs["F3"], font_refs["F3"] + 1
        cstream = _maybe_encrypt(
            cid, _cmap_stream(tounicode_chars, tounicode_ranges, False)
        )
        objs[fid] = (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /FixtureCustom "
            f"/ToUnicode {cid} 0 R >>"
        ).encode("latin-1")
        objs[cid] = (
            f"<< /Length {len(cstream)} >>\nstream\n".encode("latin-1")
            + cstream
            + b"\nendstream"
        )
    if "F4" in font_refs:
        fid, cid = font_refs["F4"], font_refs["F4"] + 1
        cstream = _maybe_encrypt(
            cid, _cmap_stream(cid_tounicode_chars, None, True)
        )
        objs[fid] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID "
            f"/Encoding /Identity-H /ToUnicode {cid} 0 R >>"
        ).encode("latin-1")
        objs[cid] = (
            f"<< /Length {len(cstream)} >>\nstream\n".encode("latin-1")
            + cstream
            + b"\nendstream"
        )
    if "F5" in font_refs:
        fid, eid = font_refs["F5"], font_refs["F5"] + 1
        diff_items = " ".join(
            f"{c} /{n}" for c, n in sorted(differences.items())
        )
        objs[fid] = (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /FixtureDiff "
            f"/Encoding {eid} 0 R >>"
        ).encode("latin-1")
        objs[eid] = (
            f"<< /Type /Encoding /Differences [ {diff_items} ] >>"
        ).encode("latin-1")
    if "F6" in font_refs:
        fid = font_refs["F6"]
        objs[fid] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCJK "
            f"/Encoding /{predefined_cmap} >>"
        ).encode("latin-1")
    if "F9" in font_refs:
        # legacy Mac writer shape: the name-form /Encoding routes the
        # high byte range through MacRoman, NOT WinAnsi
        objs[font_refs["F9"]] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
            b"/Encoding /MacRomanEncoding >>"
        )
    if "F8" in font_refs:
        # simple font carrying REAL declared metrics (§9.6.2.1):
        # /FirstChar + /Widths in glyph-space 1/1000 units — the
        # tokenizer must use these, not its width model, for word-box
        # geometry
        first, ws = widths_font
        arr = " ".join(f"{w:g}" for w in ws)
        objs[font_refs["F8"]] = (
            f"<< /Type /Font /Subtype /TrueType "
            f"/BaseFont /FixtureMetrics /Encoding /WinAnsiEncoding "
            f"/FirstChar {first} /LastChar {first + len(ws) - 1} "
            f"/Widths [{arr}] >>"
        ).encode("latin-1")
    if "F7" in font_refs:
        # Type3 font (ISO 32000 §9.6.5): glyphs are content-stream
        # PROCEDURES named by /CharProcs; /Encoding /Differences is
        # the only code→name mapping and is REQUIRED — written INLINE
        # here (F5 uses the indirect-object spelling) so both layouts
        # are exercised. All names share one glyph proc: rendering
        # identity is irrelevant to extraction, the names carry the
        # text. FontMatrix is the conventional 0.001 scale.
        fid, pid = font_refs["F7"], font_refs["F7"] + 1
        diff_items = " ".join(
            f"{c} /{n}" for c, n in sorted(type3_glyphs.items())
        )
        charprocs = " ".join(
            f"/{n} {pid} 0 R" for _c, n in sorted(type3_glyphs.items())
        )
        lo, hi = min(type3_glyphs), max(type3_glyphs)
        widths = " ".join(
            "500" if c in type3_glyphs else "0"
            for c in range(lo, hi + 1)
        )
        objs[fid] = (
            f"<< /Type /Font /Subtype /Type3 "
            f"/FontBBox [0 0 1000 1000] "
            f"/FontMatrix [0.001 0 0 0.001 0 0] "
            f"/CharProcs << {charprocs} >> "
            f"/Encoding << /Type /Encoding "
            f"/Differences [ {diff_items} ] >> "
            f"/FirstChar {lo} /LastChar {hi} /Widths [ {widths} ] >>"
        ).encode("latin-1")
        proc = b"500 0 d0 0 0 m 500 700 l S"
        objs[pid] = (
            f"<< /Length {len(proc)} >>\nstream\n".encode("latin-1")
            + proc + b"\nendstream"
        )
    for name, iw, ih, gray, payload, _nd in images or []:
        oid = img_ids[name]
        data = payload
        if enc_key is not None:
            import hashlib

            from . import pdf_crypt

            iv = hashlib.md5(f"fixture-iv:{oid}".encode()).digest()
            data = pdf_crypt.encrypt_object_bytes(
                enc_aes, enc_key, oid, 0, data, iv=iv
            )
        cs = "/DeviceGray" if gray else "/DeviceRGB"
        objs[oid] = (
            f"<< /Type /XObject /Subtype /Image /Width {iw} "
            f"/Height {ih} /ColorSpace {cs} /BitsPerComponent 8 "
            f"/Filter /DCTDecode /Length {len(data)} "
            f">>\nstream\n".encode("latin-1")
            + data + b"\nendstream"
        )
    if xobj_id is not None:
        form = PageSpec()
        form.put_words(72, 22, 10, header_xobject)
        objs[xobj_id] = _finish_stream(
            _content_stream(form), xobj_id,
            extra=(
                f"/Type /XObject /Subtype /Form "
                f"/BBox [0 0 {LETTER_W:g} {LETTER_H:g}] "
                f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> "
            ),
        )
    encrypt_ref = ""
    if encrypt is not None:
        enc_id = next_id
        objs[enc_id] = enc_dict
        if id_literal:
            # the literal-string /ID spelling many writers emit
            idstr = _pdf_literal(_FIXTURE_ID)
        else:
            idstr = f"<{_FIXTURE_ID.hex().upper()}>"
        encrypt_ref = (
            f" /Encrypt {enc_id} 0 R /ID [{idstr} {idstr}]"
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
        f"trailer\n<< /Size {n_objs} /Root 1 0 R{info_ref}"
        f"{encrypt_ref} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


def incremental_add_page(
    base: bytes, page: PageSpec, compress: bool = False
) -> bytes:
    """Append an incremental update (ISO 32000 §7.5.6) that adds one
    page to a classic-layout document — the structure every desktop
    writer's "Save" emits: new objects appended after the old %%EOF,
    an UPDATED /Pages object under its ORIGINAL id (shadowing the old
    revision), a new xref section covering only the changed ids, and
    a trailer whose /Prev points at the previous xref."""
    import zlib

    if b"/Encrypt" in base[-1024:]:
        raise ValueError(
            "incremental updates on encrypted bases are not "
            "supported by this fixture writer (the appended streams "
            "would need the base document's file key)"
        )
    hits = list(
        re.finditer(rb"(?:^|\n)2 0 obj\n(.*?)\nendobj", base, re.DOTALL)
    )
    if not hits:
        raise ValueError("no /Pages object (id 2) in base")
    pages_body = hits[-1].group(1)  # newest revision of the node
    count = int(re.search(rb"/Count (\d+)", pages_body).group(1))
    max_id = max(
        int(mm.group(1))
        for mm in re.finditer(rb"(?:^|\n)(\d+) 0 obj", base)
    )
    page_id, content_id = max_id + 1, max_id + 2
    old_xref = int(
        re.search(rb"startxref\s+(\d+)\s+%%EOF", base[-256:]).group(1)
    )
    # rewrite ONLY Kids/Count so inherited attrs on the node survive
    new_pages = re.sub(
        rb"/Kids \[([^\]]*)\]",
        lambda km: b"/Kids ["
        + km.group(1).strip()
        + f" {page_id} 0 R]".encode("latin-1"),
        pages_body,
    )
    new_pages = re.sub(
        rb"/Count \d+", f"/Count {count + 1}".encode("latin-1"),
        new_pages,
    )
    stream = _content_stream(page)
    filt = ""
    if compress:
        stream = zlib.compress(stream, 9)
        filt = " /Filter /FlateDecode"
    content_obj = (
        f"<< /Length {len(stream)}{filt} >>\nstream\n".encode("latin-1")
        + stream
        + b"\nendstream"
    )
    page_obj = (
        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page.width:g} "
        f"{page.height:g}] /Contents {content_id} 0 R "
        f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> >>"
    ).encode("latin-1")
    out = bytearray(base)
    if not out.endswith(b"\n"):
        out += b"\n"
    offsets: dict[int, int] = {}
    for oid, body in (
        (2, new_pages), (page_id, page_obj), (content_id, content_obj)
    ):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
    xref_pos = len(out)
    out += (
        f"xref\n2 1\n{offsets[2]:010d} 00000 n \n"
        f"{page_id} 2\n{offsets[page_id]:010d} 00000 n \n"
        f"{offsets[content_id]:010d} 00000 n \n"
        f"trailer\n<< /Size {content_id + 1} /Root 1 0 R "
        f"/Prev {old_xref} >>\nstartxref\n{xref_pos}\n%%EOF\n"
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


def _build_pdf_xref_stream(
    pages: list[PageSpec], compress: bool, encrypt: str | None = None
) -> bytes:
    """PDF 1.5 layout: dict objects in an /ObjStm, binary /XRef stream.

    Object numbering: 1=catalog, 2=pages, 3=/F1, 4=/F2, then per page
    (page obj, content obj); content streams stay standalone (streams
    cannot live in an ObjStm); [the /Encrypt dict,] ObjStm and XRef
    stream take the last ids.

    ``encrypt`` combines the modern layout with standard security —
    what current writers actually emit. Per ISO 32000: the /Encrypt
    dict is a DIRECT object (never in an ObjStm) referenced from the
    XRef stream's dict alongside /ID; content streams and the ObjStm
    payload encrypt per-object AFTER compression; the XRef stream
    itself is never encrypted."""
    import hashlib
    import zlib

    enc_key, enc_aes, enc_dict = (None, False, b"")
    if encrypt is not None:
        enc_key, enc_aes, enc_dict = _encrypt_setup(encrypt)

    def _maybe_encrypt(oid: int, stream: bytes) -> bytes:
        if enc_key is None:
            return stream
        from . import pdf_crypt

        iv = hashlib.md5(f"fixture-iv:{oid}".encode()).digest()
        return pdf_crypt.encrypt_object_bytes(
            enc_aes, enc_key, oid, 0, stream, iv=iv
        )

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
        stream = _maybe_encrypt(content_id, stream)
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

    enc_id = None
    if encrypt is not None:
        enc_id = next_id
        next_id += 1
        direct[enc_id] = enc_dict  # direct object, never encrypted
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
    zpayload = _maybe_encrypt(objstm_id, zlib.compress(payload, 9))

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
    encrypt_ref = ""
    if enc_id is not None:
        idhex = _FIXTURE_ID.hex().upper()
        encrypt_ref = (
            f" /Encrypt {enc_id} 0 R /ID [<{idhex}> <{idhex}>]"
        )
    out += (
        f"{xref_id} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Index [0 {size}] /Root 1 0 R{encrypt_ref} "
        f"/Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 7 >> "
        f"/Length {len(xdata)} >>\nstream\n".encode("latin-1")
        + xdata
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode("latin-1")
    return bytes(out)


def build_pdf_hybrid(pages: list[PageSpec],
                     compress: bool = False) -> bytes:
    """HYBRID-REFERENCE file (ISO 32000 §7.5.8.4) — the layout
    Acrobat emits for PDF-1.5 features with 1.4 compatibility:
    startxref points at a CLASSIC xref table whose trailer carries
    ``/XRefStm``, a cross-reference STREAM holding the entries the
    table lists as FREE (here: the page dictionaries, packed into an
    /ObjStm).  An old reader sees a structurally valid file and
    degrades; a conforming reader reads the stream BEFORE the table,
    so the free entries must not tombstone the ids the stream just
    claimed.  The stream's /Index uses per-object ranges (page ids
    interleave with content ids, so they are not contiguous)."""
    import zlib

    direct: dict[int, bytes] = {}
    packed: dict[int, bytes] = {}
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
        packed[page_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {p.width:g} "
            f"{p.height:g}] /Contents {content_id} 0 R "
            f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> >>"
        ).encode("latin-1")
        direct[content_id] = (
            f"<< /Length {len(stream)}{filt} >>\nstream\n".encode(
                "latin-1"
            )
            + stream
            + b"\nendstream"
        )
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    direct[1] = b"<< /Type /Catalog /Pages 2 0 R /Version /1.5 >>"
    direct[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>"
    ).encode("latin-1")
    direct[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    direct[4] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCJK "
        b"/Encoding /Identity-H >>"
    )
    objstm_id = next_id
    xrefstm_id = next_id + 1
    size = xrefstm_id + 1
    member_ids = sorted(packed)
    offs, bodyparts, cursor = [], [], 0
    for oid in member_ids:
        offs.append((oid, cursor))
        bodyparts.append(packed[oid])
        cursor += len(packed[oid]) + 1
    header = " ".join(f"{oid} {off}" for oid, off in offs) + "\n"
    payload = header.encode("latin-1") + b"\n".join(bodyparts) + b"\n"
    zpayload = zlib.compress(payload, 9)

    out = bytearray(b"%PDF-1.4\n")  # header stays 1.4 — that is the point
    offsets: dict[int, int] = {}
    for oid in sorted(direct):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode("latin-1") + direct[oid] \
            + b"\nendobj\n"
    offsets[objstm_id] = len(out)
    out += (
        f"{objstm_id} 0 obj\n<< /Type /ObjStm /N {len(member_ids)} "
        f"/First {len(header)} /Filter /FlateDecode "
        f"/Length {len(zpayload)} >>\nstream\n".encode("latin-1")
        + zpayload
        + b"\nendstream\nendobj\n"
    )
    # the /XRefStm stream: ONLY the entries the classic table hides
    # (packed members, the ObjStm, itself), per-object /Index ranges
    xrefstm_pos = len(out)
    offsets[xrefstm_id] = xrefstm_pos
    stream_oids = member_ids + [objstm_id, xrefstm_id]
    objstm_index = {oid: i for i, (oid, _off) in enumerate(offs)}
    rows = []
    for oid in stream_oids:
        if oid in objstm_index:
            rows.append(
                b"\x02" + objstm_id.to_bytes(4, "big")
                + objstm_index[oid].to_bytes(2, "big")
            )
        else:
            rows.append(
                b"\x01" + offsets[oid].to_bytes(4, "big")
                + (0).to_bytes(2, "big")
            )
    index = " ".join(f"{oid} 1" for oid in stream_oids)
    xdata = zlib.compress(b"".join(rows), 9)
    out += (
        f"{xrefstm_id} 0 obj\n<< /Type /XRef /Size {size} "
        f"/W [1 4 2] /Index [{index}] /Root 1 0 R "
        f"/Filter /FlateDecode /Length {len(xdata)} >>\nstream\n"
        .encode("latin-1")
        + xdata
        + b"\nendstream\nendobj\n"
    )
    # classic table: every object listed — packed members as FREE
    # (old-reader degradation), everything else at its offset
    xref_pos = len(out)
    out += f"xref\n0 {size}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for oid in range(1, size):
        if oid in offsets:
            out += f"{offsets[oid]:010d} 00000 n \n".encode("latin-1")
        else:
            out += b"0000000000 00001 f \n"
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R "
        f"/XRefStm {xrefstm_pos} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)
