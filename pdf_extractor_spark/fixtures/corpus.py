"""Deterministic synthetic fixture corpus (FIXTURES.md §1, §3-4).

Every case is built from fixed literals — no randomness, no wall-clock —
so the corpus is byte-identical across runs and machines. Golden
outputs are produced by running the extraction kernel ONCE over these
cases and freezing the results under ``tests/golden/`` (see
``scripts/freeze_goldens.py``); pytest then enforces byte equality.

Case ids follow FIXTURES.md §3-4; each pins down specific reference
behavior (citations in FIXTURES.md).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from ..operators.pdf_generator import PageSpec, build_pdf

BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)

_BODY_EN = [
    "The quick brown fox jumps over the lazy dog while the engine",
    "keeps every byte of extracted text deterministic and stable",
    "across repeated runs on any number of executors in the cluster",
]
_BODY_JA = [
    "日本語の本文はこの行に含まれており抽出結果は常に同一です",
    "二行目の日本語テキストもまた決定的に処理されます",
]


def _lines(page: PageSpec, lines: list[list[str]], x: float = 72.0,
           y0: float = 100.0, dy: float = 20.0, size: float = 12.0) -> None:
    for i, words in enumerate(lines):
        page.put_words(x, y0 + i * dy, size, words)


# ------------------------------------------------------------- PDF cases

def _pdf_single_col() -> bytes:
    pages = []
    for pno in range(3):
        p = PageSpec()
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put(72, 170, 12, _BODY_JA[0])
        p.put(72, 190, 12, _BODY_JA[1])
        p.put_words(72, 220, 12, [f"closing", "line", "page{}".format(pno + 1),
                                  "with", "enough", "words", "to", "stay"])
        pages.append(p)
    return build_pdf(pages)


def _pdf_two_col() -> bytes:
    pages = []
    for pno in range(2):
        p = PageSpec()
        left = [["Left", "column", "first", "line"],
                ["left", "column", "second", "line"],
                ["left", "column", "third", "line"]]
        right = [["Right", "column", "alpha", "row"],
                 ["right", "column", "beta", "row"],
                 ["right", "column", "gamma", "row"]]
        _lines(p, left, x=72.0)
        _lines(p, right, x=330.0)
        pages.append(p)
    return build_pdf(pages)


def _pdf_header_footer() -> bytes:
    pages = []
    for pno in range(5):
        p = PageSpec()
        p.put(240, 20, 10, "Annual Technical Report 2025")
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put_words(72, 180, 12, ["unique", "body", "sentence", "number",
                                  f"v{pno+1}", "stays", "in", "the", "output",
                                  "text"])
        p.put(290, 760, 10, f"- {pno + 1} -")
        p.put(200, 775, 9, "Fixture Corp Confidential")
        pages.append(p)
    return build_pdf(pages)


def _pdf_artifact_marked() -> bytes:
    """Tagged-PDF artifact suppression (ISO 32000 §14.8.2.2): running
    heads and folios wrapped in ``/Artifact`` marked content are
    pagination furniture, not logical content — dropped at the
    content-stream level BEFORE any statistical filter. Only two
    pages, each with a page-UNIQUE header/footer string, so the A1
    repeating-line detector cannot be what removes them; the
    declarative channel must. Structure-tagged text (``/P BDC``) and
    the literal words "Artifact BMC EMC" in prose must survive."""
    pages = []
    for pno in range(2):
        p = PageSpec()
        p.put(200, 20, 10, f"Quarterly Bulletin Issue {pno + 7}",
              artifact="Pagination")
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put_words(72, 180, 12, ["prose", "mentioning", "Artifact",
                                  "BMC", "and", "EMC", "words", "stays",
                                  f"visible{pno + 1}"])
        p.put(72, 210, 12, "tagged paragraph content kept verbatim",
              mc_tag="P")
        p.put(250, 760, 10, f"folio {pno + 1} marked artifact",
              artifact="")
        pages.append(p)
    return build_pdf(pages)


def _pdf_actualtext() -> bytes:
    """/ActualText replacement (ISO 32000 §14.9.4): a tagged writer
    records the TRUE text when the shown glyphs are presentation
    forms — ligature codepoints, garbled subset encodings. The
    replacement must appear in the extraction exactly once, in
    reading order, and the shown garbage never; the artifact channel
    (§14.8.2.2) keeps working on the same page."""
    p = PageSpec()
    p.put(200, 20, 10, "ActualText Fixture Header", artifact="Pagination")
    p.put(72, 100, 12, "the parser is")
    p.put(160, 100, 12, "eﬀ-cient", actual_text="efficient")
    p.put(240, 100, 12, "at scale")
    p.put(72, 130, 12, "Ḡarbled", actual_text="Garbled")
    p.put(140, 130, 12, "subset fonts recover their real words")
    _lines(p, [ln.split() for ln in _BODY_EN], y0=200.0)
    return build_pdf([p])


def _pdf_type3_font() -> bytes:
    """Type3 glyph-procedure font (ISO 32000 §9.6.5) — the classic
    old-TeX/dvips output layout: codes are SCRAMBLED relative to
    ASCII (code 1 = 'M', …), so the text is recoverable only through
    the REQUIRED inline /Encoding /Differences names + AGL, never by
    treating bytes as Latin-1; 'uni0041'-form names and the 'fi'
    ligature name resolve through the same table."""
    # codes dodge 10/13 (raw CR in a literal string normalizes to LF
    # per §7.3.4.2 — correctly, in BOTH engines — which would alias
    # two codes) — exactly the hole a real scrambled subset avoids too
    glyphs = {
        1: "M", 2: "e", 3: "t", 4: "a", 5: "f", 6: "o", 7: "n",
        8: "space", 9: "uni0041", 16: "fi", 17: "x", 18: "e", 19: "d",
    }
    p = PageSpec()
    # codes spell "Metafont" + " " + "A" + "ﬁxed"
    p.put_codes(72, 100, 14, bytes([1, 2, 3, 4, 5, 6, 7, 3]),
                font="F7")
    p.put_codes(72, 130, 12, bytes([9, 8, 16, 17, 18, 19]),
                font="F7")
    p.put_words(72, 160, 12, ["regular", "font", "text", "beside",
                              "the", "glyph", "procedures"])
    _lines(p, [ln.split() for ln in _BODY_EN], y0=220.0)
    return build_pdf([p], type3_glyphs=glyphs)


def _pdf_ocg_layers() -> bytes:
    """Optional-content layers (ISO 32000 §8.11): a hidden
    alternate-language layer (default-OFF in /OCProperties /D /OFF)
    must not leak into the extraction — a conforming reader does not
    draw it; a default-ON layer's content is real drawn text and
    stays. The /OC spans use the named-resource property form
    Acrobat emits."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put(72, 180, 12, "annotation layer note kept visible",
          oc="ReviewNotes")
    p.put(72, 210, 12, "texte alternatif masqué jamais extrait",
          oc="FrenchAlt")
    p.put(72, 240, 12, "body continues after the layered region")
    return build_pdf(
        [p], ocg_layers={"ReviewNotes": True, "FrenchAlt": False}
    )


def _pdf_section_numbers() -> bytes:
    p = PageSpec()
    p.put(72, 100, 12, "1.2")
    p.put_words(110, 100, 12, ["Section", "heading", "kept", "always"])
    p.put(72, 130, 12, "(3)")
    p.put_words(110, 130, 12, ["Enumerated", "item", "stays", "present"])
    p.put(72, 160, 12, "①")
    p.put_words(110, 160, 12, ["Circled", "number", "section", "marker"])
    p.put(72, 190, 12, "第2章")
    p.put_words(140, 190, 12, ["日本語の章見出しはここから始まります"])
    p.put(300, 30, 10, "7")     # isolated digit in top margin → dropped
    p.put(300, 770, 10, "42")   # isolated digit in bottom margin → dropped
    p.put_words(72, 300, 12, ["Body", "continues", "with", "normal",
                              "running", "text", "for", "padding", "rows"])
    return build_pdf([p])


def _pdf_footnotes() -> bytes:
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put_words(72, 180, 12, ["claim", "with", "marker"])
    p.put(260, 180, 8, "*1")
    p.put_words(72, 210, 12, ["second", "claim", "here"])
    p.put(250, 210, 8, "※")
    # bottom region definitions (kept by footnote-ish margin rule)
    p.put(72, 730, 9, "*1:")
    p.put_words(100, 730, 9, ["first", "footnote", "definition", "text"])
    p.put(72, 745, 9, "※")
    p.put_words(100, 745, 9, ["second", "footnote", "definition", "spanning"])
    p.put_words(100, 758, 9, ["a", "second", "line", "of", "definition"])
    return build_pdf([p])


def _pdf_scripts() -> bytes:
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put(72, 200, 12, "H")
    p.put(80, 204, 6, "2")      # subscript-sized, below middle
    p.put(88, 200, 12, "O")
    p.put(130, 200, 12, "x")
    p.put(137, 198, 6, "2")     # superscript-sized, above middle
    return build_pdf([p])


def _pdf_mixed_spacing() -> bytes:
    """JP↔EN alternating tokens with controlled gaps 1/3/5/12 px —
    exercises every W2 branch."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    y = 200.0
    p.put(72, y, 12, "word")
    p.put(97, y, 12, "next")       # gap 1 → no space
    p.put(124, y, 12, "far")       # gap 3 → no space (EN needs >3)
    p.put(147, y, 12, "apart")     # gap 5 → space
    y2 = 230.0
    p.put(72, y2, 12, "日本")
    p.put(101, y2, 12, "語句")      # gap 5 JP↔JP → no space
    p.put(137, y2, 12, "間隔")      # gap 12 JP↔JP → space
    p.put(164, y2, 12, "。")        # punct → no space
    return build_pdf([p])


def _pdf_join_lines() -> bytes:
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put(72, 200, 12, "この文は助詞の")          # ends with particle の → join
    p.put(72, 220, 12, "続きであり一文です。")     # terminator ends
    p.put_words(72, 250, 12, ["ends", "with", "comma,"])
    p.put_words(72, 270, 12, ["so", "it", "joins", "here."])
    p.put_words(72, 300, 12, ["Terminated", "line", "stays", "alone."])
    p.put_words(72, 320, 12, ["-", "bullet", "line", "never", "joins"])
    return build_pdf([p])


def _pdf_table() -> bytes:
    """4 rows × 3 aligned columns (strict-mode grid, C5/C6/F10/F6) plus
    running body text above — exercises detection, word exclusion (P8),
    and page-end insertion (O5/trap 2)."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    cols_x = [72.0, 220.0, 380.0]
    header = ["Item", "Amount", "Status"]
    rows = [
        ["alpha", "120", "ok"],
        ["beta", "45", "ok"],
        ["gamma", "300", "late"],
    ]
    y = 300.0
    for cx, cell in zip(cols_x, header):
        p.put(cx, y, 12, cell)
    for r, row in enumerate(rows):
        for cx, cell in zip(cols_x, row):
            p.put(cx, y + 25 * (r + 1), 12, cell)
    p.put_words(72, 450, 12, ["text", "after", "the", "grid", "keeps",
                              "flowing", "in", "the", "body", "stream"])
    return build_pdf([p])


def _pdf_footnote_match() -> bytes:
    """Markers of several families matched to bottom-region definitions
    across two pages (J3 greedy scoring + A5 completeness)."""
    p1 = PageSpec()
    _lines(p1, [ln.split() for ln in _BODY_EN])
    p1.put_words(72, 200, 12, ["statement", "cites"])
    p1.put(200, 200, 8, "[1]")
    p1.put_words(72, 230, 12, ["another", "claim"])
    p1.put(190, 230, 8, "注1")
    p1.put(72, 700, 9, "[1]")
    p1.put_words(100, 700, 9, ["bracket", "definition", "on", "same", "page"])
    p1.put(72, 720, 9, "注1")
    p1.put_words(110, 720, 9, ["kanji", "note", "definition", "text"])
    p2 = PageSpec()
    _lines(p2, [ln.split() for ln in _BODY_EN])
    p2.put_words(72, 200, 12, ["dagger", "reference"])
    p2.put(220, 200, 8, "†")
    p2.put(72, 700, 9, "†")
    p2.put_words(100, 700, 9, ["dagger", "definition", "lives", "here"])
    p2.put_words(100, 715, 9, ["and", "continues", "on", "a", "second",
                               "line"])
    return build_pdf([p1, p2])


def _pdf_footnote_unmatched() -> bytes:
    """D4 / ADVICE-r1: a bottom-region definition with NO body marker
    must still reach the output (the reference emits ALL definitions,
    master_extractor.py:352-390), and a body marker with no definition
    lands in ``unmatched_markers`` — one matched pair for contrast."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put_words(72, 200, 12, ["matched", "claim"])
    p.put(200, 200, 8, "*1")
    p.put_words(72, 230, 12, ["dangling", "reference"])
    p.put(220, 230, 8, "[9]")            # no definition anywhere
    p.put(72, 700, 9, "*1:")
    p.put_words(100, 700, 9, ["matched", "definition", "body", "text"])
    p.put(72, 730, 9, "※")               # definition with no body marker
    p.put_words(100, 730, 9, ["orphan", "definition", "must", "not",
                              "vanish"])
    return build_pdf([p])


def _pdf_ocr_confusions() -> bytes:
    """F7: planted OCR confusions (rn / Il1 / O0 / digit-in-word /
    broken affixes). DEFAULT config keeps them verbatim (the fix chain
    is off by default, like reference LLM verification); the ocrfix
    tests pin the chain's output on this extraction."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put_words(72, 200, 12, ["Th1s", "mis5ing", "c0nnect", "needs",
                              "fixing", "badly"])
    p.put_words(72, 230, 12, ["process", "ing", "then", "dis", "connect",
                              "cleanly"])
    p.put_words(72, 260, 12, ["rnany", "Il1", "O0", "stay", "flagged",
                              "unfixed"])
    return build_pdf([p])


def _pdf_zorder() -> bytes:
    """Duplicate boxes at the same rounded position (D1 dedup) and a
    half-overlapping pair (J5 z-order flag)."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put(72, 200, 12, "doubled")
    p.put(72.04, 200.02, 12, "doubled")      # D1: same rounded key → dropped
    p.put(200, 300, 12, "overlapping")
    p.put(210, 300, 12, "overlapping")       # J5: >50% overlap → flagged
    p.put_words(72, 400, 12, ["trailing", "body", "words", "keep", "the",
                              "page", "above", "the", "scanned", "gate"])
    return build_pdf([p])


def _pdf_sidebar() -> bytes:
    """Right-strip note box separated from main content by a wide
    gutter (C7 detection + F11 classification); page width 612 ⇒ right
    strip starts at x ≥ 489.6."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put_words(72, 200, 12, ["main", "body", "column", "ends", "well",
                              "before", "the", "gutter"])
    p.put(495, 100, 10, "Note:")
    p.put(495, 115, 10, "sidebar")
    p.put(495, 130, 10, "content")
    p.put(495, 145, 10, "here")
    return build_pdf([p])


def _pdf_empty_page() -> bytes:
    p1 = PageSpec()
    _lines(p1, [ln.split() for ln in _BODY_EN])
    p1.put_words(72, 180, 12, ["before", "the", "empty", "page", "comes",
                               "this", "full", "text", "row", "here"])
    p2 = PageSpec()  # zero words
    p3 = PageSpec()
    _lines(p3, [ln.split() for ln in _BODY_EN])
    p3.put_words(72, 180, 12, ["after", "the", "empty", "page", "comes",
                               "this", "full", "text", "row", "too"])
    return build_pdf([p1, p2, p3])


def _pdf_scanned() -> bytes:
    p1 = PageSpec()
    _lines(p1, [ln.split() for ln in _BODY_EN])
    p1.put_words(72, 180, 12, ["normal", "page", "before", "the", "scanned",
                               "one", "with", "many", "words", "present"])
    p2 = PageSpec()
    p2.put_words(72, 100, 12, ["only", "four", "words", "here"])  # < 10
    return build_pdf([p1, p2])


def _pdf_rotated() -> bytes:
    p1 = PageSpec(rotate=90)
    _lines(p1, [ln.split() for ln in _BODY_EN])
    p1.put_words(72, 180, 12, ["rotated", "page", "content", "is", "still",
                               "extracted", "and", "only", "flagged", "ok"])
    return build_pdf([p1])




def _pdf_type0_predefined() -> bytes:
    """Type0 font whose /Encoding names a PREDEFINED CJK CMap
    (UniJIS-UCS2-H) with NO /ToUnicode — the dominant real-Japanese-PDF
    layout (round-3 verdict "Next round" #5). Codes are the UCS-2
    values themselves; extraction must decode them without any
    embedded map."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put_codes(
        72, 170, 12, _BODY_JA[0].encode("utf-16-be"),
        font="F6", hex_show=True,
    )
    p.put_codes(
        72, 190, 12, _BODY_JA[1].encode("utf-16-be"),
        font="F6", hex_show=True,
    )
    p.put_words(72, 220, 12, ["predefined", "cmap", "text", "decodes",
                              "without", "embedded", "tounicode", "maps",
                              "present", "anywhere"])
    return build_pdf([p], predefined_cmap="UniJIS-UCS2-H")


def _pdf_vertical_jp() -> bytes:
    """Tategaki (vertical writing, WMode 1): a Type0 font whose
    /Encoding names the predefined UniJIS-UCS2-V CMap. Columns stack
    glyphs top-to-bottom and read RIGHT-TO-LEFT — the dominant layout
    of Japanese books and magazines (the reference's own domain). The
    first column is split across two show operations and must rejoin
    as one line; reading order across columns is pinned by the
    golden."""
    p = PageSpec()
    p.put_codes(
        480, 100, 12, "上半分の六文字".encode("utf-16-be"),
        font="F6", hex_show=True,
    )
    p.put_codes(
        480, 100 + 12 * 7, 12, "下半分も同じ列".encode("utf-16-be"),
        font="F6", hex_show=True,
    )
    cols = [
        "二列目は右から左へ読み進む日本の書籍の標準的な形",
        "三列目には本文の続きがあり抽出は決定的である",
        "四列目も同じ幅で下へ向かって文字が並んでいく",
        "五列目は段組の途中にあり前後の列と揃っている",
        "六列目の内容も一文字ずつ縦に積まれて表示される",
        "七列目は終盤に近づき文章がまとまりつつある",
        "八列目は結びの列であり本文はここで完結する",
        "九列目は奥付に相当する短い付記である",
        "十列目まで読めば頁の全体が確認できたことになる",
        "最後の列で確認は終わり抽出結果は常に同一です",
    ]
    for i, c in enumerate(cols):
        p.put_codes(
            460 - 20 * i, 100, 12, c.encode("utf-16-be"),
            font="F6", hex_show=True,
        )
    return build_pdf([p], predefined_cmap="UniJIS-UCS2-V")


def _pdf_mixed_direction() -> bytes:
    """The dominant mixed JP magazine layout: a HORIZONTAL headline
    above a tategaki (vertical) body, and a horizontal folio line
    BELOW it. Horizontal words carry real page coordinates, vertical
    words the rotated virtual frame — the golden pins that the three
    reading groups never interleave: headline first, then the
    vertical columns right-to-left, then the folio."""
    p = PageSpec()
    p.put_words(
        72, 40, 14,
        ["mixed", "writing", "mode", "headline", "reads", "first",
         "before", "the", "vertical", "body"],
    )
    cols = [
        "縦書き本文の一列目は右端から始まる",
        "二列目は左隣で本文の続きを述べている",
        "三列目まで読めば本文は完結しています",
    ]
    for i, c in enumerate(cols):
        p.put_codes(
            480 - 24 * i, 110, 12, c.encode("utf-16-be"),
            font="F6", hex_show=True,
        )
    p.put_words(
        72, 700, 10,
        ["folio", "caption", "line", "reads", "after", "the",
         "vertical", "body"],
    )
    return build_pdf([p], predefined_cmap="UniJIS-UCS2-V")


def _pdf_rtl_bidi() -> bytes:
    """RTL (Hebrew/Arabic) pages are stored in VISUAL order — the
    logically-first word at the largest x, each word's characters
    reversed — because the writer laid the page out after bidi
    reordering. The golden pins visual→logical recovery
    (``operators/bidi.py``): full RTL-base lines reverse at unit
    level with embedded Latin/digit islands kept LTR as blocks,
    LTR-base lines reflect only their RTL runs, paired brackets
    mirror, digits inside an RTL word stay LTR, and Arabic
    presentation forms (the SHAPED glyphs writers embed,
    U+FB50-FEFC) fold back to base letters. Each line below is the
    byte-literal VISUAL layout; the golden holds the logical text."""
    p = PageSpec()
    # RTL-base: logical "שלום עולם HTML טוב מאוד היום"
    # (Latin island HTML keeps LTR position semantics as a block)
    p.put_words(
        72, 100, 12,
        ["םויה", "דואמ", "בוט", "HTML", "םלוע", "םולש"],
    )
    # LTR-base with one embedded RTL run: logical
    # "the word ראשון שני appears in this sentence"
    p.put_words(
        72, 130, 12,
        ["the", "word", "ינש", "ןושאר", "appears", "in", "this",
         "sentence"],
    )
    # mirrored brackets: logical "before (שלום עולם) after the parens"
    p.put_words(
        72, 160, 12,
        ["before", "(םלוע", "םולש)", "after", "the", "parens"],
    )
    # digits stay LTR inside an RTL word: logical "page דף123 has ..."
    p.put_words(
        72, 190, 12,
        ["page", "123ףד", "has", "numbers", "kept", "inside"],
    )
    # Arabic presentation forms, visual order: logical
    # "مرحبا بالعالم words keep their order"
    p.put_words(
        72, 220, 12,
        ["ملاعلاب", "ﻣﺮﺣﺒﺎ"[::-1], "words", "keep", "their", "order"],
    )
    # neutral (punctuation-only) box between two RTL words joins the
    # run (UAX #9 N1): logical "אחד — שתיים ends the body here"
    p.put_words(
        72, 250, 12,
        ["םייתש", "—", "דחא", "ends", "the", "body", "here"],
    )
    return build_pdf([p])


def _pdf_string_syntax() -> bytes:
    """Literal-string syntax real writers emit but the canonical
    writer never does (ISO 32000 §7.3.4.2): nested BALANCED parens
    (legal unescaped), ``\\<EOL>`` line continuations wrapping long
    strings (contribute no bytes), and raw EOLs inside a literal
    (each is the single byte 0x0A regardless of on-disk form)."""
    p = PageSpec()
    p.put_words(
        72, 100, 12,
        ["string", "syntax", "page", "with", "plenty", "of", "body",
         "words", "here"],
    )
    p.put_raw_shown(72, 130, 12, "(see section (ii) and (iii) below)")
    p.put_raw_shown(
        72, 145, 12, "(wrapped \\\nacross three \\\r\nphysical lines)"
    )
    p.put_raw_shown(72, 160, 12, "(raw\r\nbreak)")
    p.put_words(
        72, 190, 12,
        ["closing", "words", "keep", "the", "page", "dense", "enough"],
    )
    return build_pdf([p])


def _pdf_hybrid_xref() -> bytes:
    """Hybrid-reference layout (ISO 32000 §7.5.8.4, the Acrobat
    1.4-compatibility format): startxref names a CLASSIC table whose
    trailer carries /XRefStm; the page dictionaries live in an
    /ObjStm reachable only through the stream, and the classic table
    lists them FREE — a reader that tombstones those free entries
    before honoring the stream loses every page."""
    from ..operators.pdf_generator import build_pdf_hybrid

    pages = []
    for pno in range(2):
        p = PageSpec()
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put_words(
            72, 190, 12,
            ["hybrid", "reference", "page", f"number{pno + 1}",
             "body", "stays", "dense"],
        )
        pages.append(p)
    return build_pdf_hybrid(pages, compress=True)


def _pdf_info_outline() -> bytes:
    """Document metadata alongside text (ISO 32000 §14.3.3 /Info,
    §12.3.3 /Outlines): an /Info dict with both text-string spellings
    (ASCII literal, UTF-16BE-BOM hex) and a nested outline whose last
    top-level item's /Next points back at the first — the
    malformed-writer ring.  The golden pins that metadata objects
    never leak into or cost the extracted text, and that the ring
    yields exactly one warning, never a spin or a critical."""
    pages = []
    for pno in range(2):
        p = PageSpec()
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put_words(
            72, 190, 12,
            ["metadata", "case", "page", f"number{pno + 1}", "body",
             "stays", "dense", "enough"],
        )
        pages.append(p)
    return build_pdf(
        pages,
        info={"Title": "Fixture Report 7", "Author": "Ōe Kenzaburō",
              "Subject": "metadata (with) parens", "Producer": "fw/2"},
        outline=[(0, "Introduction"), (1, "背景"), (1, "Scope"),
                 (0, "Methods"), (0, "Results"), (1, "Details")],
        outline_cycle=True,
    )


def _pdf_astral_tounicode() -> bytes:
    """Supplementary-plane /ToUnicode destinations (emoji, rare
    ideographs): bfchar entries whose UTF-16BE values are surrogate
    PAIRS (4 bytes, not 2), and a scalar bfrange whose base is an
    astral char — the Adobe CMap increment applies to the LAST code
    unit, i.e. the low surrogate. Real JP/social-crawl PDFs carry
    both shapes; a UCS-2-only decoder emits lone surrogates or U+FFFD
    here."""
    p = PageSpec()
    p.put_words(
        72, 100, 12,
        ["astral", "plane", "destinations", "exercise", "surrogate",
         "pair", "decoding"],
    )
    # CID font: each code maps to one astral char via bfchar
    p.put_codes(
        72, 130, 12, b"\x00\x01\x00\x02\x00\x03", font="F4",
        hex_show=True,
    )
    # simple font: bfrange base 😀 increments the low surrogate
    p.put_codes(72, 145, 12, b"abcd")
    p.put_words(
        72, 175, 12,
        ["closing", "plain", "words", "end", "the", "page"],
    )
    return build_pdf(
        [p],
        tounicode_ranges=[(0x61, 0x64, "😀")],
        cid_tounicode_chars={0x0001: "🚀", 0x0002: "𠮟", 0x0003: "る"},
    )


# ------------------------------------------------------------ HTML cases

def _encrypted_pages() -> list[PageSpec]:
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put(72, 170, 12, _BODY_JA[0])
    p.put_words(72, 200, 12,
                ["readable", "after", "standard", "security", "decrypt"])
    return [p]


def _pdf_encrypted_rc4() -> bytes:
    """RC4-128 standard security, empty user password (the dominant
    owner-restricted-but-readable web case) — tokenizer must decrypt
    and extract identically to the unencrypted twin."""
    return build_pdf(_encrypted_pages(), compress=True, encrypt="rc4-128")


def _pdf_encrypted_aes() -> bytes:
    """AES-128 (/V 4 /CFM /AESV2) variant of the same page."""
    return build_pdf(_encrypted_pages(), compress=True, encrypt="aes-128")


def _pdf_custom_widths() -> bytes:
    """Simple font with DECLARED metrics (/FirstChar + /Widths,
    §9.6.2.1): a narrow 250-unit space and 900-unit glyphs — word-box
    geometry and gap-based line assembly must follow the table, not
    the built-in width model (real crawls' fonts rarely match any
    fixed model). Mixed with a model-width line as control."""
    first = 0x20
    ws = [400.0] + [900.0] * (0x7F - 0x21)
    p = PageSpec()
    p.put_codes(72, 100, 12, b"metric driven words here", font="F8")
    p.put_codes(72, 118, 12, b"second line of wide glyphs", font="F8")
    p.put(72, 160, 12, "model width control line")
    return build_pdf([p], compress=True, widths_font=(first, ws))


def _pdf_cid_widths() -> bytes:
    """Type0/Identity-H font whose descendant declares /DW + /W
    proportional metrics (§9.7.4.3): hiragana at 500 units against
    the 1000 default — the dominant real-JP-writer shape (kana are
    proportional in modern fonts). Advances, and therefore line
    assembly, must follow the declared widths."""
    cid_w = (1000.0, [(0x3041, 0x3093, 500.0)])
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put(72, 170, 12, _BODY_JA[0])
    p.put(72, 190, 12, _BODY_JA[1])
    p.put(72, 210, 12, "かなの行はプロポーショナル幅で流れます")
    return build_pdf([p], compress=True, cid_widths=cid_w)


def _pdf_mac_roman() -> bytes:
    """Legacy Mac writer: a simple font with name-form /Encoding
    /MacRomanEncoding — high bytes are MacRoman (0x8E é, 0xA5 •),
    NOT WinAnsi. Mixed with a WinAnsi line as control."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put_codes(
        72, 170, 12,
        "r\x8esum\x8e caf\x8e \xa5menu".encode("latin-1"),
        font="F9",
    )
    p.put(72, 200, 12, "winansi control naïve line")
    return build_pdf([p], compress=True, mac_roman_font=True)


def _pdf_ocr_layer() -> bytes:
    """Scanned-page shape: the only text is an INVISIBLE OCR layer
    (text rendering mode 3, §9.3.6) laid over where the page image
    would sit, plus one visible caption. The extractor keeps the OCR
    text (it is the only text the page has — pdfminer-family
    behavior) and flags the page ``invisible_text`` so quality
    scoring can discount it."""
    p = PageSpec()
    p.put(72, 100, 12, "The quick brown fox jumps over", render_mode=3)
    p.put(72, 118, 12, "the lazy dog in scanned form.", render_mode=3)
    p.put(72, 160, 10, "Figure 1: digitized page", render_mode=0)
    return build_pdf([p], compress=True)


def _pdf_encrypted_aes256() -> bytes:
    """AES-256 (/V 5 /R 6 /CFM /AESV3 — PDF 2.0) in the modern
    xref-stream + ObjStm layout: the hardened-hash (Algorithm 2.B)
    key derivation, /UE key unwrap and file-key-direct object
    decryption, empty user password."""
    return build_pdf(_encrypted_pages(), compress=True,
                     xref_stream=True, encrypt="aes-256")


def _pdf_tounicode() -> bytes:
    """Custom-encoded fonts: a simple font whose 1-byte codes decode
    through a /ToUnicode CMap (bfchar incl. multi-char ligature dst +
    scalar bfrange) and a Type0 CID font with a 2-byte CMap."""
    p = PageSpec()
    p.put_words(72, 100, 12, ["standard", "winansi", "words", "first"])
    p.put_codes(72, 130, 12, b"ABC")        # bfchar -> "Map"
    p.put_codes(140, 130, 12, b"D")         # ligature dst -> "fi"
    p.put_codes(200, 130, 12, b"abcde")     # bfrange -> "ABCDE"
    p.put_codes(
        72, 160, 12, b"\x00\x01\x00\x02\x00\x03", font="F4",
        hex_show=True,                       # CID cmap -> 日本語
    )
    p.put_words(72, 190, 12, ["closing", "plain", "line", "here"])
    return build_pdf(
        [p],
        tounicode_chars={0x41: "M", 0x42: "a", 0x43: "p", 0x44: "fi"},
        tounicode_ranges=[(0x61, 0x7A, "A")],
        cid_tounicode_chars={0x0001: "日", 0x0002: "本", 0x0003: "語"},
    )


def _pdf_inherited_split() -> bytes:
    """Real-writer layout quirks: /MediaBox + /Resources live only on
    the root /Pages node (attribute inheritance, ISO 32000 §7.7.3.4)
    and each page's content is a /Contents ARRAY of three Flate
    streams."""
    pages = []
    for pno in range(2):
        p = PageSpec()
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put(72, 170, 12, _BODY_JA[0])
        p.put_words(72, 200, 12,
                    ["inherited", "attributes", "page",
                     "number{}".format(pno + 1)])
        pages.append(p)
    return build_pdf(pages, compress=True, inherit_attrs=True,
                     content_parts=3)


def _pdf_incremental() -> bytes:
    """Incrementally-updated document (ISO 32000 §7.5.6): a base page
    plus two appended "Save" revisions — /Prev-chained xref sections,
    the /Pages node shadowed twice."""
    from pdf_extractor_spark.operators.pdf_generator import (
        incremental_add_page,
    )

    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    p.put_words(72, 200, 12, ["revision", "one", "base"])
    data = build_pdf([p], compress=True)
    for n in (2, 3):
        q = PageSpec()
        _lines(q, [ln.split() for ln in _BODY_EN])
        q.put_words(72, 200, 12, ["revision", _NUM_WORDS[n], "appended"])
        data = incremental_add_page(data, q, compress=(n == 3))
    return data


_NUM_WORDS = {2: "two", 3: "three"}


def _pdf_letterhead() -> bytes:
    """Real-writer composition quirks: every page paints a shared
    /Form XObject letterhead via ``Do`` and carries an inline image
    (BI..EI) whose binary payload contains token-lookalike bytes."""
    pages = []
    for pno in range(2):
        p = PageSpec(inline_image=True)
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put_words(72, 200, 12,
                    ["letter", "body", "page", f"number{pno + 1}"])
        pages.append(p)
    return build_pdf(pages, compress=True,
                     header_xobject=["Fixture", "Corp", "letterhead"])


def _pdf_encrypted_modern() -> bytes:
    """The layout current writers emit: xref stream + ObjStm +
    AES-128 standard security (empty user password), /Encrypt
    referenced from the XRef stream dict."""
    pages = []
    for pno in range(2):
        p = PageSpec()
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put(72, 170, 12, _BODY_JA[0])
        p.put_words(72, 200, 12,
                    ["modern", "secure", "page", f"number{pno + 1}"])
        pages.append(p)
    return build_pdf(pages, compress=True, xref_stream=True,
                     encrypt="aes-128")


def _pdf_truncated() -> bytes:
    """Crawl-truncated payload: a 3-page Flate document cut at 70% —
    xref gone (object-scan recovery), last object unterminated, its
    content stream salvaged as a decoded prefix."""
    pages = []
    for pno in range(3):
        p = PageSpec()
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put_words(72, 200, 12,
                    ["truncation", "page", f"number{pno + 1}"])
        pages.append(p)
    data = build_pdf(pages, compress=True)
    return data[: int(len(data) * 0.7)]


def _pdf_differences() -> bytes:
    """Non-embedded custom-encoding font: /Encoding /Differences
    remaps high codes to accented glyph names (no /ToUnicode) — text
    recoverable only through the AGL (ISO 32000 §9.6.6.3)."""
    p = PageSpec()
    _lines(p, [ln.split() for ln in _BODY_EN])
    # "café déjà-vu résumé" shown with codes 0x80→eacute, 0x81→agrave
    p.put_codes(72, 170, 12, b"caf\x80 d\x80j\x81-vu r\x80sum\x80",
                font="F5")
    p.put_codes(72, 200, 12, b"quote \x82here\x83 end", font="F5")
    return build_pdf(
        [p],
        differences={0x80: "eacute", 0x81: "agrave",
                     0x82: "quotedblleft", 0x83: "quotedblright"},
    )


def _pdf_lzw() -> bytes:
    """Pre-Flate-era writer: content streams carry /LZWDecode — the
    filter old crawled PDFs use (ISO 32000 §7.4.4)."""
    pages = []
    for pno in range(2):
        p = PageSpec()
        _lines(p, [ln.split() for ln in _BODY_EN])
        p.put(72, 170, 12, _BODY_JA[0])
        p.put_words(72, 200, 12,
                    ["lzw", "coded", "page", f"number{pno + 1}"])
        pages.append(p)
    return build_pdf(pages, compress="lzw")


def _html_sjis_meta() -> bytes:
    """Legacy-charset page: Shift_JIS body declared via <meta charset>
    (WHATWG sniffing resolves the label to cp932/windows-31j)."""
    return (
        '<html><head><meta charset="Shift_JIS"><title>記事</title></head>'
        "<body><nav><a href='/'>ホーム</a> <a href='/a'>一覧</a></nav>"
        "<article><h1>文字コード判定の検証</h1>"
        "<p>シフトJISで符号化された本文段落であり、密度規則が本文と"
        "分類するのに十分な長さを持つ日本語テキストです。</p>"
        "<p>第二段落も同じ符号化で続き、複数ブロックの抽出が安定した"
        "オフセットで直列化されることを確認します。</p>"
        "</article></body></html>"
    ).encode("cp932")


def _html_win1252() -> bytes:
    """Legacy-charset page: windows-1252 declared via the http-equiv
    form; includes 0x93/0x94 curly quotes (C1 controls in latin-1 —
    the WHATWG iso-8859-1 → cp1252 remap is observable)."""
    return (
        b"<html><head><meta http-equiv='Content-Type' "
        b"content='text/html; charset=iso-8859-1'></head><body>"
        b"<article><h1>Smart Quotes in Legacy Pages</h1>"
        b"<p>He said \x93the archive predates the standard\x94 and the "
        b"caf\xe9 discussion ran long \x96 a body paragraph easily past "
        b"the short-block threshold.</p>"
        b"<p>A second paragraph keeps the multi-block structure with "
        b"another clean stretch of genuine readable content.</p>"
        b"</article></body></html>"
    )


def _html_utf16() -> bytes:
    """UTF-16LE page with BOM and no meta declaration — the BOM alone
    must route the decode."""
    return b"\xff\xfe" + (
        "<html><body><article><h1>Sixteen-Bit Pages</h1>"
        "<p>A UTF-16 encoded article body that only the byte-order "
        "mark identifies, long enough to classify as main content.</p>"
        "<p>日本語も混在する第二段落で、二バイト表現の往復を確認"
        "します。Additional English tail keeps it long.</p>"
        "</article></body></html>"
    ).encode("utf-16-le")


def _html_http_response() -> bytes:
    """WARC-response-style payload: HTTP status line + headers ahead
    of a gzip body, charset in the Content-Type header (outranks the
    document's own wrong <meta>)."""
    import gzip

    body = (
        "<html><head><meta charset='utf-8'><title>Wire</title></head>"
        "<body><article><h1>Served Over The Wire</h1>"
        "<p>He said \x93the response headers carry the truth\x94 and "
        "the paragraph keeps going long enough to clear the "
        "short-block threshold easily.</p>"
        "<p>A second substantial paragraph continues the article "
        "body with stable offsets after transport stripping.</p>"
        "</article></body></html>"
    ).encode("latin-1")  # cp1252 bytes — the meta lies, the header doesn't
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=windows-1252\r\n"
        b"Content-Encoding: gzip\r\n"
        b"Server: fixture\r\n\r\n"
        + gzip.compress(body, mtime=0)
    )


def _html_divsoup() -> bytes:
    """Modern div-soup page: boilerplate marked only by class/id
    hints (navbar, cookie banner, ads, footer) — no semantic tags."""
    return (
        "<html><head><title>Divsoup</title></head><body>"
        "<div class='site-header'><div class='navbar'>"
        "<a href='/'>Home</a> <a href='/shop'>Shop</a> "
        "<a href='/blog'>Blog</a> <a href='/help'>Help</a></div></div>"
        "<div id='cookie-banner'><div>We use cookies to improve your "
        "experience on this website please accept our policy</div></div>"
        "<div class='main-content'>"
        "<div class='article-title'><h1>Life Inside Div Soup</h1></div>"
        "<div class='article-body'><p>Main content paragraphs carry "
        "the real article text and are long enough to be classified "
        "as content by the density rules.</p>"
        "<p>A second substantial paragraph continues the article body "
        "and demonstrates multi-block serialization with stable "
        "offsets.</p></div>"
        "<div class='ad-container'><div>Sponsored limited time offer "
        "buy now incredible deal do not miss out</div></div>"
        "</div>"
        "<div id='page-footer'><div>Copyright Terms Privacy Imprint "
        "Contact Careers Press Media Kit Sitemap</div></div>"
        "</body></html>"
    ).encode("utf-8")


def _html_gzip() -> bytes:
    """gzip transport wrapper (WARC-body layout): the article arrives
    as a gzip member; routing strips it before branch sniffing."""
    import gzip

    return gzip.compress(_html_article(), mtime=0)


def _html_warc_capture() -> bytes:
    """A whole WARC capture as the page payload (crawl dumps emit
    these): per-record gzip members — warcinfo, request, then the
    article as a chunked + Content-Encoding:gzip HTTP response, then
    a DECOY second response that must be ignored (the router unwraps
    only the first response record)."""
    import gzip

    from ..sources.warc import http_response, warc_record

    url = "https://fixture.test/html/html-warc-capture"
    recs = (
        warc_record("warcinfo", {
            "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-0000000000f0>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "Content-Type": "application/warc-fields",
        }, b"software: fixture writer\r\n"),
        warc_record("request", {
            "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-0000000000f1>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Target-URI": url,
            "Content-Type": "application/http; msgtype=request",
        }, b"GET /html/html-warc-capture HTTP/1.1\r\n"
           b"Host: fixture.test\r\n\r\n"),
        warc_record("response", {
            "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-0000000000f2>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Target-URI": url,
            "Content-Type": "application/http; msgtype=response",
        }, http_response(_html_article(), chunked=True, gzip_body=True)),
        warc_record("response", {
            "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-0000000000f3>",
            "WARC-Date": "2024-01-01T00:00:01Z",
            "WARC-Target-URI": url + "/decoy",
            "Content-Type": "application/http; msgtype=response",
        }, http_response(b"<html><body><p>decoy capture that must "
                         b"not surface</p></body></html>")),
    )
    return b"".join(gzip.compress(r, mtime=0) for r in recs)


def _html_article() -> bytes:
    return (
        "<html><head><title>Article</title><style>p{margin:0}</style></head>"
        "<body><nav><a href='/'>Home</a> <a href='/a'>Archive</a> "
        "<a href='/c'>Contact</a></nav>"
        "<article><h1>Deterministic Extraction at Scale</h1>"
        "<p>Main content paragraphs carry the real article text and are "
        "long enough to be classified as content by the density rules.</p>"
        "<p>A second substantial paragraph continues the article body and "
        "demonstrates multi-block serialization with stable offsets.</p>"
        "</article>"
        "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a> "
        "<a href='/i'>Imprint</a></footer></body></html>"
    ).encode("utf-8")


def _html_linkfarm() -> bytes:
    links = " ".join(f"<a href='/l{i}'>link number {i}</a>" for i in range(30))
    return (
        "<html><body><div>" + links + "</div>"
        "<p>The single honest paragraph in a farm of links survives "
        "because its own link density is zero and it is long.</p>"
        "</body></html>"
    ).encode("utf-8")


def _html_mixed_lang() -> bytes:
    return (
        "<html><body><p>日本語の本文に English terms が混在する段落であり、"
        "十分な長さを持つため本文として保持されます。</p>"
        "<p>Short tail.</p></body></html>"
    ).encode("utf-8")


def _html_tables_lists() -> bytes:
    return (
        "<html><body><h2>Results Table</h2>"
        "<table><tr><td>metric one value column entry text</td>"
        "<td>metric two value column entry text</td></tr></table>"
        "<ul><li>first list item with enough characters to stand alone</li>"
        "<li>second list item with enough characters to stand alone</li></ul>"
        "</body></html>"
    ).encode("utf-8")


def _html_entities() -> bytes:
    return (
        "<html><body><p>Entities &amp; escapes like &#x3042; and &lt;tags&gt; "
        "decode deterministically inside this long paragraph of text.</p>"
        "</body></html>"
    ).encode("utf-8")


def _html_invisible_chars() -> bytes:
    """Invisible formatting codepoints: soft hyphens (&shy;), zero-
    width space, word joiner, an in-body BOM, and the UAX #9 bidi
    controls (LRM/RLM/ALM marks, LRE..PDF embeds/overrides,
    LRI..PDI isolates) are stripped — a &shy;-riddled word must
    tokenize whole — while ZWJ survives (emoji sequences, Indic
    orthography are content)."""
    return (
        "<html><body><article>"
        "<p>The exceedingly long compound word "
        "hyphen\u00ado\u00adgraphy appears here inside a paragraph "
        "with enough words to be kept as genuine body text by the "
        "classifier.</p>"
        "<p>Zero\u200bwidth and word\u2060joiner and stray \ufeff "
        "marks vanish while the family emoji keeps its joiner: "
        "\U0001f468\u200d\U0001f469 stays intact in output.</p>"
        "<p>Bidi controls such as the mark pair \u200emarked\u200f "
        "and the isolate wrap \u2066isolated\u2069 and the "
        "override run \u202eoverridden\u202c never survive into "
        "extracted text because they carry direction hints only "
        "and make identical prose fingerprint differently.</p>"
        "</article></body></html>"
    ).encode("utf-8")


def _html_encoding_damage() -> bytes:
    """P11: U+FFFD damage inside kept content — flagged (encoding
    warning) AND scrubbed from the output, like the reference's
    flag+fix pair (error_handler.py:509-540)."""
    return (
        "<html><body>"
        "<p>A clean opening paragraph long enough to be kept as main "
        "content by the density rules of the classifier.</p>"
        "<p>dam�aged te�xt with enough length to stay kept "
        "as genuine article content after scrubbing.</p>"
        "</body></html>"
    ).encode("utf-8")


def _html_short_blocks() -> bytes:
    return (
        "<html><body>"
        "<p>A long opening paragraph of genuine content that anchors the "
        "neighbor-smoothing rule for the short block that follows.</p>"
        "<p>Short but kept.</p>"
        "<p>A long closing paragraph of genuine content that also anchors "
        "the short block and is itself clearly main content.</p>"
        "<div><a href='/x'>isolated nav link</a></div>"
        "<p>Orphan short.</p>"
        "</body></html>"
    ).encode("utf-8")


# --------------------------------------------- adversarial HTML cases
#
# Round-2 verdict item #9: the wrapper corpus above is clean; real
# crawl HTML is not. Each case pins the extractor's behavior on a
# specific pathology while still carrying unambiguous main content.

def _html_nested_tables() -> bytes:
    return (
        "<html><body>"
        "<table><tr><td>"
        "<table><tr><td><a href='/1'>home</a></td>"
        "<td><a href='/2'>about</a></td><td><a href='/3'>contact</a>"
        "</td></tr></table>"
        "</td></tr><tr><td>"
        "<p>The article body lives inside a layout table as countless "
        "legacy pages do and must still be recognized as content.</p>"
        "<table><tr><td>inner data cell one with enough prose to be "
        "kept as genuine tabular content</td>"
        "<td>inner data cell two also long enough to stand on its own "
        "as real content</td></tr></table>"
        "</td></tr></table>"
        "<p>A closing paragraph outside every table confirms the "
        "parser rebalanced the nesting correctly.</p>"
        "</body></html>"
    ).encode("utf-8")


def _html_script_heavy() -> bytes:
    js = (
        "var layout = '<div class=\"fake\"><p>markup inside a string "
        "must never surface</p></div>';\n"
        "if (x < 10 && y > 2) { document.write(layout); }\n"
    ) * 8
    css = "body { margin: 0; } .nav > li::after { content: '<p>'; }\n" * 6
    return (
        "<html><head><title>never extracted</title>"
        f"<style>{css}</style><script>{js}</script></head><body>"
        f"<script>{js}</script>"
        "<p>Real content paragraph one survives between the script "
        "islands and carries the page's actual message.</p>"
        f"<script type='module'>{js}</script>"
        "<noscript><p>noscript fallback must not surface</p></noscript>"
        "<template><p>template content must not surface</p></template>"
        "<p>Real content paragraph two closes the document after the "
        "last script block with more genuine prose.</p>"
        "</body></html>"
    ).encode("utf-8")


def _html_entity_storm() -> bytes:
    return (
        "<html><body>"
        "<p>Named entities: caf&eacute; r&eacute;sum&eacute; "
        "&lt;tag&gt; &amp; ampersand &quot;quoted&quot; "
        "&nbsp;spaced&nbsp;words and a long enough line to keep.</p>"
        "<p>Numeric forms: &#72;&#101;&#108;&#108;&#111; decimal and "
        "&#x4E16;&#x754C; hex plus &#9731; snowman all decode in "
        "place inside this kept paragraph.</p>"
        "<p>Hostile forms: double-encoded &amp;amp; stays literal, "
        "unknown &nosuch; passes through, bare & ampersand and "
        "truncated &#x survive without crashing the parser.</p>"
        "</body></html>"
    ).encode("utf-8")


def _html_unclosed_tags() -> bytes:
    return (
        "<HTML><BODY>"
        "<P>An unclosed uppercase paragraph streams straight into the "
        "next one and both must be segmented at the open tags alone"
        "<p>Second paragraph also never closed but clearly separate "
        "content with plenty of characters to be kept"
        "<ul><li>first unclosed item long enough to stand as content "
        "on its own line<li>second unclosed item equally long enough "
        "to be kept by the classifier</ul>"
        "<b><i>mis-nested inline tags</b></i> trailing prose continues "
        "the block after the bad nesting and keeps it long enough."
        "</div></div>"
        "<p align=center unquoted=yes>A final paragraph with unquoted "
        "attributes and stray closing divs before it still extracts."
        "</BODY></HTML>"
    ).encode("utf-8")



def _html_attr_quoting() -> bytes:
    """Malformed attribute quoting: an unterminated quote (browsers
    swallow the following prose into the attribute value — the
    extraction-oriented repair reclaims it), a quoted value containing
    angle brackets, unquoted values, and degenerate attributes."""
    return (
        "<html><body>"
        "<p class=\"lead unterminated>First paragraph whose class quote "
        "never closes yet the text here must survive and segment normally "
        "with plenty of body characters to stay classified as content.</p>"
        "<p data-note='it said >hello<' title=unquoted-value>Second "
        "paragraph carries a quoted attribute containing angle brackets "
        "and an unquoted value and keeps reading as one clean block of "
        "prose.</p>"
        "<p =stray-equals data->A third block after degenerate attributes "
        "still extracts with stable offsets and enough length to keep.</p>"
        "</body></html>"
    ).encode()


def _html_attr_long_value() -> bytes:
    """Quote-repair identity hazard: attribute values far beyond any
    fixed lookahead window (srcset lists, data-URIs) containing '>'
    — the repair pass must leave them untouched while STILL fixing a
    genuinely broken quote later in the same page."""
    srcset = ", ".join(
        f"https://cdn.example.test/img/asset-{i:04d}-{'x' * 40}.webp {w}w"
        for i, w in enumerate(range(320, 3201, 160))
    )
    data_uri = "data:image/png;base64," + "QUJDRA" * 120
    return (
        "<html><body><article>"
        f"<img srcset=\"{srcset}\" alt=\"hero > image, full bleed\">"
        "<p>The hero image above carries a srcset attribute far longer "
        "than any fixed repair window and a quoted angle bracket, and "
        "this paragraph must extract cleanly and completely.</p>"
        f"<img src=\"{data_uri}\" alt=\"inline thumb\">"
        "<p class=\"lead broken>The final paragraph sits behind an "
        "unterminated class quote and must still be reclaimed by the "
        "repair pass with stable offsets and full text.</p>"
        "</article></body></html>"
    ).encode()


def _html_cdata() -> bytes:
    """CDATA sections in HTML (bogus comments per WHATWG) plus a
    CDATA-wrapped script: neither may leak into extracted text."""
    return (
        "<html><body>"
        "<script>/*<![CDATA[*/ var x = '<p>not text</p>'; /*]]>*/</script>"
        "<article><p>A CDATA-wrapped script must contribute nothing while "
        "this real paragraph provides the extractable body of the page in "
        "one long readable block.</p>"
        "<![CDATA[ raw cdata in html is a bogus comment and is dropped ]]>"
        "<p>The second paragraph after the stray CDATA section continues "
        "the article with enough content to be kept by the classifier.</p>"
        "</article></body></html>"
    ).encode()


def _html_meta_refresh() -> bytes:
    """Meta-refresh interstitial: the redirect directive must not
    inject its URL into the text; the on-page prose still extracts."""
    return (
        "<html><head><meta http-equiv='refresh' "
        "content='0; url=https://example.test/moved'></head><body>"
        "<p>This page has moved. If you are not redirected automatically "
        "follow the link to the new location of the archived article.</p>"
        "<article><p>Legacy body content that remains on the interstitial "
        "page and should extract as ordinary text despite the refresh "
        "header directive above it.</p></article>"
        "</body></html>"
    ).encode()


def _html_bom_wrong_meta() -> bytes:
    """Double lie: UTF-8 BOM + a meta claiming Shift_JIS. WHATWG
    precedence says the BOM wins; decoding via the meta would mojibake
    the Japanese paragraphs."""
    return b"\xef\xbb\xbf" + (
        "<html><head><meta charset='Shift_JIS'></head><body>"
        "<article><h1>BOM Beats the Lying Meta</h1>"
        "<p>UTF-8 encoded Japanese text 日本語の本文 follows while the "
        "meta tag claims Shift_JIS — the byte order mark must take "
        "precedence per the WHATWG sniffing order and decode this "
        "paragraph intact.</p>"
        "<p>第二段落も同様に正しく復号されることを確認するための十分な"
        "長さの本文です。</p>"
        "</article></body></html>"
    ).encode()


def _html_c1_charrefs() -> bytes:
    """Numeric character references in the 0x80-0x9F C1 range: WHATWG
    remaps them through windows-1252 (0x93 -> LEFT DOUBLE QUOTATION
    MARK, 150 -> EN DASH, 128 -> EURO SIGN), never to raw control
    characters; true control refs and the null ref must not survive
    into extracted text."""
    return (
        "<html><body>"
        "<p>He said &#x93;misencoded quotes&#x94; cost &#128;45 "
        "&#150; a premium &#151; per the style guide, which is how "
        "legacy CMS output reaches the crawl to this day.</p>"
        "<p>Control refs like &#x01; and the null ref &#0; must "
        "vanish while the surrounding sentence survives with every "
        "ordinary word intact and offsets stable.</p>"
        "</body></html>"
    ).encode()


def _html_legacy_raw() -> bytes:
    """Legacy raw-text elements: <xmp> shows its markup literally
    (raw-text state), and <plaintext> switches the tokenizer to
    PLAINTEXT — everything to EOF is literal text, there is no end
    tag. Both still appear on old pages in the crawl."""
    return (
        "<html><body>"
        "<p>The page opens with a normal paragraph carrying enough "
        "ordinary words to anchor the main content region for the "
        "density classifier.</p>"
        "<xmp>code sample: <a href=x>not a link</a> &amp; not "
        "decoded</xmp>"
        "<p>Between the legacy elements sits another ordinary "
        "paragraph whose words must remain part of the extracted "
        "body text.</p>"
        "<plaintext>tail of file: <b>markup stays literal</b> "
        "&copy; undecoded, and the line keeps enough words to stand "
        "as a content block on its own"
    ).encode()


def _html_embed_fallbacks() -> bytes:
    """Legacy embed/frame fallbacks (WHATWG raw-text elements): the
    content of <noembed> and <noframes> shows only when embeds or
    frames are UNSUPPORTED — never in a modern consumer — and is raw
    text, so markup-lookalike bytes inside must not disturb the tag
    structure. <iframe> fallback children are equally invisible."""
    return (
        "<html><body>"
        "<p>The opening paragraph carries honest article text that "
        "survives every embed fallback below it.</p>"
        "<iframe src='/player'><p>Your browser does not support "
        "frames, iframe fallback junk.</p></iframe>"
        "<noembed><p>install the plugin</p> noembed junk with "
        "<b>markup-lookalike</b> payload</noembed>"
        "<noframes>frameset era junk <div>still junk</div> that "
        "only Netscape 2 ever displayed</noframes>"
        "<p>The closing paragraph after the fallbacks extracts "
        "normally, proving the skips stayed local.</p>"
        "</body></html>"
    ).encode()


def _html_foreign_embed() -> bytes:
    """Foreign content and embed containers: SVG label text, iframe
    srcdoc payloads and object fallback chrome never leak; MathML
    identifiers inline with the surrounding sentence (math IS
    content)."""
    return (
        "<html><body>"
        "<p>A figure follows this opening paragraph which itself "
        "holds enough ordinary words to register as body text.</p>"
        "<svg viewBox='0 0 10 10'><title>chart title chrome</title>"
        "<text x='1' y='1'>axis label chrome</text></svg>"
        '<iframe srcdoc="<p>embedded advert words</p>">'
        "iframe fallback chrome</iframe>"
        "<p>The equation <math><mi>E</mi><mo>=</mo><mi>m</mi>"
        "<msup><mi>c</mi><mn>2</mn></msup></math> sits inline in "
        "a sentence that continues with plenty of ordinary words "
        "afterward to keep the block dense.</p>"
        "</body></html>"
    ).encode()


def _html_ruby_furigana() -> bytes:
    """Ruby annotations (furigana): the reading (<rt>) and fallback
    parentheses (<rp>) must never interleave with the base text —
    "東京とうきょう" is the corpus corruption JP pipelines guard
    against. Includes the unclosed-<rt> layout (</ruby> implies the
    end tag) which must not swallow the rest of the page."""
    return (
        "<html><body>"
        "<p>この文には<ruby>漢字<rp>(</rp><rt>かんじ</rt><rp>)</rp>"
        "</ruby>の振り仮名が付き、本文には<ruby>東京"
        "<rt>とうきょう</rt></ruby>という地名も現れますが、抽出結果には"
        "読み仮名が混入してはいけません。この段落には十分な語数が"
        "あります。</p>"
        "<p>後半では<ruby>単語<rt>たんご</ruby>のように閉じタグの無い"
        "読み仮名が現れてもその後の文章はそのまま残り、読みだけが"
        "欠落するのが正しい挙動です。語数を満たすための追加の文も"
        "置いておきます。</p>"
        "</body></html>"
    ).encode()


def _html_comment_tricks() -> bytes:
    """Downlevel-hidden conditional comments and comments containing
    tag-lookalikes and double dashes: contents never leak."""
    return (
        "<html><body>"
        "<!--[if IE]><p>conditional content for old browsers</p>"
        "<![endif]-->"
        "<p>Real content after a downlevel-hidden conditional comment "
        "must extract while the commented block stays invisible to the "
        "text layer entirely.</p>"
        "<!-- a comment with <p>fake tags</p> and -- double dashes "
        "inside -->"
        "<p>The closing paragraph confirms comment contents never leak "
        "into extracted text and offsets remain stable and "
        "deterministic.</p>"
        "</body></html>"
    ).encode()


def _html_template_tag() -> bytes:
    """<template> contents live in a separate tree per WHATWG §4.12.2
    and must never reach the text layer — including a nested template
    and template-wrapped markup that would otherwise score as a
    content block."""
    return (
        "<html><body>"
        "<p>Client-side rendered pages ship their row markup inside "
        "template elements, and an extractor that walks them inflates "
        "the document with phantom list entries nobody ever saw.</p>"
        "<template id='row'><li class='item'>phantom row text that "
        "must never render</li><template><p>nested template content "
        "is doubly inert per the content model</p></template>"
        "</template>"
        "<p>The visible conclusion paragraph confirms the template "
        "subtree was skipped whole while ordinary prose on either "
        "side extracts with stable offsets.</p>"
        "</body></html>"
    ).encode()


def _html_form_controls() -> bytes:
    """Form controls are UI, not content: textarea payload (RCDATA —
    markup inside is literal text, not tags, so an unclosed-looking
    </p> inside must not derail the tree), select/option lists, and
    button labels all stay out of the extracted text."""
    return (
        "<html><body>"
        "<p>Comment forms trail most articles, and their draft "
        "placeholders read like prose to a naive extractor, which is "
        "exactly how boilerplate contaminates a training corpus.</p>"
        "<form action='/submit'>"
        "<textarea name='draft'>Write your reply here... "
        "&lt;b&gt;bold&lt;/b&gt; allowed </textarea>"
        "<select name='topic'><option>General feedback</option>"
        "<option selected>Bug report</option></select>"
        "<input type='text' value='prefilled search terms'>"
        "<button type='submit'>Post the comment now</button>"
        "</form>"
        "<p>Prose resumes after the form and must extract as the "
        "immediately following block with nothing from any control "
        "leaking in between.</p>"
        "</body></html>"
    ).encode()


def _html_surrogate_charrefs() -> bytes:
    """Numeric references outside scalar-value range: surrogate halves
    (&#xD83D;), beyond-max (&#x110000;) and the null ref map to
    U+FFFD per WHATWG §13.2.5.80, and the encoding scrub then drops
    the replacement character (P11 policy) — while a VALID astral
    reference (&#x1F603;, outside the BMP) must survive both."""
    return (
        "<html><body>"
        "<p>Broken exporters emit lone surrogate refs like &#xD83D; "
        "mid-sentence and beyond-range refs like &#x110000; where an "
        "emoji stood, and the sentence around them must still read "
        "cleanly after the scrub removes the damage markers.</p>"
        "<p>A valid astral smiley &#x1F603; in running prose proves "
        "the scrub distinguishes damage from genuine supplementary-"
        "plane characters that web text uses constantly today.</p>"
        "</body></html>"
    ).encode()


def _html_downlevel_revealed() -> bytes:
    """Downlevel-REVEALED conditional sections: <![if !IE]> is not a
    comment (WHATWG parses it as a bogus comment token and drops only
    the marker), so the enclosed markup IS visible content — the
    mirror case of html-comment-tricks' downlevel-hidden block."""
    return (
        "<html><body>"
        "<p>Pages written for the IE era wrapped their standards-mode "
        "markup in revealed conditional sections, and that content "
        "rendered for every other browser that ever loaded them.</p>"
        "<![if !IE]>"
        "<p>This revealed paragraph is real visible content because "
        "the downlevel-revealed markers are bogus comments that drop "
        "out while their enclosed markup stays in the tree.</p>"
        "<![endif]>"
        "<p>The closing paragraph after the endif marker extracts "
        "normally, confirming the marker itself left no residue in "
        "the text layer.</p>"
        "</body></html>"
    ).encode()


def _html_hidden_content() -> bytes:
    """CSS-suppressed content (the SEO-stuffing / collapsed-UI
    channel): inline ``display:none`` (any case/spacing/!important),
    the ``hidden`` boolean attribute (value ignored — hidden="false"
    still hides), and ``visibility:hidden`` must never reach the text
    layer. Three traps: the [hidden] UA rule loses to an inline
    ``style="display:block"`` (that paragraph IS visible); visibility
    INHERITS and a ``visibility:visible`` descendant re-renders inside
    a hidden parent; and ``display:none`` as a substring of an
    unrelated attribute or property value hides nothing."""
    return (
        "<html><body>"
        "<p>Keyword stuffing hides behind stylesheet suppression on "
        "real crawl pages, and an extractor that reads raw markup "
        "order inhales paragraphs no human ever saw rendered.</p>"
        "<div style='display:none'><p>stuffed invisible keywords "
        "casino pharmacy replica that must never extract</p></div>"
        "<p hidden>collapsed accordion body text that a scriptless "
        "consumer never renders and must therefore never keep</p>"
        "<p hidden='false'>boolean attribute semantics: a false "
        "value still hides per the WHATWG attribute rules</p>"
        "<p hidden style='display:block'>The inline display override "
        "beats the hidden attribute's UA rule, so this paragraph is "
        "genuinely visible content and must extract in place.</p>"
        "<div style='visibility:hidden'>invisible wrapper prose "
        "<span style='visibility:visible'>except this revealed "
        "span, which renders because visibility inherits and a "
        "descendant may override it back on</span> trailing "
        "invisible tail</div>"
        "<span style=' DISPLAY : NONE !important '>case and "
        "whitespace games do not smuggle hidden spans through</span>"
        "<p data-note='display:none'>A display:none substring inside "
        "an unrelated attribute hides nothing, and this decoy "
        "paragraph stays visible to prove the attribute gate.</p>"
        "<p style='background:url(display:none.png)'>A property "
        "value containing the magic words is equally inert — only a "
        "real display declaration counts against rendering.</p>"
        "<p>The closing visible paragraph extracts with stable "
        "offsets on the far side of every suppressed subtree.</p>"
        "</body></html>"
    ).encode()


_PDF_CASES = {
    "pdf-single-col": _pdf_single_col,
    "pdf-two-col": _pdf_two_col,
    "pdf-header-footer": _pdf_header_footer,
    "pdf-section-numbers": _pdf_section_numbers,
    "pdf-footnotes": _pdf_footnotes,
    "pdf-footnote-match": _pdf_footnote_match,
    "pdf-footnote-unmatched": _pdf_footnote_unmatched,
    "pdf-scripts": _pdf_scripts,
    "pdf-sidebar": _pdf_sidebar,
    "pdf-table": _pdf_table,
    "pdf-zorder": _pdf_zorder,
    "pdf-ocr-confusions": _pdf_ocr_confusions,
    "pdf-mixed-spacing": _pdf_mixed_spacing,
    "pdf-join-lines": _pdf_join_lines,
    "pdf-empty-page": _pdf_empty_page,
    "pdf-scanned": _pdf_scanned,
    "pdf-rotated": _pdf_rotated,
    "pdf-encrypted-rc4": _pdf_encrypted_rc4,
    "pdf-encrypted-aes": _pdf_encrypted_aes,
    "pdf-encrypted-aes256": _pdf_encrypted_aes256,
    "pdf-ocr-layer": _pdf_ocr_layer,
    "pdf-custom-widths": _pdf_custom_widths,
    "pdf-cid-widths": _pdf_cid_widths,
    "pdf-mac-roman": _pdf_mac_roman,
    "pdf-tounicode": _pdf_tounicode,
    "pdf-inherited-split": _pdf_inherited_split,
    "pdf-lzw": _pdf_lzw,
    "pdf-differences": _pdf_differences,
    "pdf-truncated": _pdf_truncated,
    "pdf-encrypted-modern": _pdf_encrypted_modern,
    "pdf-letterhead": _pdf_letterhead,
    "pdf-incremental": _pdf_incremental,
    "pdf-type0-predefined": _pdf_type0_predefined,
    "pdf-vertical-jp": _pdf_vertical_jp,
    "pdf-mixed-direction": _pdf_mixed_direction,
    "pdf-rtl-bidi": _pdf_rtl_bidi,
    "pdf-astral-tounicode": _pdf_astral_tounicode,
    "pdf-string-syntax": _pdf_string_syntax,
    "pdf-info-outline": _pdf_info_outline,
    "pdf-hybrid-xref": _pdf_hybrid_xref,
    "pdf-artifact-marked": _pdf_artifact_marked,
    "pdf-actualtext": _pdf_actualtext,
    "pdf-type3-font": _pdf_type3_font,
    "pdf-ocg-layers": _pdf_ocg_layers,
}

_HTML_CASES = {
    "html-article": _html_article,
    "html-linkfarm": _html_linkfarm,
    "html-mixed-lang": _html_mixed_lang,
    "html-tables-lists": _html_tables_lists,
    "html-entities": _html_entities,
    "html-invisible-chars": _html_invisible_chars,
    "html-short-blocks": _html_short_blocks,
    "html-encoding-damage": _html_encoding_damage,
    "html-nested-tables": _html_nested_tables,
    "html-script-heavy": _html_script_heavy,
    "html-entity-storm": _html_entity_storm,
    "html-unclosed-tags": _html_unclosed_tags,
    "html-sjis-meta": _html_sjis_meta,
    "html-win1252": _html_win1252,
    "html-utf16": _html_utf16,
    "html-gzip": _html_gzip,
    "html-divsoup": _html_divsoup,
    "html-http-response": _html_http_response,
    "html-attr-quoting": _html_attr_quoting,
    "html-attr-long-value": _html_attr_long_value,
    "html-cdata": _html_cdata,
    "html-meta-refresh": _html_meta_refresh,
    "html-bom-wrong-meta": _html_bom_wrong_meta,
    "html-comment-tricks": _html_comment_tricks,
    "html-c1-charrefs": _html_c1_charrefs,
    "html-legacy-raw": _html_legacy_raw,
    "html-foreign-embed": _html_foreign_embed,
    "html-ruby-furigana": _html_ruby_furigana,
    "html-warc-capture": _html_warc_capture,
    "html-template-tag": _html_template_tag,
    "html-form-controls": _html_form_controls,
    "html-surrogate-charrefs": _html_surrogate_charrefs,
    "html-downlevel-revealed": _html_downlevel_revealed,
    "html-embed-fallbacks": _html_embed_fallbacks,
    "html-hidden-content": _html_hidden_content,
}

_CASE_LANG = {
    "pdf-single-col": "mixed", "pdf-two-col": "en",
    "pdf-header-footer": "en", "pdf-section-numbers": "mixed",
    "pdf-footnotes": "en", "pdf-footnote-match": "mixed",
    "pdf-footnote-unmatched": "en",
    "pdf-scripts": "en", "pdf-sidebar": "en",
    "pdf-table": "en", "pdf-zorder": "en", "pdf-ocr-confusions": "en",
    "pdf-mixed-spacing": "mixed", "pdf-join-lines": "mixed",
    "pdf-empty-page": "en", "pdf-scanned": "en", "pdf-rotated": "en",
    "pdf-encrypted-rc4": "mixed", "pdf-encrypted-aes": "mixed",
    "pdf-encrypted-aes256": "mixed",
    "pdf-ocr-layer": "en",
    "pdf-custom-widths": "en",
    "pdf-cid-widths": "ja",
    "pdf-mac-roman": "en",
    "pdf-tounicode": "mixed", "pdf-inherited-split": "mixed",
    "pdf-lzw": "mixed", "pdf-differences": "en",
    "pdf-truncated": "en", "pdf-encrypted-modern": "mixed",
    "pdf-letterhead": "en", "pdf-incremental": "en",
    "pdf-type0-predefined": "mixed",
    "pdf-vertical-jp": "ja",
    "pdf-mixed-direction": "ja",
    "pdf-rtl-bidi": "mixed",
    "pdf-astral-tounicode": "mixed",
    "pdf-string-syntax": "en",
    "pdf-info-outline": "en",
    "pdf-hybrid-xref": "en",
    "pdf-artifact-marked": "en",
    "pdf-actualtext": "en",
    "pdf-type3-font": "en",
    "pdf-ocg-layers": "mixed",
    "html-article": "en", "html-linkfarm": "en",
    "html-mixed-lang": "mixed", "html-tables-lists": "en",
    "html-entities": "en", "html-short-blocks": "en",
    "html-invisible-chars": "en",
    "html-encoding-damage": "en",
    "html-nested-tables": "en", "html-script-heavy": "en",
    "html-entity-storm": "mixed", "html-unclosed-tags": "en",
    "html-sjis-meta": "ja", "html-win1252": "en", "html-utf16": "mixed",
    "html-gzip": "en", "html-divsoup": "en",
    "html-http-response": "en",
    "html-attr-quoting": "en", "html-attr-long-value": "en",
    "html-cdata": "en",
    "html-meta-refresh": "en", "html-bom-wrong-meta": "mixed",
    "html-comment-tricks": "en",
    "html-c1-charrefs": "en", "html-legacy-raw": "en",
    "html-foreign-embed": "en", "html-ruby-furigana": "ja",
    "html-warc-capture": "en",
    "html-template-tag": "en",
    "html-form-controls": "en",
    "html-surrogate-charrefs": "en",
    "html-downlevel-revealed": "en",
    "html-embed-fallbacks": "en",
    "html-hidden-content": "en",
}


def fixture_cases() -> list[tuple[str, str, str, bytes]]:
    """Ordered (case_id, branch, lang, payload) — deterministic order."""
    out: list[tuple[str, str, str, bytes]] = []
    for cid in sorted(_PDF_CASES):
        out.append((cid, "pdf", _CASE_LANG[cid], _PDF_CASES[cid]()))
    for cid in sorted(_HTML_CASES):
        out.append((cid, "html", _CASE_LANG[cid], _HTML_CASES[cid]()))
    return out


def build_pages_frame(copies: int = 1) -> pd.DataFrame:
    """The ``pages`` input table (FIXTURES.md §1) as a pandas frame:
    url, warc_ts, html (binary payload), text (empty), lang.

    ``copies > 1`` replicates case bodies under unique urls (bench
    corpora, FIXTURES.md: "replicated case bodies with unique urls").
    """
    rows = []
    i = 0
    cases = fixture_cases()
    for copy in range(copies):
        for cid, branch, lang, payload in cases:
            url = f"https://fixture.test/{branch}/{cid}"
            if copies > 1:
                url += f"/{copy}"
            rows.append(
                {
                    "url": url,
                    "warc_ts": BASE_TS + dt.timedelta(seconds=i),
                    "html": payload,
                    "text": "",
                    "lang": lang,
                }
            )
            i += 1
    return pd.DataFrame(rows)
