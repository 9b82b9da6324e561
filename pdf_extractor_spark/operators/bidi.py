"""RTL (Hebrew/Arabic) visual-to-logical reordering — W-layer.

PDF content streams place glyphs by POSITION: an RTL paragraph is
stored in visual order (the logically-first word at the largest x,
and each word's characters reversed), because the writer laid the
page out after bidi reordering. A naive x-sorted join therefore
emits Hebrew/Arabic text exactly backwards — the classic pdfminer
failure mode. The reference never handles RTL (its domain is
Japanese: ``extractor.py`` word assembly is pure x-order), so this
module is scope beyond parity, pinned by its own goldens.

Algorithm (inverse UAX #9, restricted to the dominant real-world
case — one embedding level, no explicit bidi controls in content
streams):

1. classify each word box: **R** (contains a strong RTL codepoint),
   **L** (contains ASCII/Latin alphanumerics), **N** (neither —
   punctuation-only boxes);
2. maximal runs of R boxes — extended over interior N boxes flanked
   by R on both sides (neutrals take the surrounding direction,
   UAX #9 rule N1) — are REFLECTED inside their own x-extent
   ``[lo, hi]``: ``x0' = lo+hi-x1``, ``x1' = lo+hi-x0``. The
   reflection preserves every intra-run gap width exactly, so the
   downstream W2 spacing table needs no changes, and the run still
   occupies the same extent relative to LTR neighbours;
3. each R box's characters reverse (visual → logical), paired
   brackets mirror (a visual ``(`` left of RTL text is a logical
   ``)``), embedded LTR runs (digits, Latin) inside an RTL word
   keep their order (UAX #9: numbers read LTR inside RTL text), and
   Arabic presentation forms (U+FB50-FDFF / U+FE70-FEFF — the
   SHAPED glyphs writers embed) fold back to base letters via NFKC,
   which is how logical text stores them.

The gate is one C-speed regex scan per line; non-RTL corpora (the
reference's JP/EN domain) pay only that.
"""

from __future__ import annotations

import re
import unicodedata

# strong RTL: Hebrew, Arabic, Syriac, Thaana, NKo, Samaritan,
# Mandaic, Arabic Extended-A, presentation forms
_RTL_RE = re.compile(
    "[\u0590-\u08FF\uFB1D-\uFB4F\uFB50-\uFDFF\uFE70-\uFEFC]"
)
# strong LTR inside an RTL word: digits + basic/extended Latin
_LTR_RUN_RE = re.compile("[0-9A-Za-zÀ-ɏ%]+")
# Arabic presentation forms → NFKC folds them to base letters
_PRESENTATION_RE = re.compile("[\uFB50-\uFDFF\uFE70-\uFEFC]")
_STRONG_LTR_RE = re.compile("[0-9A-Za-zÀ-ɏ]")

_MIRROR = str.maketrans({
    "(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
    "<": ">", ">": "<", "«": "»", "»": "«", "‹": "›", "›": "‹",
})


def has_rtl(text: str) -> bool:
    return _RTL_RE.search(text) is not None


def visual_to_logical_token(tok: str) -> str:
    """One RTL word box, visual glyph order → logical order."""
    rev = tok[::-1].translate(_MIRROR)
    # digits / Latin embedded in the RTL word were ALREADY logical
    # in the visual layout (LTR-in-RTL), so the blanket reversal
    # flipped them — flip them back
    rev = _LTR_RUN_RE.sub(lambda m: m.group(0)[::-1], rev)
    if _PRESENTATION_RE.search(rev):
        rev = unicodedata.normalize("NFKC", rev)
    return rev


def _logical_r_token(t: str) -> str:
    """Visual→logical for one box inside an R unit: RTL tokens go
    through the full word transform; absorbed neutral boxes (pure
    punctuation riding an RTL run) just reverse + mirror."""
    if _RTL_RE.search(t):
        return visual_to_logical_token(t)
    return t[::-1].translate(_MIRROR)


def reorder_visual_line(texts, x0s, x1s):
    """x-sorted word boxes of ONE line → logical order. Returns
    (texts, x0s, x1s) as plain lists; input arrays are not mutated.

    Two regimes, picked by an estimated base direction (UAX #9 P2/P3
    needs logical order, which is exactly what we do not have, so we
    estimate by strong-token majority — the HarfBuzz/Chromium
    content-estimation heuristic; ties go LTR, the reference's JP/EN
    domain):

    * **LTR base** (R minority): each maximal R run — extended over
      interior neutrals flanked by R on both sides (UAX #9 N1) — is
      reflected inside its own x-extent; L boxes never move.
    * **RTL base** (R majority): the LINE is reversed at unit level —
      logical order is the reverse of the visual unit sequence — and
      each embedded L unit (Latin words, numbers: LTR-in-RTL reads
      left-to-right, so its boxes were already in logical order)
      shifts position as a block, keeping internal order. Run-local
      reflection alone would leave those islands at the wrong end of
      the sentence.

    Both regimes reflect coordinates so every inter-box gap width is
    preserved — the downstream W2 spacing table is direction-blind.
    """
    n = len(texts)
    toks = [str(t) for t in texts]
    raw = []
    for t in toks:
        if _RTL_RE.search(t):
            raw.append("R")
        elif _STRONG_LTR_RE.search(t):
            raw.append("L")
        else:
            raw.append("N")
    if raw.count("R") > raw.count("L"):
        return _reorder_rtl_base(toks, x0s, x1s, raw)
    return _reorder_ltr_base(toks, x0s, x1s, raw)


def _reorder_ltr_base(toks, x0s, x1s, raw):
    n = len(toks)
    cls = list(raw)
    # interior neutrals flanked by R on both sides join the run
    for i in range(1, n - 1):
        if cls[i] == "N":
            j = i - 1
            while j >= 0 and cls[j] == "N":
                j -= 1
            k = i + 1
            while k < n and cls[k] == "N":
                k += 1
            if j >= 0 and k < n and cls[j] == "R" and cls[k] == "R":
                cls[i] = "R"
    out_t: list[str] = []
    out_x0: list[float] = []
    out_x1: list[float] = []
    i = 0
    while i < n:
        if cls[i] != "R":
            out_t.append(toks[i])
            out_x0.append(float(x0s[i]))
            out_x1.append(float(x1s[i]))
            i += 1
            continue
        j = i
        while j < n and cls[j] == "R":
            j += 1
        lo = float(x0s[i])
        hi = float(x1s[j - 1])
        for k in range(j - 1, i - 1, -1):
            out_t.append(_logical_r_token(toks[k]))
            out_x0.append(lo + hi - float(x1s[k]))
            out_x1.append(lo + hi - float(x0s[k]))
        i = j
    return out_t, out_x0, out_x1


def _reorder_rtl_base(toks, x0s, x1s, raw):
    n = len(toks)
    # neutrals take the base direction (R) unless flanked by L on
    # both sides (UAX #9 N1/N2 restricted to one embedding level)
    cls = list(raw)
    for i in range(n):
        if raw[i] != "N":
            continue
        j = i - 1
        while j >= 0 and raw[j] == "N":
            j -= 1
        k = i + 1
        while k < n and raw[k] == "N":
            k += 1
        left = raw[j] if j >= 0 else None
        right = raw[k] if k < n else None
        cls[i] = "L" if (left == "L" and right == "L") else "R"
    lo = min(float(x) for x in x0s)
    hi = max(float(x) for x in x1s)
    # maximal same-class units, visited right-to-left (= logical order)
    units = []
    i = 0
    while i < n:
        j = i
        while j < n and cls[j] == cls[i]:
            j += 1
        units.append((i, j, cls[i]))
        i = j
    out_t: list[str] = []
    out_x0: list[float] = []
    out_x1: list[float] = []
    for (i, j, c) in reversed(units):
        if c == "R":
            for k in range(j - 1, i - 1, -1):
                out_t.append(_logical_r_token(toks[k]))
                out_x0.append(lo + hi - float(x1s[k]))
                out_x1.append(lo + hi - float(x0s[k]))
        else:
            # L island: moves as a block into its reflected extent,
            # internal (already-logical) order and gaps untouched
            u_lo = float(x0s[i])
            u_hi = float(x1s[j - 1])
            shift = (lo + hi) - (u_lo + u_hi)
            for k in range(i, j):
                out_t.append(toks[k])
                out_x0.append(shift + float(x0s[k]))
                out_x1.append(shift + float(x1s[k]))
    return out_t, out_x0, out_x1
