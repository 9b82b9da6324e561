"""Character classification + deterministic glyph-width model.

Shared by the PDF fixture generator and the PDF tokenizer so word-box
coordinates are known by construction, and by the spacing serializer
(W2, reference ``extractor.py:578-627``) for Japanese-aware joins.

Width model: a deterministic monospaced approximation — ASCII/halfwidth
glyphs advance 0.5 em, CJK/fullwidth glyphs advance 1.0 em. This is the
single source of truth for both emitting and parsing fixture PDFs
(SURVEY.md §7.0: our own minimal tokenizer is the oracle-free path).
"""

from __future__ import annotations

from functools import lru_cache

# Unicode ranges treated as "wide" (1.0 em advance) AND "Japanese" for
# spacing decisions. Kept as explicit ranges — no external data tables.
_JP_RANGES = (
    (0x3000, 0x303F),   # CJK symbols & punctuation (。、「」 etc.)
    (0x3040, 0x309F),   # hiragana
    (0x30A0, 0x30FF),   # katakana
    (0x4E00, 0x9FFF),   # CJK unified ideographs
    (0x3400, 0x4DBF),   # CJK ext A
    (0xFF00, 0xFFEF),   # full/half-width forms
)

_WIDE_EXTRA = (
    (0x2460, 0x24FF),   # enclosed alphanumerics (①-⑳ used as section marks)
    (0x2E80, 0x2FFF),   # CJK radicals
)

# Japanese punctuation that suppresses surrounding spaces (W2 rule).
JP_PUNCT = set("。、・「」『』（）〔〕【】：；！？ー〜")

# Sentence terminators for line-joining (W4, reference extractor.py:957-982).
LINE_TERMINATORS = set("。．.!?！？:：」』")

# Japanese particles that signal a continued sentence at end-of-line.
JP_PARTICLES = set("はがをにでともの")


@lru_cache(maxsize=1 << 16)
def is_japanese_char(ch: str) -> bool:
    """W2 charclass test (reference ``extractor.py:612-627``). Cached:
    the char vocabulary of a corpus is tiny and repeats per word pair."""
    cp = ord(ch)
    for lo, hi in _JP_RANGES:
        if lo <= cp <= hi:
            return True
    return False


def is_wide_char(ch: str) -> bool:
    """1.0-em advance glyphs (CJK + enclosed alphanumerics)."""
    cp = ord(ch)
    for lo, hi in _JP_RANGES:
        if lo <= cp <= hi:
            return True
    for lo, hi in _WIDE_EXTRA:
        if lo <= cp <= hi:
            return True
    return False


def char_advance(ch: str, size: float) -> float:
    """Deterministic glyph advance in points for font size ``size``."""
    return size if is_wide_char(ch) else 0.5 * size


def text_advance(text: str, size: float) -> float:
    """Total advance of ``text`` at ``size`` (sum of char advances)."""
    return sum(char_advance(c, size) for c in text)
