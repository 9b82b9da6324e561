"""RTL visual→logical reordering (W-layer, ``operators/bidi.py``).

PDF content streams store RTL text in VISUAL order; these tests pin
the inverse-UAX#9 recovery: token-level reversal with LTR islands
kept, bracket mirroring, presentation-form folding, and the two
line regimes (LTR base reflecting R runs, RTL base reversing the
unit sequence). Scope beyond reference parity — the reference's
domain is JP/EN (its word assembly is pure x-order).
"""

from __future__ import annotations

import pytest

from pdf_extractor_spark.config import ExtractConfig
from pdf_extractor_spark.operators import bidi
from pdf_extractor_spark.operators.spacing import join_tokens

CFG = ExtractConfig()


# ------------------------------------------------------------ tokens

def test_has_rtl_gate():
    assert bidi.has_rtl("שלום")
    assert bidi.has_rtl("مرحبا")
    assert bidi.has_rtl("ﻣﺮﺣﺒﺎ")  # presentation forms
    assert not bidi.has_rtl("plain ASCII 123")
    assert not bidi.has_rtl("日本語の本文")  # JP never triggers the RTL path


def test_token_reversal():
    assert bidi.visual_to_logical_token("םולש") == "שלום"


def test_digits_stay_ltr_inside_rtl_word():
    # logical "דף123" is laid out visually as "123ףד"
    assert bidi.visual_to_logical_token("123ףד") == "דף123"


def test_latin_run_stays_ltr_inside_rtl_word():
    # logical "שלוםABCשלום" → visual reverses Hebrew but keeps ABC
    visual = "םולש" + "ABC" + "םולש"
    assert bidi.visual_to_logical_token(visual) == "שלוםABCשלום"


def test_brackets_mirror():
    # a visual "(" on the left of RTL text is a logical ")"
    assert bidi.visual_to_logical_token("(םולש") == "שלום)"
    assert bidi.visual_to_logical_token("םולש)") == "(שלום"


def test_presentation_forms_fold_to_base_letters():
    shaped = "ﻣﺮﺣﺒﺎ"          # shaped Arabic glyphs (U+FB50-FEFC)
    visual = shaped[::-1]
    assert bidi.visual_to_logical_token(visual) == "مرحبا"


# ------------------------------------------------------------- lines

def test_ltr_base_reflects_r_run_only():
    # visual: see [ןושאר ינש] words  (R run between L words)
    texts = ["see", "ןושאר", "ינש", "words"]
    x0s = [10.0, 40.0, 70.0, 100.0]
    x1s = [30.0, 60.0, 90.0, 130.0]
    t, a, b = bidi.reorder_visual_line(texts, x0s, x1s)
    assert t == ["see", "שני", "ראשון", "words"]
    # L boxes never move; the R run reflects inside its own extent
    assert a[0] == 10.0 and b[0] == 30.0
    assert a[3] == 100.0 and b[3] == 130.0
    assert (a[1], b[1]) == (40.0, 60.0)
    assert (a[2], b[2]) == (70.0, 90.0)


def test_rtl_base_reverses_units_and_keeps_l_island():
    # logical: שלום עולם HTML טוב — visual l→r: בוט HTML םלוע םולש
    texts = ["בוט", "HTML", "םלוע", "םולש"]
    x0s = [10.0, 40.0, 80.0, 120.0]
    x1s = [35.0, 75.0, 110.0, 150.0]
    t, a, b = bidi.reorder_visual_line(texts, x0s, x1s)
    assert t == ["שלום", "עולם", "HTML", "טוב"]
    # gap widths preserved (direction-blind spacing downstream)
    gaps_in = [x0s[i + 1] - x1s[i] for i in range(3)]
    gaps_out = [a[i + 1] - b[i] for i in range(3)]
    assert gaps_out == gaps_in[::-1]


def test_neutral_box_flanked_by_r_joins_run():
    # visual: םייתש — דחא  → logical: אחד — שתיים
    texts = ["םייתש", "—", "דחא"]
    x0s = [10.0, 45.0, 60.0]
    x1s = [40.0, 55.0, 90.0]
    t, _a, _b = bidi.reorder_visual_line(texts, x0s, x1s)
    assert t == ["אחד", "—", "שתיים"]


def test_neutral_between_l_words_in_rtl_base_stays_with_l():
    # RTL-base line with an embedded "A - B" Latin island: the
    # neutral flanked by L on both sides takes L (UAX #9 N1)
    # (three R vs two L: strong-token majority picks the RTL base;
    # an exact tie goes LTR by design)
    texts = ["ןורחא", "רחא", "A", "-", "B", "םולש"]
    x0s = [2.0, 10.0, 40.0, 60.0, 75.0, 100.0]
    x1s = [8.0, 35.0, 55.0, 70.0, 90.0, 130.0]
    t, _a, _b = bidi.reorder_visual_line(texts, x0s, x1s)
    assert t == ["שלום", "A", "-", "B", "אחר", "אחרון"]


# -------------------------------------------------- join integration

def test_join_tokens_rtl_line():
    texts = ["בוט", "HTML", "םלוע", "םולש"]
    x0s = [10.0, 40.0, 80.0, 120.0]
    x1s = [35.0, 75.0, 110.0, 150.0]
    assert join_tokens(texts, x0s, x1s, CFG) == "שלום עולם HTML טוב"


def test_join_tokens_single_rtl_token():
    assert join_tokens(["םולש"], [10.0], [40.0], CFG) == "שלום"


def test_join_tokens_non_rtl_unchanged():
    out = join_tokens(["hello", "world"], [0.0, 40.0], [30.0, 70.0], CFG)
    assert out == "hello world"


@pytest.mark.parametrize("texts", [["שלום"], ["مرحبا", "بالعالم"]])
def test_logical_input_roundtrip_stability(texts):
    # already-logical single tokens: reversal is an involution only
    # through the visual form — pin that applying the transform to
    # the VISUAL form yields the logical form exactly once
    visual = [t[::-1] for t in texts][::-1]
    n = len(visual)
    x0s = [10.0 + 40.0 * i for i in range(n)]
    x1s = [40.0 + 40.0 * i for i in range(n)]
    t, _a, _b = bidi.reorder_visual_line(visual, x0s, x1s)
    assert t == texts
