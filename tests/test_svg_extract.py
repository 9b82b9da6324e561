"""SVG text extraction: coordinate reading order, inheritance,
entities, skip-subtree decoys."""

from __future__ import annotations

import pytest

from pdf_extractor_spark.operators.svg_extract import (
    SvgError,
    build_svg,
    svg_extract_text,
)


def test_coordinate_sort_beats_document_order():
    svg = b"""<svg xmlns="http://www.w3.org/2000/svg">
      <text x="60" y="20">gamma</text>
      <text x="0" y="40">delta</text>
      <text x="0" y="20">alpha</text>
      <text x="30" y="20">beta</text>
    </svg>"""
    assert svg_extract_text(svg) == "alpha beta gamma delta"


def test_tspan_inherits_parent_y_and_overrides_x():
    svg = b"""<svg><text y="20">
      <tspan x="30">two</tspan><tspan x="0">one</tspan>
    </text><text x="0" y="40">three</text></svg>"""
    assert svg_extract_text(svg) == "one two three"


def test_decoys_never_extract():
    svg = b"""<svg>
      <title>NO</title><desc>NO</desc>
      <defs><text x="0" y="0">NO</text></defs>
      <symbol><tspan>NO</tspan></symbol>
      <!-- <text x="0" y="0">NO</text> -->
      <style><![CDATA[ <text>NO</text> ]]></style>
      <metadata><text>NO</text></metadata>
      <text x="0" y="10">yes</text>
    </svg>"""
    assert svg_extract_text(svg) == "yes"


def test_entities_decode_including_numeric():
    svg = (
        '<svg><text x="0" y="10">&#104;&#105; &amp; '
        "&lt;ok&gt; &#x41;</text></svg>"
    )
    assert svg_extract_text(svg) == "hi & <ok> A"


def test_namespaced_tags_and_selfclose():
    svg = b"""<svg xmlns:s="http://x"><s:defs/>
      <text x="0" y="10">kept</text></svg>"""
    assert svg_extract_text(svg) == "kept"


def test_non_svg_raises():
    with pytest.raises(SvgError):
        svg_extract_text(b"<html><body>nope</body></html>")


def test_wrapper_roundtrips_all_dialects():
    text = "the quick brown fox jumps over the lazy dog again soon"
    for doc_id in (0, 1, 2, 3, 6, 7):  # grids x dialects x escaping
        svg = build_svg(text, doc_id)
        assert b"DECOY" in svg  # traps really planted
        assert svg_extract_text(svg) == text, doc_id


def test_close_inside_skip_subtree_does_not_pop_outer_text():
    # </text> inside a skipped <defs> must not pop the outer open
    # <text>'s stack entry: trailing data keeps its coordinates.
    svg = b"""<svg><text x="0" y="10">A
      <defs><text x="9" y="99">NO</text></defs>
      <tspan x="5">B</tspan>
    </text><text x="0" y="20">C</text></svg>"""
    from pdf_extractor_spark.operators.svg_extract import (
        svg_extract_text,
    )
    assert svg_extract_text(svg) == "A B C"
