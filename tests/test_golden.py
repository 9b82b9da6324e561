"""Golden-fixture byte-equality suite — the product invariant
(reference README.md:12 "100% Deterministic"; FIXTURES.md §2).

Pure-Python path (no Spark): kernel(payload) must equal the frozen
golden byte-for-byte, twice (two-run determinism).
"""

from __future__ import annotations

import json
import pathlib

import pytest

from pdf_extractor_spark.fixtures.corpus import fixture_cases
from pdf_extractor_spark.operators.document import extract_document

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
CASES = fixture_cases()


@pytest.mark.parametrize("cid,branch,lang,payload", CASES,
                         ids=[c[0] for c in CASES])
def test_golden_byte_equality(cid, branch, lang, payload):
    golden = (GOLDEN_DIR / f"{cid}.txt").read_bytes()
    meta = json.loads((GOLDEN_DIR / f"{cid}.spans.json").read_text())
    rec = extract_document(payload)
    assert rec["extracted_text"].encode("utf-8") == golden
    assert [list(s) for s in rec["spans"]] == meta["spans"]
    assert rec["branch"] == meta["branch"] == branch
    assert rec["quality"] == meta["quality"]
    assert sorted({e["type"] for e in rec["errors"]}) == meta["error_types"]


def test_two_run_determinism():
    for cid, _b, _l, payload in CASES:
        r1 = extract_document(payload)
        r2 = extract_document(payload)
        assert r1["extracted_text"] == r2["extracted_text"], cid
        assert r1["spans"] == r2["spans"], cid


def test_spans_index_into_text():
    for cid, _b, _l, payload in CASES:
        rec = extract_document(payload)
        text = rec["extracted_text"]
        for start, end, kind, page in rec["spans"]:
            assert 0 <= start <= end <= len(text), cid
            assert text[start:end].strip() != "" or start == end, cid


def test_specific_behaviors_pinned():
    recs = {cid: extract_document(p) for cid, _b, _l, p in CASES}
    t = recs["pdf-header-footer"]["extracted_text"]
    assert "Annual Technical Report" not in t
    assert "Fixture Corp Confidential" not in t
    assert "- 1 -" not in t and "- 5 -" not in t
    assert "unique body sentence number v1" in t

    t = recs["pdf-section-numbers"]["extracted_text"]
    assert "1.2 Section heading kept always" in t
    assert "第2章" in t
    # isolated margin digits dropped
    assert "\n7\n" not in f"\n{t}\n" and "\n42\n" not in f"\n{t}\n"

    t = recs["pdf-scanned"]["extracted_text"]
    assert "[SCANNED PAGE 2]" in t
    assert any(e["type"] == "scanned" for e in recs["pdf-scanned"]["errors"])

    assert any(
        e["type"] == "empty_page" for e in recs["pdf-empty-page"]["errors"]
    )
    assert any(
        e["type"] == "rotation" for e in recs["pdf-rotated"]["errors"]
    )

    t = recs["pdf-mixed-spacing"]["extracted_text"]
    assert "wordnextfar apart" in t      # gaps 1/3 no space, 5 space
    assert "日本語句間隔。" in t            # JP cleanup collapses JP spaces

    r = recs["pdf-footnote-unmatched"]
    t = r["extracted_text"]
    # ADVICE-r1 HIGH: a definition with no body marker must not vanish
    assert "orphan definition must not vanish" in t
    assert r["footnote_stats"]["unmatched_markers"] == ["[9]"]
    assert r["footnote_stats"]["unmatched_definitions"] == ["※"]
    # matched entries precede unmatched ones in the footnote section
    assert t.index("matched definition body text") < t.index("orphan")

    t = recs["html-linkfarm"]["extracted_text"]
    assert "link number" not in t and "honest paragraph" in t

    t = recs["html-entities"]["extracted_text"]
    assert "&" in t and "あ" in t and "<tags>" in t

    t = recs["html-short-blocks"]["extracted_text"]
    assert "Short but kept." in t and "Orphan short." not in t

    t = recs["html-hidden-content"]["extracted_text"]
    assert "stuffed invisible keywords" not in t       # display:none
    assert "collapsed accordion" not in t              # hidden attr
    assert "a false value still hides" not in t        # hidden='false'
    assert "inline display override" in t              # style beats UA
    assert "invisible wrapper prose" not in t          # visibility
    assert "except this revealed span" in t            # descendant wins
    assert "whitespace games" not in t                 # DISPLAY : NONE
    assert "decoy paragraph stays visible" in t        # attr substring
    assert "equally inert" in t                        # value substring


def test_garbage_payload_flagged_not_silent():
    """U3 contract: a payload that is neither PDF nor markup must come
    back with an encoding/malformed/empty_page error — never a silent
    ok-looking empty row."""
    for payload, want in [
        (b"\x00\xff\xfe\x01\x80garbage\x9f", {"encoding", "malformed"}),
        (b"", {"empty_page"}),
    ]:
        rec = extract_document(payload)
        kinds = {e["type"] for e in rec["errors"]}
        assert kinds & want, (payload, rec["errors"])
        assert rec["extracted_text"] == ""
    # but decodable tagless text IS content (html.parser data block)
    rec = extract_document(b"plain words no markup at all")
    assert rec["extracted_text"] == "plain words no markup at all"
    assert not rec["errors"]
