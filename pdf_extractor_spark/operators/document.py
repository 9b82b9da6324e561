"""Per-document extraction orchestrator — the fused kernel.

One payload in, one extraction record out. The reference re-opens and
re-parses each PDF up to six times across its phases
(``master_extractor.py`` — SURVEY.md §3.2 "critical inefficiency");
here every phase derives from a SINGLE parse: tokenize once, then
header/footer detection (A1) → metadata filter (P2) → column detection
(C1) → line grouping (C2) → reading-order sort (O1/O2) → spacing join
(W2) → cleanup (W4, F1-F3) → coverage/quality (A4/A6) — all on the one
word-box frame.

Routing: content sniffing on the payload magic (``%PDF-`` ⇒ PDF branch,
else HTML branch), per SURVEY.md §1.3.

This module is pure Python/pandas (no Spark): the Spark layer batches
documents through it inside ``mapInPandas`` Arrow batches.
"""

from __future__ import annotations

from typing import Any

from ..config import DEFAULT_CONFIG, ExtractConfig
from .filters import detect_repeating_elements, filter_metadata, is_scanned_page
from .html_extract import extract_html
from .layout import detect_columns, group_lines
from .pdf_tokenizer import parse_pdf
from .spacing import cleanup_text, join_words_with_spacing

PDF_MAGIC = b"%PDF-"


def _grade(score: float) -> str:
    """A-F grade bands (reference ``quality_scorer.py:359-364``)."""
    if score >= 90:
        return "A"
    if score >= 80:
        return "B"
    if score >= 70:
        return "C"
    if score >= 60:
        return "D"
    return "F"


def _quality(
    total_words: int, kept_words: int, n_lines: int, text: str,
    cfg: ExtractConfig,
) -> dict[str, Any]:
    """A4+A6 lite: coverage + weighted score (reference
    ``quality_scorer.py:81-413`` — completeness .30, structure .25,
    accuracy .20, footnotes .15, readability .10). Deterministic column
    math only; footnote dim defaults to full until the footnote stage
    lands (round 2)."""
    coverage = kept_words / total_words if total_words else 0.0
    completeness = min(1.0, coverage / 0.85)  # GOOD threshold 85% (A4)
    structure = min(1.0, n_lines / 3.0) if text else 0.0
    bad_chars = text.count("�") + text.count("\x00")
    accuracy = max(0.0, 1.0 - bad_chars / max(1, len(text)))
    readability = 1.0 if text.strip() else 0.0
    score = 100.0 * (
        cfg.w_completeness * completeness
        + cfg.w_structure * structure
        + cfg.w_accuracy * accuracy
        + cfg.w_footnotes * 1.0
        + cfg.w_readability * readability
    )
    score = round(score, 4)
    return {"score": score, "grade": _grade(score), "coverage": round(coverage, 6)}


def extract_pdf_document(
    payload: bytes, cfg: ExtractConfig
) -> dict[str, Any]:
    """PDF branch: single parse → per-page filter/cluster/serialize."""
    doc = parse_pdf(payload)
    errors: list[dict] = list(doc.errors)
    headers, footers = detect_repeating_elements(
        [p.words for p in doc.pages], [p.height for p in doc.pages], cfg
    )
    page_texts: list[tuple[int, str]] = []
    total_words = 0
    kept_words = 0
    for page in doc.pages:
        total_words += len(page.words)
        if len(page.words) == 0:
            errors.append(
                {"type": "empty_page", "severity": "info",
                 "page": page.page_number, "message": "no words on page"}
            )
            continue
        if is_scanned_page(page.words, cfg):
            # reference emits a placeholder (master_extractor.py:714-722)
            errors.append(
                {"type": "scanned", "severity": "warning",
                 "page": page.page_number,
                 "message": "fewer than threshold words; raster-only page"}
            )
            page_texts.append(
                (page.page_number, f"[SCANNED PAGE {page.page_number}]")
            )
            continue
        words = filter_metadata(page.words, page.height, headers, footers, cfg)
        kept_words += len(words)
        if len(words) == 0:
            continue
        cols = detect_columns(words, cfg.column_gap_threshold)
        col_texts: list[str] = []
        for _cid, cw in cols.groupby("col_id", sort=True):
            lines = group_lines(cw, cfg.line_height_threshold)
            line_strs = [
                join_words_with_spacing(lw, cfg)
                for _lid, lw in lines.groupby("line_id", sort=True)
            ]
            col_texts.append("\n".join(line_strs))
        page_text = cleanup_text("\n\n".join(col_texts))
        if page_text:
            page_texts.append((page.page_number, page_text))

    parts: list[str] = []
    spans: list[tuple[int, int, str, int]] = []
    pos = 0
    n_lines = 0
    for page_no, ptext in page_texts:
        if parts:
            pos += 2
        start = pos
        parts.append(ptext)
        pos += len(ptext)
        spans.append((start, pos, "body", page_no))
        n_lines += ptext.count("\n") + 1
    text = "\n\n".join(parts)
    quality = _quality(total_words, kept_words, n_lines, text, cfg)
    return {
        "branch": "pdf",
        "extracted_text": text,
        "spans": spans,
        "tables": [],
        "footnotes": [],
        "quality": quality,
        "errors": errors,
        "n_pages": len(doc.pages),
    }


def extract_html_document(
    payload: bytes, cfg: ExtractConfig
) -> dict[str, Any]:
    """HTML branch (H1-H6)."""
    errors: list[dict] = []
    try:
        text, spans = extract_html(payload, cfg)
    except Exception as exc:
        errors.append(
            {"type": "malformed", "severity": "error", "page": 0,
             "message": f"html parse failed: {exc}"}
        )
        text, spans = "", []
    # P11 analog (reference error_handler.py:509-540): a payload that is
    # mostly undecodable bytes is not text — flag it instead of shipping
    # mojibake as "content".
    if text:
        bad = text.count("�") + text.count("\x00")
        if bad / len(text) > 0.05:
            errors.append(
                {"type": "encoding", "severity": "error", "page": 0,
                 "message": f"{bad}/{len(text)} undecodable chars"}
            )
    n_lines = text.count("\n") + 1 if text else 0
    n_blocks = len(spans)
    quality = _quality(
        max(1, n_blocks), n_blocks, n_lines, text, cfg
    )
    return {
        "branch": "html",
        "extracted_text": text,
        "spans": spans,
        "tables": [],
        "footnotes": [],
        "quality": quality,
        "errors": errors,
        "n_pages": 1,
    }


def extract_document(
    payload: bytes, cfg: ExtractConfig = DEFAULT_CONFIG
) -> dict[str, Any]:
    """Route by magic bytes and extract. Never raises — failures are
    recorded in the ``errors`` array (reference recovery contract,
    ``error_handler.py:418-479``)."""
    try:
        if payload[: len(PDF_MAGIC)] == PDF_MAGIC:
            return extract_pdf_document(payload, cfg)
        return extract_html_document(payload, cfg)
    except Exception as exc:  # absolute backstop — a doc must never kill a task
        return {
            "branch": "pdf" if payload[:5] == PDF_MAGIC else "html",
            "extracted_text": "",
            "spans": [],
            "tables": [],
            "footnotes": [],
            "quality": {"score": 0.0, "grade": "F", "coverage": 0.0},
            "errors": [
                {"type": "unknown", "severity": "critical", "page": 0,
                 "message": f"unhandled: {exc}"}
            ],
            "n_pages": 0,
        }
