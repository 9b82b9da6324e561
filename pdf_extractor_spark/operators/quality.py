"""A6: the five-dimension quality battery (reference
``quality_scorer.py:164-357`` in ``/root/reference/pdf_extractor_new/``).

Each dimension scores 0-100 with the reference's deduction rules; the
total is the weighted sum (completeness .30, structure .25, accuracy
.20, footnotes .15, readability .10 — ``quality_scorer.py:81-99``),
graded A-F (≥90/80/70/60 — ``:359-364``). Round 1 shipped a reduced
one-check-per-dimension version (verdict: A6 partial); this replicates
the reference's sub-batteries:

- completeness (:164-200): min(coverage%, 100); −10 when an
  ``[extraction error]`` placeholder is present.
- structure (:203-241): −10 no page markers ("page" absent,
  case-insensitive); −10 no ``\\d+.\\d+`` section numbers on >3-page
  docs; −5 no tables on >5-page docs; +5 when ``[TABLE`` markers
  present; −5 on ``\\n{5,}`` runs.
- accuracy (:244-278): −10 per OCR pattern (digit-in-word ``[a-z][0-9]
  [a-z]``, ``\\?\\?\\?+``, ``□+``) exceeding 5 matches; −min(20,
  count) replacement characters.
- footnotes (:281-312): 100 with no markers, else match-rate percent.
- readability (:315-357): −10 average non-empty line length < 20; −5
  when >10% of lines exceed 200 chars; −15 when the 100-char
  non-overlapping chunk unique-ratio < 0.5 (the D5 repeated-content
  check); +5 when a ``[DOCUMENT FILENAME:`` header is present.

Deterministic column math only — every rule is also expressible in SQL
(the ``extract_full_stats`` oracle replays it for wrapped docs).
"""

from __future__ import annotations

import re
from typing import Any

from ..config import ExtractConfig

_SECTION_RE = re.compile(r"\d+\.\d+")
_BLANK_RUN_RE = re.compile(r"\n{5,}")
_OCR_PATTERNS = (
    re.compile(r"[a-z][0-9][a-z]"),
    re.compile(r"\?\?\?+"),
    re.compile(r"□+"),
)


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


def score_completeness(text: str, coverage: float) -> float:
    score = min(coverage * 100.0, 100.0)
    if "[extraction error]" in text.lower():
        score -= 10
    return max(0.0, min(100.0, score))


def score_structure(text: str, n_tables: int, n_pages: int) -> float:
    score = 100.0
    if "page" not in text.lower():
        score -= 10
    if n_pages > 3 and not _SECTION_RE.search(text):
        score -= 10
    if n_tables == 0 and n_pages > 5:
        score -= 5
    elif "[TABLE" in text:
        score += 5
    if _BLANK_RUN_RE.search(text):
        score -= 5
    return max(0.0, min(100.0, score))


def score_accuracy(text: str) -> float:
    score = 100.0
    for pat in _OCR_PATTERNS:
        if len(pat.findall(text)) > 5:
            score -= 10
    bad = text.count("�")
    if bad:
        score -= min(20, bad)
    return max(0.0, min(100.0, score))


def score_footnotes(n_markers: int, match_rate: float) -> float:
    if n_markers == 0:
        return 100.0
    return max(0.0, min(100.0, match_rate * 100.0))


def score_readability(text: str) -> float:
    score = 100.0
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if lines:
        lengths = [len(ln) for ln in lines]
        if sum(lengths) / len(lengths) < 20:
            score -= 10
        long_lines = sum(1 for v in lengths if v > 200)
        if long_lines > len(lines) * 0.1:
            score -= 5
    chunks = [text[i : i + 100] for i in range(0, len(text) - 100, 100)]
    if chunks and len(set(chunks)) / len(chunks) < 0.5:
        score -= 15
    if "[DOCUMENT FILENAME:" in text:
        score += 5
    return max(0.0, min(100.0, score))


def score_quality(
    text: str,
    coverage: float,
    n_pages: int,
    n_tables: int,
    n_markers: int,
    match_rate: float,
    cfg: ExtractConfig,
) -> dict[str, Any]:
    """Full A6 battery → the quality struct (score, grade, coverage,
    status, per-dimension map)."""
    from .inventory import coverage_status

    dims = {
        "completeness": score_completeness(text, coverage),
        "structure": score_structure(text, n_tables, n_pages),
        "accuracy": score_accuracy(text),
        "footnotes": score_footnotes(n_markers, match_rate),
        "readability": score_readability(text),
    }
    score = round(
        cfg.w_completeness * dims["completeness"]
        + cfg.w_structure * dims["structure"]
        + cfg.w_accuracy * dims["accuracy"]
        + cfg.w_footnotes * dims["footnotes"]
        + cfg.w_readability * dims["readability"],
        4,
    )
    return {
        "score": score,
        "grade": _grade(score),
        "coverage": round(coverage, 6),
        "status": coverage_status(coverage),
        "dims": dims,
    }
