"""F7: deterministic OCR-confusion detection + fix chain.

Reference semantics (``llm_verifier.py`` in
``/root/reference/pdf_extractor_new/``):

- detection battery ``llm_verifier.py:117-139`` (digit-in-word,
  ambiguous Il1/O0, rn-as-m, broken prefix/suffix, hyphen break,
  excess spaces) and the JP additions
  ``llm_verifier_enhanced.py:141-190`` (duplicate JP punctuation);
- the MOCK backend's deterministic fixes ``llm_verifier.py:341-404``:
  digit-letter confusion between lowercase letters (1→i, 0→o, 5→s),
  broken suffix join, broken prefix join, excess-space squeeze.

The reference's LLM verification is off by default and excluded
(SURVEY.md §7.3); this module ships ONLY the deterministic subset as a
pure ``regexp_replace`` chain — byte-identical across three engines
(Python kernel twin, Spark/Java, DuckDB/RE2). Engine-portability
constraints shape the exact patterns:

- RE2 has no lookarounds, so the reference's ``(?<=[a-z])1(?=[a-z])``
  becomes a capture-both-sides rule applied TWICE (overlapping chains
  like ``a1b1c`` need the second pass; two passes are sufficient since
  each pass fixes every other link of an alternating chain).
- ``\\w``/``\\b`` are Unicode-aware in Python but ASCII in Java/RE2,
  so character classes are written explicitly (``[A-Za-z]``) and word
  boundaries as explicit context groups.
- Space runs use ``' '`` classes (not ``\\s``) so newlines survive.

Fix order follows the mock: digit-letter, suffix, prefix, spaces, then
JP punctuation. The mock applies at most one fix per issue snippet
(if/elif); this chain applies all stages to the whole text — a
difference documented here, required for a single-pass column
transform.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement_spark, replacement_re, n_passes)
OCR_FIXES: list[tuple[str, str, str, int]] = [
    # digit-letter confusion (llm_verifier.py:369-372), 2 passes each
    (r"([a-z])1([a-z])", r"$1i$2", r"\1i\2", 2),
    (r"([a-z])0([a-z])", r"$1o$2", r"\1o\2", 2),
    (r"([a-z])5([a-z])", r"$1s$2", r"\1s\2", 2),
    # broken suffix join (llm_verifier.py:377-379). The reference list
    # also holds "ed|er|able" — legitimate standalone English words
    # ("was able", "better er...") that the reference only ever sees
    # inside a flagged ±100-char issue snippet; a TEXT-GLOBAL chain
    # must drop them or it corrupts ordinary prose.
    (
        r"([A-Za-z]{3,}) +(ing|tion|ment|ness|ly|est|ous|ive|"
        r"ible)($|[^A-Za-z])",
        r"$1$2$3",
        r"\1\2\3",
        1,
    ),
    # broken prefix join (llm_verifier.py:383-385); "over|under" from
    # the reference list are prepositions ("over the") — excluded from
    # the global chain for the same reason as above.
    (
        r"(^|[^A-Za-z])(un|re|pre|dis|mis|non) +([A-Za-z]{3,})",
        r"$1$2$3",
        r"\1\2\3",
        1,
    ),
    # excess spaces → exactly two (llm_verifier.py:389-391)
    (r" {3,}", "  ", "  ", 1),
    # duplicate JP punctuation (llm_verifier_enhanced.py:163-165)
    (r"。{2,}", "。", "。", 1),
    (r"、{2,}", "、", "、", 1),
]

# detection battery (llm_verifier.py:117-139 subset that is
# engine-portable; flags only, like the reference's identify_issues)
OCR_ISSUE_PATTERNS: list[tuple[str, str]] = [
    ("digit_in_word", r"[a-zA-Z]+[0-9]+[a-zA-Z]+"),
    ("ambiguous_il1", r"(^|[^A-Za-z0-9])[Il1][Il1]+($|[^A-Za-z0-9])"),
    ("ambiguous_o0", r"(^|[^A-Za-z0-9])[O0][O0]+($|[^A-Za-z0-9])"),
    ("rn_as_m", r"rn[a-z]"),
    ("excess_spaces", r" {3,}"),
    ("duplicate_punct", r"[。、]{2,}"),
]


def ocr_fix_text(text: str) -> str:
    """Python kernel twin of the chain — byte-identical to
    :func:`ocr_fix_col` (same patterns, same pass counts)."""
    for pat, _spark_rep, py_rep, passes in OCR_FIXES:
        for _ in range(passes):
            text = re.sub(pat, py_rep, text)
    return text


def ocr_fix_col(col: Column) -> Column:
    """Native Spark ``regexp_replace`` chain — whole-stage codegen,
    no UDF."""
    for pat, spark_rep, _py_rep, passes in OCR_FIXES:
        for _ in range(passes):
            col = F.regexp_replace(col, pat, spark_rep)
    return col


def ocr_issue_flags(col: Column) -> list[Column]:
    """One boolean column per detection pattern (``rlike`` — native)."""
    return [
        col.rlike(pat).alias(f"has_{name}")
        for name, pat in OCR_ISSUE_PATTERNS
    ]


def duck_ocr_fix_expr(expr: str) -> str:
    """DuckDB twin of the chain as a nested regexp_replace expression
    over SQL-text ``expr`` (RE2, 'g' flag = replace-all like Spark)."""
    for pat, _spark_rep, py_rep, passes in OCR_FIXES:
        sql_pat = pat.replace("'", "''")
        sql_rep = py_rep.replace("'", "''")
        for _ in range(passes):
            expr = f"regexp_replace({expr}, '{sql_pat}', '{sql_rep}', 'g')"
    return expr


def duck_ocr_issue_exprs(expr: str) -> list[str]:
    """DuckDB twin of the detection flags."""
    return [
        f"regexp_matches({expr}, '{pat}') AS has_{name}"
        for name, pat in OCR_ISSUE_PATTERNS
    ]


# W7: issue-overlap resolution (reference ``llm_verifier.py:265-282``:
# when detected text issues overlap, keep the higher-confidence one).
# The reference gets confidences from its verifier backends; this
# deterministic engine assigns a fixed confidence per issue TYPE
# (ordered by how unambiguous the pattern is — our constants, chosen
# so the ordering below is total and documented here, not copied).
ISSUE_CONFIDENCE: dict[str, float] = {
    "duplicate_punct": 0.95,
    "excess_spaces": 0.9,
    "digit_in_word": 0.8,
    "ambiguous_o0": 0.7,
    "ambiguous_il1": 0.65,
    "rn_as_m": 0.5,
}

# Span-accurate variants of the detection battery. The column flags
# above must avoid lookarounds (RE2), so they consume their boundary
# characters — fine for a boolean, wrong for SPANS: the consumed
# boundary inflates the span (two disjoint issues separated by one
# space would falsely "overlap") and eats the character the NEXT
# occurrence needs ('ll ll ll' would match only twice). The kernel
# runs under Python ``re``, which has lookarounds, so the span
# patterns assert boundaries without consuming them. Flag parity with
# OCR_ISSUE_PATTERNS is asserted in tests.
OCR_ISSUE_SPAN_PATTERNS: list[tuple[str, str]] = [
    ("digit_in_word", r"[a-zA-Z]+[0-9]+[a-zA-Z]+"),
    ("ambiguous_il1", r"(?<![A-Za-z0-9])[Il1][Il1]+(?![A-Za-z0-9])"),
    ("ambiguous_o0", r"(?<![A-Za-z0-9])[O0][O0]+(?![A-Za-z0-9])"),
    ("rn_as_m", r"rn[a-z]"),
    ("excess_spaces", r" {3,}"),
    ("duplicate_punct", r"[。、]{2,}"),
]


def detect_issue_spans(text: str) -> list[dict]:
    """Run the detection battery with SPANS (``re.finditer``) — the
    input to overlap resolution. Kernel-side only: match positions are
    not expressible natively in Spark SQL or DuckDB, so this runs
    inside the extraction ``mapInPandas`` stage (per-document work on
    an Arrow batch), exactly like the other kernel operators."""
    issues = []
    for name, pat in OCR_ISSUE_SPAN_PATTERNS:
        for m in re.finditer(pat, text):
            issues.append(
                {
                    "start": m.start(),
                    "end": m.end(),
                    "type": name,
                    "confidence": ISSUE_CONFIDENCE[name],
                }
            )
    issues.sort(key=lambda i: (i["start"], i["end"], i["type"]))
    return issues


def resolve_issue_overlaps(issues: list[dict]) -> list[dict]:
    """W7 (reference ``llm_verifier.py:265-282``): of two overlapping
    issues keep the higher-confidence one. Deterministic greedy sweep:
    accept issues in (confidence DESC, start, end, type) order, reject
    any that overlaps an accepted span. Output in document order."""
    ordered = sorted(
        issues,
        key=lambda i: (-i["confidence"], i["start"], i["end"], i["type"]),
    )
    kept: list[dict] = []
    for cand in ordered:
        if all(
            cand["end"] <= k["start"] or cand["start"] >= k["end"]
            for k in kept
        ):
            kept.append(cand)
    kept.sort(key=lambda i: (i["start"], i["end"], i["type"]))
    return kept
