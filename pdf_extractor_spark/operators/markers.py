"""F5: page/document marker add, strip, and split utilities.

Reference semantics (``output_formatter.py`` in
``/root/reference/pdf_extractor_new/``):

- ``format_document`` (:49-163): ``[DOCUMENT FILENAME: x]`` header +
  ``--- PAGE N START ---`` / ``--- PAGE N END ---`` fences per page,
  blank-line separated, ``\\n{4,}`` squeezed. The optional timestamp
  header is OFF by default in the reference and stays off here
  (wall-clock content would break byte determinism).
- ``split_by_pages`` (:330-350): regex over the fences (the reference
  pattern uses a backreference ``\\1`` to pair START/END numbers —
  fine in Python, unsupported in RE2, so the SQL twins count fences
  with a backref-free pattern).
- ``remove_markers`` (:352-385): strip header/page/table markers,
  squeeze ``\\n{3,}`` to ``\\n\\n``, trim.

Markers are OFF by default in the extraction pipeline (reference
``add_page_markers`` defaults interact with config); these are the
user-facing utilities a reference user calls on formatted output.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

PAGE_START = "--- PAGE {n} START ---"
PAGE_END = "--- PAGE {n} END ---"

_SPLIT_RE = re.compile(
    r"--- PAGE (\d+) START ---\s*(.*?)\s*--- PAGE \1 END ---", re.DOTALL
)

# (pattern, replacement) — identical in Python / Java / RE2
_REMOVE_RULES: list[tuple[str, str]] = [
    (r"\[DOCUMENT FILENAME:[^\]]*\]", ""),
    (r"\[EXTRACTED:[^\]]*\]", ""),
    (r"\[PAGES:[^\]]*\]", ""),
    (r"\[WORDS:[^\]]*\]", ""),
    (r"[-=#+]+ PAGE \d+ (START|END) [-=#+]+", ""),
    (r"\[TABLE:[^\]]*\]", ""),
    (r"\[TABLE END\]", ""),
    (r"\n{3,}", "\n\n"),
]


def format_document(pages: list[str], filename: str) -> str:
    """Reference ``format_document`` deterministic subset: header +
    per-page fences, blank-line separated, blank-run squeeze, strip."""
    parts = [f"[DOCUMENT FILENAME: {filename}]", ""]
    for n, page_text in enumerate(pages, 1):
        parts.append(PAGE_START.format(n=n))
        parts.append("")
        parts.append(page_text.strip())
        parts.append("")
        parts.append(PAGE_END.format(n=n))
        parts.append("")
    text = "\n".join(parts)
    text = re.sub(r"\n{4,}", "\n\n\n", text)
    return text.strip()


def split_by_pages(text: str) -> list[str]:
    """Reference ``split_by_pages`` — paired-fence extraction."""
    return [m.group(2).strip() for m in _SPLIT_RE.finditer(text)]


def remove_markers(text: str) -> str:
    """Reference ``remove_markers`` — kernel twin of the chain."""
    for pat, rep in _REMOVE_RULES:
        text = re.sub(pat, rep, text)
    return text.strip()


def remove_markers_col(col: Column) -> Column:
    """Native Spark twin (regexp_replace chain, codegen). The final
    strip is a regex (``^\\s+|\\s+$``), NOT ``trim()`` — SQL trim
    removes spaces only, while the kernel's ``.strip()`` removes
    newlines too."""
    for pat, rep in _REMOVE_RULES:
        col = F.regexp_replace(col, pat, rep)
    return F.regexp_replace(col, r"^\s+|\s+$", "")


#  F8 — quality/confidence markers (reference ``output_formatter.py:
#  38-47`` taxonomy, ``:165-187`` insertion)
QUALITY_MARKERS: dict[str, str] = {
    "illegible": "[illegible]",
    "uncertain": "[?]",
    "order_uncertain": "[order uncertain]",
    "possibly_superscript": "[possibly superscript]",
    "possibly_subscript": "[possibly subscript]",
    "empty_cell": "[empty]",
    "corrected": "[corrected]",
    "missing": "[missing text]",
}


def add_quality_marker(
    text: str, marker_type: str, position: int | None = None
) -> str:
    """Reference ``add_quality_marker``: insert the marker at
    ``position``, else append with a space; unknown types are a
    no-op."""
    marker = QUALITY_MARKERS.get(marker_type)
    if marker is None:
        return text
    if position is not None:
        return text[:position] + marker + text[position:]
    return text + " " + marker


def add_quality_marker_col(
    col: Column, marker_type: str, position: int | None = None
) -> Column:
    """Native twin of :func:`add_quality_marker` (``concat`` /
    ``substring`` splice — codegen, no UDF)."""
    marker = QUALITY_MARKERS.get(marker_type)
    if marker is None:
        return col
    if position is not None:
        return F.concat(
            F.substring(col, 1, position),
            F.lit(marker),
            col.substr(F.lit(position + 1), F.length(col)),
        )
    return F.concat(col, F.lit(" " + marker))


def duck_remove_markers_expr(expr: str) -> str:
    """DuckDB twin of the removal chain. DuckDB single-quoted strings
    do NOT process backslash escapes, so regex patterns pass through
    verbatim; newline REPLACEMENTS are built with chr(10) since RE2
    replacement strings have no escape for them."""
    for pat, rep in _REMOVE_RULES:
        sql_pat = pat.replace("'", "''")
        if "\n" in rep:
            sql_rep = " || ".join("chr(10)" for _ in rep)
        else:
            sql_rep = "'{}'".format(rep.replace("'", "''"))
        expr = f"regexp_replace({expr}, '{sql_pat}', {sql_rep}, 'g')"
    return f"regexp_replace({expr}, '^\\s+|\\s+$', '', 'g')"
