"""PDF document-metadata harvesting: /Info + /Outlines → typed rows.

The HTML branch harvests <title>/Open-Graph metas; the PDF branch's
counterpart is the document-information dictionary (ISO 32000
§14.3.3) and the document outline (§12.3.3) — title/author/producer
and the bookmark tree are the only structure-level metadata most
crawled PDFs carry, and a corpus pipeline wants them for dedup keys,
provenance and section-aware chunking.  This operator exercises the
REAL path: each document wraps into a PDF whose trailer references an
/Info dict (ASCII literals AND UTF-16BE-with-BOM hex strings — the
two text-string spellings real writers emit, §7.9.2.2) and whose
catalog references an outline tree linked /First /Last /Next /Prev
/Parent; ``operators.pdf_tokenizer.parse_pdf`` recovers both through
the same xref/object machinery as text extraction.  Traps: every
11th document's outline is a malformed SIBLING RING (the last
top-level item's /Next points back at the first — real broken
writers emit this), which the tokenizer's visited guard must
terminate loudly without losing or double-counting items; every 13th
document has no outline at all.

Scale shape (100 TB contract): harvesting rides the extraction pass —
``parse_pdf`` already resolves every object body, so metadata comes
out of the SAME parse that produces the words, zero extra scans; the
output is one fixed-width row per document (strings bounded by the
/Info dict, never page text), so downstream grouping shuffles only
metadata bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.pdf_generator import PageSpec, build_pdf
from ..operators.pdf_tokenizer import parse_pdf
from ..sources.docwrap import _spread


def wrap_pdf_meta(text: str, doc_id: int) -> bytes:
    """One-page PDF carrying the doc's words plus a deterministic
    /Info dict and outline tree (see module docstring for the trap
    schedule)."""
    page = PageSpec(width=60000.0, height=792.0)
    page.put_words(72.0, 400.0, 12.0, text.split(" ")[:8], gap=6.0)
    author_stem = "Authör" if doc_id % 7 == 3 else "Author"
    info = {
        "Title": f"Document {doc_id}",
        "Author": f"{author_stem} {doc_id % 50}",
        "Producer": f"writer/{doc_id % 5}",
    }
    outline: list[tuple[int, str]] = []
    if doc_id % 13 != 7:
        n_top = doc_id % 3 + 1
        n_children = doc_id % 2
        for j in range(1, n_top + 1):
            outline.append((0, f"S{j}"))
            for k in range(1, n_children + 1):
                outline.append((1, f"S{j}.{k}"))
    return build_pdf(
        [page], info=info, outline=outline or None,
        outline_cycle=(doc_id % 11 == 5),
    )


PDF_META_SCHEMA = (
    "doc_id long, title string, author string, producer string, "
    "n_outline long, max_depth long, has_cycle boolean"
)

_COLS = [
    "doc_id", "title", "author", "producer",
    "n_outline", "max_depth", "has_cycle",
]


def _meta_iter(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            payload = wrap_pdf_meta(text, int(doc_id))
            doc = parse_pdf(payload)
            depths = [d for d, _t in doc.outline]
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "title": doc.info.get("Title", ""),
                    "author": doc.info.get("Author", ""),
                    "producer": doc.info.get("Producer", ""),
                    "n_outline": len(doc.outline),
                    "max_depth": max(depths) if depths else -1,
                    "has_cycle": any(
                        "sibling ring" in e["message"]
                        for e in doc.errors
                    ),
                }
            )
        yield pd.DataFrame(rows, columns=_COLS)


def pdf_metadata(docs: DataFrame,
                 num_partitions: int | None = None) -> DataFrame:
    """(doc_id, title, author, producer, n_outline, max_depth,
    has_cycle) — /Info + outline metadata recovered from PDF
    documents by the real tokenizer."""
    return _spread(docs, num_partitions).mapInPandas(
        _meta_iter, PDF_META_SCHEMA
    )


def duck_pdf_meta_sql(source: str = "documents") -> str:
    """Closed-form twin of the wrapper construction: the outline has
    (doc_id % 3 + 1) top sections of (doc_id % 2) children each,
    absent for every 13th document; the sibling-ring trap (every
    11th) changes NOTHING about the harvested rows — the visited
    guard walks the ring exactly once — only the has_cycle flag."""
    return f"""
SELECT doc_id,
  'Document ' || doc_id AS title,
  (CASE WHEN doc_id % 7 = 3 THEN 'Authör ' ELSE 'Author ' END)
    || (doc_id % 50) AS author,
  'writer/' || (doc_id % 5) AS producer,
  CAST(CASE WHEN doc_id % 13 = 7 THEN 0
       ELSE (doc_id % 3 + 1) * (1 + doc_id % 2) END AS BIGINT)
    AS n_outline,
  CAST(CASE WHEN doc_id % 13 = 7 THEN -1
       ELSE doc_id % 2 END AS BIGINT) AS max_depth,
  (doc_id % 11 = 5 AND doc_id % 13 <> 7) AS has_cycle
FROM {source}
"""
