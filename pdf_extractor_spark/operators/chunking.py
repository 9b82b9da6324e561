"""Intra-document chunking kernel — SURVEY.md §2 C8/W6/D3/D6.

Faithful re-expression of the reference chunker's per-document
semantics (``context_windows.py``), for use on extraction output where
a page list exists. Spark partitioning replaces chunking as the
*distribution* mechanism (SURVEY §7.3); this kernel is the optional
intra-document split for oversized documents, and the semantic model
the dataset-scale ``functions/chunking.py`` windows compress into.

Reference mapping (file:line):

- greedy page accumulation by characters ``context_windows.py:181-213``
- pages-per-chunk strategy ``:215-233``
- section-boundary strategy with char fallback ``:235-276``
- words strategy (5 chars/word estimate) ``:278-316``
- ``_find_section_boundaries`` ``:318-329`` (D6: sorted set of match
  starts over the 7-pattern battery ``:133-141``)
- overlap metadata ``:353-374`` (W6: last ``overlap_size`` chars of the
  neighbor chunk)
- reassembly with overlap strip + blank-line cleanup ``:407-466`` (D3)

Per-document lists are small (pages ≈ 10²); plain Python here keeps
byte-semantics obvious, and the kernel runs inside Arrow batches when
invoked from the pipeline.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# reference context_windows.py:133-141 — section heading battery
SECTION_PATTERNS: list[re.Pattern] = [
    re.compile(p, re.MULTILINE)
    for p in (
        r"^#{1,6}\s+",                # markdown headers
        r"^\d+\.\s+",                 # numbered sections
        r"^\d+\.\d+\s+",              # sub-sections
        r"^第\d+[章条節項]",           # Japanese sections
        r"^[一二三四五六七八九十]+[、.]",  # Japanese numbering
        r"^={3,}",                    # section breaks
        r"^-{3,}",                    # horizontal rules
    )
]


@dataclass
class Chunk:
    chunk_id: int
    page_start: int
    page_end: int
    content: str
    word_count: int
    char_count: int
    overlap_start_text: str = ""
    overlap_end_text: str = ""


@dataclass(frozen=True)
class ChunkingStrategy:
    """Defaults mirror reference ``context_windows.py:51-54``."""

    max_chunk_size: int = 50_000
    overlap_size: int = 500
    min_chunk_size: int = 1_000
    chunk_by: str = "characters"  # characters | pages | words | sections


def find_section_boundaries(text: str) -> list[int]:
    """D6: match-start positions over the battery, sorted + deduped
    (reference ``:318-329`` — the ``sorted(set(...))`` step IS the
    dedup operator)."""
    boundaries: set[int] = set()
    for rx in SECTION_PATTERNS:
        for m in rx.finditer(text):
            boundaries.add(m.start())
    return sorted(boundaries)


def _make_chunk(chunk_id: int, page_nums: list[int], content: str) -> Chunk:
    return Chunk(
        chunk_id=chunk_id,
        page_start=min(page_nums) if page_nums else 1,
        page_end=max(page_nums) if page_nums else 1,
        content=content,
        word_count=len(content.split()),
        char_count=len(content),
    )


def _chunk_by_characters(
    pages: list[str], strategy: ChunkingStrategy
) -> list[Chunk]:
    chunks: list[Chunk] = []
    content, page_nums = "", []
    for page_num, page_text in enumerate(pages, 1):
        # the budget test ignores the 2-char page joiner — replicated
        # from the reference (``:189-190``), which makes the same
        # comparison before appending "\n\n" + page
        if (
            len(content) + len(page_text) > strategy.max_chunk_size
            and len(content) >= strategy.min_chunk_size
        ):
            chunks.append(_make_chunk(len(chunks), page_nums, content))
            content, page_nums = "", []
        if content:
            content += "\n\n"
        content += page_text
        page_nums.append(page_num)
    if content:
        chunks.append(_make_chunk(len(chunks), page_nums, content))
    return chunks


def _chunk_by_pages(
    pages: list[str], strategy: ChunkingStrategy
) -> list[Chunk]:
    total = sum(len(p) for p in pages)
    avg = total / len(pages) if pages else 0
    per_chunk = max(1, int(strategy.max_chunk_size / avg)) if avg else 1
    chunks = []
    for i in range(0, len(pages), per_chunk):
        group = pages[i : i + per_chunk]
        nums = list(range(i + 1, i + len(group) + 1))
        chunks.append(_make_chunk(len(chunks), nums, "\n\n".join(group)))
    return chunks


def _chunk_by_words(
    pages: list[str], strategy: ChunkingStrategy
) -> list[Chunk]:
    max_words = strategy.max_chunk_size // 5
    min_words = strategy.min_chunk_size // 5
    chunks: list[Chunk] = []
    content, page_nums, n_words = "", [], 0
    for page_num, page_text in enumerate(pages, 1):
        page_words = len(page_text.split())
        if n_words + page_words > max_words and n_words >= min_words:
            chunks.append(_make_chunk(len(chunks), page_nums, content))
            content, page_nums, n_words = "", [], 0
        if content:
            content += "\n\n"
        content += page_text
        page_nums.append(page_num)
        n_words += page_words
    if content:
        chunks.append(_make_chunk(len(chunks), page_nums, content))
    return chunks


def _estimate_page_numbers(content: str, pages: list[str]) -> list[int]:
    nums = [
        n
        for n, p in enumerate(pages, 1)
        if p[:100] in content or p[-100:] in content
    ]
    return nums or [1]


def _chunk_by_sections(
    pages: list[str], strategy: ChunkingStrategy
) -> list[Chunk]:
    full_text = "\n\n".join(pages)
    boundaries = find_section_boundaries(full_text)
    if not boundaries:
        return _chunk_by_characters(pages, strategy)
    chunks: list[Chunk] = []
    start, content = 0, ""
    for boundary in boundaries:
        section = full_text[start:boundary]
        if (
            len(content) + len(section) > strategy.max_chunk_size
            and len(content) >= strategy.min_chunk_size
        ):
            nums = _estimate_page_numbers(content, pages)
            chunks.append(_make_chunk(len(chunks), nums, content))
            content = ""
        content += section
        start = boundary
    content += full_text[start:]
    if content:
        nums = _estimate_page_numbers(content, pages)
        chunks.append(_make_chunk(len(chunks), nums, content))
    return chunks


def chunk_pages(
    pages: list[str], strategy: ChunkingStrategy | None = None
) -> list[Chunk]:
    """C8: split a page list into chunks, then attach W6 overlap
    metadata (previous chunk's last ``overlap_size`` chars)."""
    strategy = strategy or ChunkingStrategy()
    by = {
        "pages": _chunk_by_pages,
        "sections": _chunk_by_sections,
        "words": _chunk_by_words,
    }.get(strategy.chunk_by, _chunk_by_characters)
    chunks = by(pages, strategy)
    if len(chunks) >= 2:
        ov = strategy.overlap_size
        for i, chunk in enumerate(chunks):
            if i > 0:
                chunk.overlap_start_text = chunks[i - 1].content[-ov:]
            if i < len(chunks) - 1:
                # the reference stores the chunk's OWN tail here
                # (``:370-372``) — i.e. the overlap it SHARES with the
                # next chunk's start context, not lookahead text;
                # replicated as-is
                chunk.overlap_end_text = chunk.content[-ov:]
    return chunks


def reassemble_chunks(
    chunks: list[Chunk], processed_contents: list[str] | None = None
) -> tuple[str, int]:
    """D3 reassembly (reference ``:407-466``): strip a chunk's leading
    overlap when the (possibly processed) content repeats it, join with
    blank lines, collapse runs of 4+ newlines. Returns
    (full_text, duplicates_removed)."""
    contents = (
        processed_contents
        if processed_contents is not None
        else [c.content for c in chunks]
    )
    deduped: list[str] = []
    removed = 0
    for i, content in enumerate(contents):
        if i > 0:
            prev_overlap = chunks[i].overlap_start_text
            if prev_overlap and content.startswith(prev_overlap):
                content = content[len(prev_overlap):]
                removed += 1
        deduped.append(content)
    full_text = "\n\n".join(deduped)
    full_text = re.sub(r"\n{4,}", "\n\n\n", full_text)
    return full_text, removed


def get_chunk_for_page(chunks: list[Chunk], page_num: int) -> Chunk | None:
    """Reference ``get_chunk_for_page`` (``context_windows.py:467-472``):
    first chunk whose page range contains the page."""
    for chunk in chunks:
        if chunk.page_start <= page_num <= chunk.page_end:
            return chunk
    return None


def process_chunks_streaming(chunks, processor_func):
    """Reference ``process_chunks_streaming`` (``:386-405``): apply a
    function to each chunk with its leading overlap as context,
    yielding ``(chunk_id, result)`` lazily — the per-document
    generator the Arrow batch loop drives when a processor needs
    cross-cut context."""
    for chunk in chunks:
        context = chunk.overlap_start_text or ""
        yield chunk.chunk_id, processor_func(chunk.content, context)
