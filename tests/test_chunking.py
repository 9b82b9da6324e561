"""C8/W6/D3/D6 chunking — kernel semantics + Spark window roundtrip."""

from __future__ import annotations

import pytest

from pdf_extractor_spark.operators.chunking import (
    Chunk,
    ChunkingStrategy,
    chunk_pages,
    find_section_boundaries,
    reassemble_chunks,
)


def _pages(n=10, page_chars=400):
    return [
        (f"Page {i} body. " + ("lorem ipsum dolor sit amet " * 40))[
            :page_chars
        ]
        for i in range(1, n + 1)
    ]


def test_characters_strategy_respects_bounds_and_roundtrips():
    strat = ChunkingStrategy(
        max_chunk_size=1000, min_chunk_size=300, overlap_size=50
    )
    pages = _pages(10, 400)
    chunks = chunk_pages(pages, strat)
    assert len(chunks) > 1
    # greedy cut: every non-final chunk stays within max once min is met
    for c in chunks[:-1]:
        assert c.char_count <= strat.max_chunk_size
        assert c.char_count >= strat.min_chunk_size
    # chunk ids dense, page ranges contiguous and increasing
    assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
    for a, b in zip(chunks, chunks[1:]):
        assert b.page_start == a.page_end + 1
    # reassembly == join of pages (chunks were cut at page boundaries)
    full, removed = reassemble_chunks(chunks)
    assert full == "\n\n".join(pages)
    assert removed == 0  # overlap lives in metadata, not content


def test_overlap_metadata_w6():
    strat = ChunkingStrategy(
        max_chunk_size=900, min_chunk_size=300, overlap_size=120
    )
    chunks = chunk_pages(_pages(8, 400), strat)
    assert len(chunks) >= 3
    assert chunks[0].overlap_start_text == ""
    for prev, cur in zip(chunks, chunks[1:]):
        assert cur.overlap_start_text == prev.content[-120:]
        assert prev.overlap_end_text == prev.content[-120:]
    assert chunks[-1].overlap_end_text == ""


def test_reassembly_strips_repeated_overlap_d3():
    strat = ChunkingStrategy(
        max_chunk_size=900, min_chunk_size=300, overlap_size=60
    )
    chunks = chunk_pages(_pages(8, 400), strat)
    # simulate processed contents that PREPEND the overlap context
    processed = [
        (c.overlap_start_text + c.content if i > 0 else c.content)
        for i, c in enumerate(chunks)
    ]
    full, removed = reassemble_chunks(chunks, processed)
    assert removed == len(chunks) - 1
    assert full == "\n\n".join(c.content for c in chunks)


def test_pages_strategy_partitions_evenly():
    strat = ChunkingStrategy(max_chunk_size=1200, chunk_by="pages")
    pages = _pages(10, 400)
    chunks = chunk_pages(pages, strat)
    # avg page 400 chars -> 3 pages per chunk -> 4 chunks (3+3+3+1)
    assert [(c.page_start, c.page_end) for c in chunks] == [
        (1, 3), (4, 6), (7, 9), (10, 10)
    ]
    full, _ = reassemble_chunks(chunks)
    assert full == "\n\n".join(pages)


def test_words_strategy_cuts_on_word_budget():
    strat = ChunkingStrategy(
        max_chunk_size=1000, min_chunk_size=250, chunk_by="words"
    )  # -> 200 words max, 50 words min per chunk
    pages = _pages(10, 400)
    chunks = chunk_pages(pages, strat)
    assert len(chunks) > 1
    for c in chunks[:-1]:
        assert c.word_count <= 200
    full, _ = reassemble_chunks(chunks)
    assert full == "\n\n".join(pages)


def test_section_boundaries_sorted_unique_d6():
    text = "intro\n1. first\nbody\n2.1 sub\nmore\n=== \ntail\n1. first"
    bounds = find_section_boundaries(text)
    assert bounds == sorted(set(bounds))
    starts = {text[b : b + 2] for b in bounds}
    assert starts == {"1.", "2.", "=="}
    # sub-section start matched by both \d+\. and \d+\.\d+ -> one entry
    assert len(bounds) == 4


def test_sections_strategy_falls_back_without_headings():
    strat = ChunkingStrategy(
        max_chunk_size=1000, min_chunk_size=300, chunk_by="sections"
    )
    pages = _pages(6, 400)  # no headings anywhere
    assert [c.content for c in chunk_pages(pages, strat)] == [
        c.content for c in chunk_pages(pages, ChunkingStrategy(
            max_chunk_size=1000, min_chunk_size=300))
    ]


def test_sections_strategy_cuts_at_headings():
    strat = ChunkingStrategy(
        max_chunk_size=300, min_chunk_size=100, chunk_by="sections"
    )
    pages = [
        "1. Alpha\n" + "a " * 100,
        "2. Beta\n" + "b " * 100,
        "3. Gamma\n" + "c " * 100,
    ]
    chunks = chunk_pages(pages, strat)
    assert len(chunks) > 1
    # every cut lands exactly on a section heading
    for c in chunks[1:]:
        assert c.content.startswith(("1.", "2.", "3."))
    # section chunks concatenate back to the full text; the "\n\n"
    # rejoin adds separator newlines (reference behavior), so compare
    # newline-insensitively
    full, _ = reassemble_chunks(chunks)
    assert full.replace("\n", "") == "\n\n".join(pages).replace("\n", "")


def test_spark_window_chunker_roundtrip(spark):
    """functions/chunking.py: exact inverse at dataset scale, and the
    closed-form chunk count the oracle uses matches reality."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pdf_extractor_spark.functions.chunking import (
        chunk_text,
        reassemble_text,
    )

    texts = [
        "x" * 19,            # shorter than overlap -> 1 chunk
        "y" * 120,           # exactly chunk_size -> 1 chunk
        "z" * 121,           # one past -> 2 chunks
        "humpty dumpty sat on a wall " * 20,  # 560 chars -> 6 chunks
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    chunks = chunk_text(docs, chunk_size=120, overlap=20)
    got_counts = {
        r["doc_id"]: r["n"]
        for r in chunks.groupBy("doc_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert got_counts == {0: 1, 1: 1, 2: 2, 3: 6}
    out = {
        r["doc_id"]: r["reassembled"]
        for r in reassemble_text(chunks, overlap=20).collect()
    }
    assert out == dict(enumerate(texts))
    # every non-first chunk begins with the previous chunk's tail (W6)
    rows = sorted(
        chunks.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["content"])
    for parts in by_doc.values():
        for prev, cur in zip(parts, parts[1:]):
            assert cur[:20] == prev[-20:]


def test_spark_window_chunker_rejects_bad_overlap(spark):
    from pdf_extractor_spark.functions.chunking import chunk_text

    with pytest.raises(ValueError):
        chunk_text(spark.range(1), chunk_size=10, overlap=10)


def test_chunk_page_lookup_and_streaming_process():
    from pdf_extractor_spark.operators.chunking import (
        ChunkingStrategy,
        chunk_pages,
        get_chunk_for_page,
        process_chunks_streaming,
    )

    strat = ChunkingStrategy(
        max_chunk_size=900, min_chunk_size=300, overlap_size=40
    )
    pages = _pages(8, 400)
    chunks = chunk_pages(pages, strat)
    # every page resolves to exactly the chunk holding it
    for p in range(1, len(pages) + 1):
        c = get_chunk_for_page(chunks, p)
        assert c is not None and c.page_start <= p <= c.page_end
    assert get_chunk_for_page(chunks, 999) is None

    seen = list(
        process_chunks_streaming(
            chunks, lambda content, ctx: (len(content), len(ctx))
        )
    )
    assert [cid for cid, _ in seen] == [c.chunk_id for c in chunks]
    # first chunk has no context; later ones get the 40-char overlap
    assert seen[0][1][1] == 0
    for _, (_, ctx_len) in seen[1:]:
        assert ctx_len == 40
