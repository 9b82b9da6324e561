"""Dataset-scale document chunking — SURVEY.md §2 C8/W6/D3.

The reference chunks because a single process cannot hold a monster
document (``context_windows.py:143-351``); Spark partitioning already
spreads documents across executors, so the survey scopes chunking to
an *intra-document* split for oversized payloads. This module is that
split, expressed natively:

- **C8 chunk** (``context_windows.py:181-213``): fixed-size character
  windows. Chunk ``i`` covers ``[i*stride, i*stride + chunk_size)``
  with ``stride = chunk_size - overlap``, so every chunk after the
  first begins with the previous chunk's last ``overlap`` characters —
  the W6 context overlap (``context_windows.py:353-374``) carried in
  the content itself rather than side metadata.
- **D3 reassembly dedup** (``context_windows.py:428-443``): dropping
  the first ``overlap`` characters of every non-first chunk and
  concatenating in chunk order reproduces the document byte-for-byte
  (the roundtrip is oracle-checked in the catalog).

Everything is ``sequence``/``transform``/``posexplode``/``substring``
— a pure per-row map with no shuffle for chunking; reassembly shuffles
once on the document key (unavoidable: it is a grouping). At 100 TB
the chunker's output is bounded by ``1 + overlap/stride`` ≈ 1.2× input
bytes, and reassembly's ``collect_list`` per key holds one document's
chunks only (bounded by the largest document, not the partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    docs: DataFrame,
    chunk_size: int,
    overlap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping character windows.

    Returns (id_col, chunk_id, content, char_count); chunk_id is
    0-based and dense per document. Documents shorter than
    ``chunk_size`` produce exactly one chunk.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    # integer ceil((len - overlap)/stride): (len - overlap + stride - 1) div stride
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.expr(
            f"(length({text_col}) - {overlap} + {stride - 1}) div {stride}"
        ),
    )
    exploded = docs.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
        .alias("chunk_id", "_i"),
        F.col(text_col).alias("_t"),
    ).select(
        id_col,
        "chunk_id",
        F.expr(f"substring(_t, chunk_id * {stride} + 1, {chunk_size})")
        .alias("content"),
    )
    return exploded.withColumn("char_count", F.length("content"))


def reassemble_text(
    chunks: DataFrame,
    overlap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """D3: strip the leading ``overlap`` characters of every non-first
    chunk (they duplicate the previous chunk's tail), order by
    chunk_id, concatenate. Exact inverse of :func:`chunk_text`."""
    piece = F.when(
        F.col("chunk_id") == 0, F.col("content")
    ).otherwise(F.expr(f"substring(content, {overlap} + 1)"))
    return (
        chunks.select(id_col, "chunk_id", piece.alias("_piece"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "_piece"))
                    ),
                    lambda s: s["_piece"],
                ),
                "",
            ).alias("reassembled"),
        )
    )
