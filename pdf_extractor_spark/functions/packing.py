"""Sequence packing: assign documents to fixed token-budget training
sequences (the batch-construction step between a filtered corpus and a
pre-training dataloader).

Pre-training pipelines concatenate documents in a fixed order and cut
the stream into constant-length sequences (e.g. 2048 tokens); a
document belongs to the sequence where it starts. The literal global
version of that is a single serial prefix sum — a scale killer. The
distributed form every real pipeline uses is SHARD-LOCAL packing:
documents are grouped into shards (here ``doc_id // SHARD_DOCS``, in
production a date/crawl partition), the prefix sum runs per shard, and
sequence ids are namespaced by shard. Each shard's window computes in
parallel — ONE hash exchange on the shard key, no global sort, no
driver-side state.

Cross-engine exactness: everything is integer arithmetic over window
sums — both engines agree bit-for-bit.

No reference counterpart (single-document extractor); training-pipeline
operator from the task brief's beyond-the-reference list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: tokens per packed training sequence (the catalog uses whitespace
#: token counts so the oracle is exact; compose with
#: ``functions.bpe.bpe_token_counts`` for subword budgets)
SEQ_BUDGET = 256

#: documents per packing shard — shard-local packing is what keeps the
#: prefix sum parallel; 100-doc shards at test scale, a crawl/date
#: partition at 100 TB
SHARD_DOCS = 100

def pack_sequences(
    docs: DataFrame,
    budget: int = SEQ_BUDGET,
    shard_docs: int = SHARD_DOCS,
) -> DataFrame:
    """Per-document packing report: ``(doc_id, shard_id, n_tokens,
    seq_in_shard, seq_offset)``. The sequence a document starts in is
    the COMPOSITE key ``(shard_id, seq_in_shard)`` — collision-free by
    construction at any shard token total or budget (a single flat
    ``shard * stride + k`` id would alias across shards once a shard
    exceeds ``stride * budget`` tokens). ``seq_offset`` is the
    document's start position in the concatenated shard stream modulo
    ``budget``."""
    # integer `div`, not float division: exact at any doc_id magnitude
    shard = F.expr(f"doc_id div {shard_docs}")
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id",
            shard.alias("shard_id"),
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias(
                "n_tokens"
            ),
        )
        .withColumn(
            "start_pos",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .select(
            "doc_id",
            "shard_id",
            "n_tokens",
            F.expr(f"start_pos div {budget}").alias("seq_in_shard"),
            (F.col("start_pos") % budget).alias("seq_offset"),
        )
    )


def duck_pack_sql(
    source: str = "documents",
    budget: int = SEQ_BUDGET,
    shard_docs: int = SHARD_DOCS,
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    return f"""
SELECT doc_id,
       shard_id,
       n_tokens,
       CAST(start_pos // {budget} AS BIGINT) AS seq_in_shard,
       CAST(start_pos % {budget} AS BIGINT) AS seq_offset
FROM (
  SELECT doc_id, shard_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_pos
  FROM (
    SELECT doc_id,
           doc_id // {shard_docs} AS shard_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM {source}
  )
)
"""
