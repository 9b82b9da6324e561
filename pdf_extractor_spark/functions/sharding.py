"""Output-shard planning: assign documents to fixed-token-budget
shards and report the manifest.

Every training pipeline materializes its corpus as shards of roughly
equal token count (the unit of dataloader shuffling and of resume
granularity); the assignment is a PREFIX SUM over per-document token
counts in a stable order. A naive single window (``order by doc_id``
over the whole corpus) serializes the cumulative sum onto one task —
correct in an oracle, wrong at scale. This operator implements the
standard two-level distributed prefix sum instead:

1. per-document token counts land in fixed-span doc-id BUCKETS
   (scan-local arithmetic, no shuffle);
2. per-bucket token totals (one small aggregate) get exclusive
   running offsets via a window over the BUCKET list — thousands of
   rows, not billions;
3. the offsets broadcast-join back onto documents, and the
   within-bucket cumulative sum runs as a window PARTITIONED BY
   bucket — all buckets in parallel, each a bounded sort.

``shard_id = tokens_before // SHARD_TOKENS`` (a document belongs to
the shard its first token lands in, so shards can exceed the budget
by at most one document — the standard greedy layout). The DuckDB
twin uses the single-window form, which is bit-identical because the
two-level sum telescopes to the same exclusive prefix.

Determinism: the order key is doc_id (stable across re-runs and
engines); token counts are exact integers; no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: token budget per output shard — fixture-scaled so every SF
#: realizes several shards (production uses ~10^8-10^9)
SHARD_TOKENS = 4000

#: documents per prefix-sum bucket (fixed doc-id span, so bucket
#: membership is scan-local and stable under corpus growth)
BUCKET_SPAN = 64


def shard_manifest(
    docs: DataFrame,
    shard_tokens: int = SHARD_TOKENS,
    bucket_span: int = BUCKET_SPAN,
) -> DataFrame:
    """(shard_id, n_docs, n_tokens, doc_lo, doc_hi) — the manifest a
    shard writer consumes. Two-level distributed prefix sum; see the
    module docstring for the scale argument."""
    base = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.expr(f"doc_id div {bucket_span}").alias("bkt"),
    )
    totals = base.groupBy("bkt").agg(F.sum("n_tok").alias("tot"))
    w_b = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "bkt",
        (F.sum("tot").over(w_b) - F.col("tot")).alias("offset"),
    )
    w_d = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        base.join(F.broadcast(offsets), "bkt")
        .withColumn(
            "before",
            F.col("offset") + F.sum("n_tok").over(w_d) - F.col("n_tok"),
        )
        .withColumn(
            "shard_id", F.expr(f"before div {shard_tokens}")
        )
    )
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
        )
        .orderBy("shard_id")
    )


def duck_shard_manifest_sql(
    source: str = "documents",
    shard_tokens: int = SHARD_TOKENS,
) -> str:
    """Single-window oracle twin (fine at verification scale; the
    Spark side's two-level sum telescopes to the same prefix)."""
    return f"""
WITH counted AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS n_tok
  FROM {source}
), cum AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tok AS before
  FROM counted
)
SELECT CAST(before // {shard_tokens} AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS doc_lo,
       max(doc_id) AS doc_hi
FROM cum
GROUP BY 1
ORDER BY shard_id
"""
