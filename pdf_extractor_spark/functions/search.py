"""BM25 keyword search over the corpus (inverted-index shape).

The retrieval counterpart to the ANN operators: build a term-level
inverted index with one aggregate chain (tokenize → per-(doc, term)
tf → per-term df → idf), then score a query with the standard
Okapi BM25 formula

    score(d, q) = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·len/avgdl))
    idf(t) = ln( (N − df + 0.5) / (df + 0.5) + 1 )        (Lucene form)

Everything is native (split/explode/aggregate/broadcast join); the
DuckDB twin reproduces the arithmetic exactly — ``ln`` on identical
doubles matches across engines (same precedent as the unigram-LM
cost filter), and scores are rounded before comparison anyway.

Scale shape (100 TB): the index build is two hash aggregates —
(doc_id, term) then (term) — both map-side combinable; term keys in
production would be ``xxhash64(term)`` so the exchanges never carry
raw strings (text keys kept here for the readable oracle). Query
scoring joins the (tiny, broadcast) query-term idf table against the
postings and aggregates per doc — the postings table never shuffles
on anything wider than (term, doc_id, tf). A served system would
partition the postings BY TERM (``partitionBy``/bucketing, exactly
the ivf_index pattern) so a query prunes to its terms' partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
DEFAULT_QUERY = ("spark", "merge", "window")


def tokenize(docs: DataFrame) -> DataFrame:
    """(doc_id, term) rows — whitespace tokens, empties dropped."""
    return docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")


def build_postings(docs: DataFrame) -> DataFrame:
    """Inverted-index postings: (term, doc_id, tf, doc_len)."""
    toks = tokenize(docs)
    doclen = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("doc_len")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return tf.join(doclen, "doc_id")


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` by BM25, scores rounded
    to 6 decimals; doc_id breaks ties for a total order."""
    n_docs = docs.count()  # scalar: drives idf; one cheap job
    postings = build_postings(docs)
    avgdl = postings.select(
        (F.sum("tf") / F.countDistinct("doc_id")).alias("avgdl")
    )
    df_tbl = (
        postings.filter(F.col("term").isin(*query_terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .withColumn(
            "idf",
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            ),
        )
    )
    scored = (
        postings.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "part_score",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * F.col("doc_len") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part_score"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return scored


def duck_bm25_sql(
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    source: str = "documents",
) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM {source}
), toks_ne AS (
  SELECT doc_id, term FROM toks WHERE term <> ''
), doclen AS (
  SELECT doc_id, count(*) AS doc_len FROM toks_ne GROUP BY doc_id
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks_ne GROUP BY doc_id, term
), postings AS (
  SELECT tf.term, tf.doc_id, tf.tf, doclen.doc_len
  FROM tf JOIN doclen USING (doc_id)
), stats AS (
  SELECT CAST(sum(tf) AS DOUBLE) / count(DISTINCT doc_id) AS avgdl
  FROM postings
), n AS (
  SELECT count(*) AS n_docs FROM {source}
), dfq AS (
  SELECT term, count(DISTINCT doc_id) AS df,
         ln((( SELECT n_docs FROM n ) - count(DISTINCT doc_id) + 0.5)
            / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM postings WHERE term IN ({terms})
  GROUP BY term
)
SELECT doc_id,
       round(sum(idf * tf / (tf + {k1} * (1.0 - {b} + {b} * doc_len /
             (SELECT avgdl FROM stats)))), 6) AS score
FROM postings JOIN dfq USING (term)
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
