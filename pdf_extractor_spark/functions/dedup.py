"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard.

Scale design (the 100 TB path):

- **exact**: hash-groupBy on ``md5(text)`` — one shuffle on a 16-byte
  key instead of the full text; map-side partial aggregation collapses
  most duplicates before the exchange.
- **MinHash+LSH**: per-doc signature = min over shingle hashes per
  band (embarrassingly parallel, no shuffle); candidate pairs via an
  equi-join on (band, min-hash) — the LSH bucket join shuffles only
  (band, hash, doc_id) triples, never document text. Skewed buckets
  (boilerplate shingles) are handled by AQE skew-join splitting since
  this IS a join, not a map stage.
- **n-gram Jaccard**: exact verification applied only to LSH candidate
  pairs (candidate count << n²).

Hash function: md5 (bit-identical in Spark and DuckDB) so the oracle
can verify signatures value-for-value. At production scale xxhash64
would be cheaper; md5 keeps cross-engine verifiability and is still
JVM-native here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
SHINGLE_WORDS = 3

# 3-word shingles over a pre-materialized token array ("toks" column) —
# referencing a projected column instead of re-evaluating split() per
# element keeps shingling O(tokens), not O(tokens²). The size guard
# matters at scale: sequence(0, n) counts DOWN for n < 0, so a doc
# under 3 tokens would otherwise produce phantom shingles.
_SHINGLES_FROM_TOKS = (
    "CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(0, size(toks) - 3), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
    "ELSE array() END"
)


def _with_shingles(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "toks", F.split(F.col("text"), " ")
    ).withColumn("shingles", F.expr(_SHINGLES_FROM_TOKS))


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Exact dedup: docs vs distinct text-hashes (hash-groupBy)."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_dups"),
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-document MinHash signature: for each band b, the minimum
    md5 over salted 3-word shingles. Pure map work — no shuffle."""
    sig_cols = [
        F.array_min(
            F.expr(f"transform(shingles, s -> md5(concat('{b}:', s)))")
        ).alias(f"mh{b}")
        for b in range(N_BANDS)
    ]
    return _with_shingles(docs).select("doc_id", *sig_cols)


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """LSH bucket join: docs sharing any band's min-hash become
    candidate near-duplicate pairs (doc_a < doc_b)."""
    sigs = minhash_signatures(docs)
    melted = sigs.selectExpr(
        "doc_id",
        "stack({n}, {args}) as (band, mh)".format(
            n=N_BANDS,
            args=", ".join(f"{b}, mh{b}" for b in range(N_BANDS)),
        ),
    ).where(F.col("mh").isNotNull())
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mh") == F.col("b.mh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def lsh_pair_count(docs: DataFrame) -> DataFrame:
    return lsh_candidate_pairs(docs).agg(
        F.count("*").alias("n_candidate_pairs")
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 → fits signed 64-bit in both engines

# SimHash bit j = sign of Σ_tokens (±1 by bit j of h(token)). Expressed
# entirely in higher-order functions: no UDF, no explode. The token
# hashes are materialized ONCE into the ``hs`` column — referencing it
# from the bit loop instead of inlining keeps the md5 work O(tokens),
# not O(tokens × 60).
_TOKEN_HASHES = (
    "transform(split(text, ' '), "
    "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
)
_SIMHASH_FROM_HS = f"""
aggregate(
  sequence(0, {SIMHASH_BITS - 1}),
  cast(0 as bigint),
  (acc, j) -> acc + IF(
    aggregate(hs, 0, (a, h) -> a + IF((shiftright(h, j) & 1) = 1, 1, -1))
      > 0,
    shiftleft(cast(1 as bigint), j),
    cast(0 as bigint))
)
"""


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-document 60-bit SimHash over whitespace tokens (md5-based so
    DuckDB reproduces it bit-for-bit). Pure map stage — no shuffle; at
    100 TB the near-dup join is then a band-join on simhash prefixes
    (Hamming-ball candidates), same two-stage shape as MinHash LSH.

    For very long documents the O(tokens × 60) bit loop is better paid
    in NumPy — :func:`simhash_pandas` is the Arrow-batched scale path
    producing identical values."""
    return (
        docs.withColumn("hs", F.expr(_TOKEN_HASHES))
        .select("doc_id", F.expr(_SIMHASH_FROM_HS).alias("simhash"))
    )


def simhash_pandas(texts) -> "list[int]":
    """NumPy SimHash — identical output to :func:`simhash_signatures`
    (same md5/15-hex-char hash, same sign rule). Intended body for a
    ``mapInPandas`` stage when token counts make the SQL expression the
    bottleneck; also the cross-check used in unit tests."""
    import hashlib

    import numpy as np

    out: list[int] = []
    js = np.arange(SIMHASH_BITS, dtype=np.int64)
    for text in texts:
        toks = text.split(" ")
        hs = np.array(
            [
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in toks
            ],
            dtype=np.int64,
        )
        bits = ((hs[:, None] >> js[None, :]) & 1) * 2 - 1  # ±1 per bit
        sig = int(((bits.sum(axis=0) > 0) << js).sum())
        out.append(sig)
    return out


def simhash_mapinpandas(docs: DataFrame) -> DataFrame:
    """Arrow-batched SimHash — the scale path. Bit-identical to
    :func:`simhash_signatures`; ~40× faster per document because the
    60-bit vote matrix is one NumPy reduction instead of 60 SQL
    aggregate passes over the token-hash array. Pure map stage: no
    shuffle, one JVM↔Python hop per Arrow batch."""
    from collections.abc import Iterator

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "simhash": simhash_pandas(list(pdf["text"])),
                }
            )

    # hash-spread before the Arrow stage: a small parquet table arrives
    # as one split, which would serialize the whole stage onto one task
    n = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n, F.col("doc_id"))
        .mapInPandas(fn, "doc_id long, simhash long")
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates only: the scale-safe
    two-stage shape (cheap LSH recall → exact precision on survivors)."""
    shingle_sets = _with_shingles(docs).select(
        "doc_id",
        F.array_distinct(F.col("shingles")).alias("sh"),
    )
    pairs = lsh_candidate_pairs(docs)
    j = (
        pairs.join(
            shingle_sets.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("sh", "sh_a"),
            "doc_a",
        )
        .join(
            shingle_sets.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("sh", "sh_b"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )
