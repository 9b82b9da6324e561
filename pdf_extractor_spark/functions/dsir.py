"""DSIR-shaped importance weighting over hashed n-gram features.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores every raw document by how target-like its
hashed n-gram feature distribution is, then resamples the raw corpus
toward the target.  This is the standard "make 100 TB of crawl look
like the reference corpus" pre-training step.

As deployed at scale, the TARGET side is computed OFFLINE (hashed
n-gram counts of the reference corpus — Wikipedia/books — are a
small table shipped to the cluster); only the RAW side is computed
over the crawl.  This module mirrors that: ``TARGET_VOCAB`` freezes
the target's unigram+bigram counts, hashed into ``NUM_BUCKETS``
buckets at import time with the same md5 the engines use, and the
raw bucket distribution is aggregated from the corpus.

Estimator: per-bucket integer likelihood ratio with add-one
smoothing, both sides normalized by their totals —

    w_b = (SCALE * (p_cnt+1) * q_tot) div ((q_cnt+1) * p_tot)

a document's weight is the mean of ``w_b`` over its feature
occurrences (the log-ratio sum of the paper becomes a ratio mean so
Spark and DuckDB aggregate bit-identically, the same integer-twin
convention as the LM scorers in ``textstats.py``).  The keep
threshold is frozen above the corpus median (add-one smoothing over
all ``NUM_BUCKETS`` buckets pulls the occurrence-weighted mean well
below ``SCALE`` when the corpus occupies only a fraction of the
bucket space, so the threshold is calibrated to the resampling
quantile, not to ``SCALE``).

Scale shape (100 TB contract): feature hashing is one narrow
codegen'd map — text never leaves the scan; the raw bucket count is
word-count-shaped with map-side combine and emits at most
``NUM_BUCKETS`` rows, so the priced bucket table broadcasts; the only
doc-keyed shuffle is the final per-document rollup.  Integer
headroom: ``SCALE * (p_cnt+1) * q_tot`` stays under 2^63 while
``q_tot < ~1e13`` feature occurrences; past that, price buckets as
``SCALE * (p_cnt+1) * (q_tot div (q_cnt+1)) div p_tot`` (division
hoisted) — the twin stays exact because both engines reassociate
identically.
"""

from __future__ import annotations

from hashlib import md5 as _md5

from pyspark.sql import DataFrame, functions as F

NUM_BUCKETS = 4096
SCALE = 10000
KEEP_AT_LEAST = 2800    # ~p92 of avg_w on the fixture corpus

# Frozen target-corpus n-gram counts (the offline side of DSIR).
# Unigrams and bigrams share one feature space, as in the paper.
TARGET_VOCAB: tuple[tuple[str, int], ...] = (
    ("vector", 40), ("query", 35), ("stream", 30), ("batch", 25),
    ("filter", 25), ("window", 20), ("hash", 20), ("scan", 15),
    ("merge", 15), ("sort", 10), ("column", 10), ("agg", 10),
    ("vector query", 8), ("stream batch", 6), ("hash join", 6),
    ("window agg", 4),
)


def _bucket(gram: str) -> int:
    """60-bit md5 prefix mod NUM_BUCKETS — Python's md5 is the same
    function Spark's ``md5()`` and DuckDB's ``md5()`` evaluate, so a
    bucket id frozen here matches both engines."""
    return int(_md5(gram.encode()).hexdigest()[:15], 16) % NUM_BUCKETS


# target bucket counts, folded (two grams may share a bucket)
_P: dict[int, int] = {}
for _g, _c in TARGET_VOCAB:
    _P[_bucket(_g)] = _P.get(_bucket(_g), 0) + _c
TARGET_BUCKETS: tuple[tuple[int, int], ...] = tuple(sorted(_P.items()))
P_TOT = sum(_P.values()) + NUM_BUCKETS   # add-one mass

# unigram buckets ++ bigram buckets, each a 60-bit md5 prefix mod B —
# the same engine-exact hash family as textstats._BIGRAM_PAIRS.
_FEATURE_BUCKETS = (
    "concat("
    "transform(toks, w -> pmod(cast(conv(substring(md5(w), 1, 15),"
    " 16, 10) as bigint), {b})), "
    "CASE WHEN size(toks) >= 2 THEN "
    "transform(sequence(0, size(toks) - 2), i -> pmod(cast(conv("
    "substring(md5(concat_ws(' ', toks[i], toks[i+1])), 1, 15),"
    " 16, 10) as bigint), {b})) ELSE array() END)"
).format(b=NUM_BUCKETS)


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, n_feats, sum_w, avg_w, keep): hashed-n-gram
    importance weight of every document against the frozen target
    distribution, integer-exact."""
    spark = docs.sparkSession
    target = spark.createDataFrame(
        list(TARGET_BUCKETS), "b long, p_cnt long"
    )
    feats = (
        docs.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            F.explode(F.expr(_FEATURE_BUCKETS)).alias("b"),
        )
    )
    # feats feeds the raw-count aggregate AND the probe — without the
    # lazy checkpoint every token is re-hashed per consumer.
    feats = feats.localCheckpoint(eager=False)
    q = feats.groupBy("b").agg(F.count("*").alias("q_cnt"))
    # the corpus total is ONE number — broadcast it rather than
    # windowing the (bounded, ≤NUM_BUCKETS-row) count table onto a
    # single partition
    q_tot = q.agg(F.sum("q_cnt").alias("q_tot"))
    w = (
        q.crossJoin(F.broadcast(q_tot))
        .join(F.broadcast(target), "b", "left")
        .select(
            "b",
            F.expr(
                f"({SCALE} * (coalesce(p_cnt, 0) + 1) * q_tot)"
                f" div ((q_cnt + 1) * {P_TOT})"
            ).alias("w_b"),
        )
    )
    per_doc = (
        feats.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("w_b").alias("sum_w"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("sum_w", F.lit(0)).alias("sum_w"),
            F.coalesce(
                F.expr("sum_w div n_feats"), F.lit(0)
            ).alias("avg_w"),
            (
                F.coalesce(F.expr("sum_w div n_feats"), F.lit(0))
                >= KEEP_AT_LEAST
            ).alias("keep"),
        )
    )


def duck_dsir_sql(source: str = "documents") -> str:
    """DuckDB twin of :func:`dsir_weights` — same hash family, same
    frozen target table, same integer pricing."""
    target_rows = ", ".join(f"({b}, {c})" for b, c in TARGET_BUCKETS)
    return f"""
WITH target(b, p_cnt) AS (VALUES {target_rows}),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM {source}
), feats AS MATERIALIZED (
  SELECT doc_id,
         CAST('0x' || substr(md5(f.g), 1, 15) AS BIGINT)
           % {NUM_BUCKETS} AS b
  FROM toks, LATERAL (
    SELECT unnest(list_concat(
      t,
      CASE WHEN len(t) >= 2 THEN
        list_transform(generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1])
      ELSE [] END)) AS g
  ) f
), q AS (
  SELECT b, count(*) AS q_cnt FROM feats GROUP BY b
), w AS (
  SELECT q.b,
         ({SCALE} * (coalesce(target.p_cnt, 0) + 1)
            * (sum(q.q_cnt) OVER ()))
           // ((q.q_cnt + 1) * {P_TOT}) AS w_b
  FROM q LEFT JOIN target ON q.b = target.b
), per_doc AS (
  SELECT f.doc_id, count(*) AS n_feats, sum(w.w_b) AS sum_w
  FROM feats f JOIN w ON f.b = w.b
  GROUP BY f.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per_doc.n_feats, 0) AS BIGINT) AS n_feats,
       CAST(coalesce(per_doc.sum_w, 0) AS BIGINT) AS sum_w,
       CAST(coalesce(per_doc.sum_w // per_doc.n_feats, 0)
            AS BIGINT) AS avg_w,
       coalesce(per_doc.sum_w // per_doc.n_feats, 0)
         >= {KEEP_AT_LEAST} AS keep
FROM {source} d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""
