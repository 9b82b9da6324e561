"""Incremental (snapshot-over-snapshot) dedup: clean a NEW crawl
batch against an EXISTING corpus — the workflow every recurring-crawl
pipeline runs (each Common-Crawl snapshot repeats 60-80 % of the
previous one). Two-stage cascade, new-vs-old only (within-batch dedup
is the already-shipped document dedup):

1. **exact**: drop new docs whose text hash already exists in the
   corpus;
2. **near**: for exact survivors, LSH band keys probe the corpus'
   banded MinHash index; candidates are verified with exact shingle
   Jaccard and dropped at ``threshold``.

Scale shape (the part that matters at 100 TB):

- All per-doc values (text hash, 16 band keys, distinct shingle-hash
  set) are computed on the NEW batch in one narrow map BEFORE any
  join — document text never crosses an exchange (the standing
  invariant, plan-pinned).
- The old side of the exact stage is a distinct 16-byte-hash
  projection; of the near stage, the melted ``(band, bkey, doc_id)``
  LSH index. In production both are PERSISTED, bucketed by their join
  key, maintained incrementally as batches are accepted — so only the
  (much smaller) new batch shuffles at probe time and the corpus is
  never rescanned. Here both are derived from the documents table in
  the same query; the join shapes are identical.
- The verify join ships 60-bit shingle-hash arrays only (never
  shingle strings), the round-2 invariant from
  :func:`.dedup.ngram_jaccard_pairs`.

The catalog entry synthesizes the new batch deterministically from
the corpus itself — every third document re-emitted as an exact copy,
a 4th-token mutant (near dup), or a token-reversed rewrite (novel) in
rotation — so all three decision paths are exercised non-vacuously at
every scale factor.

No reference counterpart (the reference is a single-document
extractor, ``extractor.py``) — training-pipeline operator from the
task brief's beyond-the-reference list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    N_BANDS,
    _MUTATE_PATTERN,
    _with_minhashes,
    banded_signature_cols,
    melt_bands,
)

#: new-batch ids live far above every fixture/mutant id range
NEW_OFFSET = 50_000_000

#: every 3rd corpus doc seeds a new-batch row; class rotates
#: exact copy / 4th-token mutant / token-reversed novel
SRC_MOD = 3

#: exact-Jaccard drop threshold for the verify stage
NEAR_THRESHOLD = 0.7

_NEW_TOKEN = "zqnewz"


def synth_new_batch(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in for the next crawl snapshot (the real
    pipeline reads it from the pages table): ``(doc_id, text)`` with
    ids offset by ``NEW_OFFSET``."""
    d = F.col("doc_id")
    cls = F.expr(f"(doc_id div {SRC_MOD}) % 3")
    text = (
        F.when(cls == 0, F.col("text"))
        .when(
            cls == 1,
            F.regexp_replace(
                F.col("text"), _MUTATE_PATTERN, f"$1{_NEW_TOKEN}"
            ),
        )
        .otherwise(
            F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")
        )
    )
    return docs.where(d % SRC_MOD == 0).select(
        (d + NEW_OFFSET).alias("doc_id"), text.alias("text")
    )


def _enriched(docs: DataFrame) -> DataFrame:
    """One narrow map: (doc_id, h, sh, band0..15) — text hash,
    distinct 60-bit shingle-hash set, banded MinHash signature
    (:func:`.dedup.banded_signature_cols`, the shared construction).
    The single pass every side of the cascade shares."""
    return _with_minhashes(docs.select("doc_id", "text")).select(
        "doc_id",
        F.md5("text").alias("h"),
        F.array_distinct("hs").alias("sh"),
        *banded_signature_cols(),
    )


def incremental_dedup_report(
    old_docs: DataFrame,
    new_docs: DataFrame,
    threshold: float = NEAR_THRESHOLD,
) -> DataFrame:
    """Per-new-doc admission decision:
    (doc_id, dropped_exact, n_candidates, dropped_near, is_kept).

    ``n_candidates`` = distinct corpus docs sharing >= 1 LSH band
    (0 for exact-dropped docs — the cascade never probes them);
    ``dropped_near`` = any candidate verified at exact shingle
    Jaccard >= threshold."""
    # ONE narrow map per side computes everything that side ever
    # ships — text hash, 16 band keys, distinct shingle-hash set —
    # then localCheckpoint shares the materialized result across its
    # three consumers (exact-hash index, melted band index, verify
    # join). Catalyst does not deduplicate common subplans, so
    # without this the 128-mask minhash fold would re-evaluate per
    # consumer (measured 53.7 s → 2.4-3.3 s at sf0.1, same session).
    old_enriched = _enriched(old_docs).localCheckpoint(eager=False)
    new_enriched = _enriched(new_docs).localCheckpoint(eager=False)

    # old-side indexes (persisted + bucketed in production)
    old_hashes = old_enriched.select("h").distinct()
    old_bands = melt_bands(old_enriched)

    flagged = new_enriched.join(
        old_hashes.withColumn("dup", F.lit(1)), "h", "left"
    ).select(
        "doc_id",
        *[f"band{b}" for b in range(N_BANDS)],
        F.coalesce(F.col("dup"), F.lit(0)).alias("dropped_exact"),
    )

    survivors = flagged.where(F.col("dropped_exact") == 0)
    cands = (
        melt_bands(survivors)
        .withColumnRenamed("doc_id", "new_id")
        .join(
            old_bands.withColumnRenamed("doc_id", "old_id"),
            ["band", "bkey"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    verified = (
        cands.join(
            new_enriched.select(
                F.col("doc_id").alias("new_id"),
                F.col("sh").alias("sh_n"),
            ),
            "new_id",
        )
        .join(
            old_enriched.select(
                F.col("doc_id").alias("old_id"),
                F.col("sh").alias("sh_o"),
            ),
            "old_id",
        )
        .withColumn(
            "jac",
            F.size(F.array_intersect("sh_n", "sh_o")).cast("double")
            / F.size(F.array_union("sh_n", "sh_o")).cast("double"),
        )
    )
    per_new = verified.groupBy("new_id").agg(
        F.count("*").alias("n_candidates"),  # cands already distinct
        F.max((F.col("jac") >= threshold).cast("int")).alias("near"),
    )
    return (
        flagged.select("doc_id", "dropped_exact")
        .join(
            per_new.withColumnRenamed("new_id", "doc_id"), "doc_id", "left"
        )
        .select(
            "doc_id",
            "dropped_exact",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("near", F.lit(0)).alias("dropped_near"),
            (
                (F.col("dropped_exact") == 0)
                & (F.coalesce("near", F.lit(0)) == 0)
            ).cast("int").alias("is_kept"),
        )
    )


# ------------------------------------------------------- DuckDB twin

DUCK_NEW_BATCH = f"""
  SELECT doc_id + {NEW_OFFSET} AS doc_id,
         CASE CAST((doc_id // {SRC_MOD}) % 3 AS INT)
           WHEN 0 THEN text
           WHEN 1 THEN regexp_replace(text,
                '^((?:\\S+ ){{3}})\\S+', '\\1{_NEW_TOKEN}')
           ELSE array_to_string(
                list_reverse(string_split(text, ' ')), ' ')
         END AS text
  FROM documents WHERE doc_id % {SRC_MOD} = 0
"""


def duck_incremental_sql(threshold: float = NEAR_THRESHOLD) -> str:
    from .dedup import duck_band_ctes

    return f"""
WITH newraw AS MATERIALIZED ({DUCK_NEW_BATCH}),
  all_docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id, text FROM newraw
  ),
  {duck_band_ctes("all_docs")},
  shd AS MATERIALIZED (
    SELECT doc_id, list_distinct(list_transform(sh,
             s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))) AS sh
    FROM base
  ),
  oldh AS (SELECT DISTINCT md5(text) AS h FROM documents),
  flagged AS (
    SELECT n.doc_id,
           CAST(oldh.h IS NOT NULL AS INT) AS dropped_exact
    FROM newraw n LEFT JOIN oldh ON md5(n.text) = oldh.h
  ),
  cand AS (
    SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
    FROM bandkeys nb
    JOIN bandkeys ob
      ON nb.band = ob.band AND nb.bkey = ob.bkey
     AND nb.doc_id >= {NEW_OFFSET} AND ob.doc_id < {NEW_OFFSET}
    JOIN flagged f ON f.doc_id = nb.doc_id AND f.dropped_exact = 0
  ),
  per_new AS (
    SELECT c.new_id,
           count(DISTINCT c.old_id) AS n_candidates,
           max(CASE WHEN
                 CAST(len(list_intersect(sn.sh, so.sh)) AS DOUBLE)
                 / CAST(len(list_distinct(
                       list_concat(sn.sh, so.sh))) AS DOUBLE)
                 >= {threshold} THEN 1 ELSE 0 END) AS near
    FROM cand c
    JOIN shd sn ON sn.doc_id = c.new_id
    JOIN shd so ON so.doc_id = c.old_id
    GROUP BY c.new_id
  )
SELECT f.doc_id,
       f.dropped_exact,
       CAST(coalesce(p.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(coalesce(p.near, 0) AS INT) AS dropped_near,
       CAST(f.dropped_exact = 0 AND coalesce(p.near, 0) = 0 AS INT)
         AS is_kept
FROM flagged f LEFT JOIN per_new p ON p.new_id = f.doc_id
"""
