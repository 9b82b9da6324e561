"""Benchmark decontamination: flag training documents that contain
n-grams from an evaluation set.

The operator every pre-training pipeline runs before freezing a corpus
(GPT-3 appendix C / Lee et al. 2021 style): tokenize both sides, hash
fixed-length word n-grams, and mark any training document sharing at
least ``min_hits`` n-grams with the benchmark as contaminated.

Scale shape (the part that matters at 100 TB):

- Eval sets are SMALL relative to the corpus (benchmarks are millions
  of grams, the corpus is trillions) — the distinct eval-gram set is
  **broadcast**, so the corpus side joins map-side with zero shuffle
  of corpus data.
- Corpus documents explode to distinct 16-byte gram **hashes** in a
  narrow map; document text never crosses an exchange (the same
  contract as line/span dedup, pinned in ``tests/test_plans.py``).
- The per-document aggregate shuffles only ``(doc_id, count)`` pairs.

The catalog entry synthesizes its benchmark deterministically from the
corpus itself — a token window lifted from every ``doc_id % 10 == 0``
document — which is exactly the leak shape decontamination exists to
catch (an eval question quoting corpus text), and guarantees non-empty
hits at every scale factor so the cross-engine gate can never pass
vacuously.

No reference counterpart (the reference is a single-document extractor,
``extractor.py``) — this is a training-pipeline operator from the task
brief's beyond-the-reference list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _ngram_hashes

#: n-gram order. 13 is the GPT-3 convention; the fixture corpus'
#: documents run 10-99 whitespace tokens, so the catalog uses 8 to
#: keep every doc long enough to carry grams.
DECONTAM_NGRAM = 8

#: catalog benchmark construction: token window [start, start+len) is
#: lifted (1-based, inclusive slice semantics in both engines) from
#: every ``doc_id % EVAL_SLICE_MOD == 0`` document with enough tokens.
EVAL_SLICE_MOD = 10
EVAL_WIN_START = 6
EVAL_WIN_LEN = 20


def eval_set_from_slice(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in benchmark: ``(eval_id, text)`` where
    text = tokens ``EVAL_WIN_START .. EVAL_WIN_START+EVAL_WIN_LEN-1``
    (1-based) of every ``doc_id % EVAL_SLICE_MOD == 0`` document that
    has at least ``EVAL_WIN_START + EVAL_WIN_LEN - 1`` tokens."""
    need = EVAL_WIN_START + EVAL_WIN_LEN - 1
    return (
        docs.withColumn("toks", F.split(F.col("text"), " "))
        .where(
            (F.col("doc_id") % EVAL_SLICE_MOD == 0)
            & (F.size("toks") >= need)
        )
        .select(
            F.col("doc_id").alias("eval_id"),
            F.concat_ws(
                " ", F.slice("toks", EVAL_WIN_START, EVAL_WIN_LEN)
            ).alias("text"),
        )
    )


def _normalized(df: DataFrame) -> DataFrame:
    """GPT-3-style normalization before n-gramming: lowercase, strip
    punctuation, collapse ALL whitespace runs (spaces, newlines, tabs)
    to single spaces — so a quote that was re-cased, re-punctuated or
    re-wrapped still hits. Whitespace must be kept as a class, not
    deleted: stripping ``\\n`` outright would fuse tokens across line
    breaks and silently miss every line-wrapped quote. Pure narrow
    map."""
    return df.withColumn(
        "text",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.col("text")), "[^a-z0-9\\s]", ""
                ),
                "\\s+",
                " ",
            )
        ),
    )


def decontaminate_report(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = DECONTAM_NGRAM,
    min_hits: int = 1,
    normalize: bool = False,
) -> DataFrame:
    """Per-document contamination report against an eval set.

    ``eval_df`` needs a ``text`` column (any id column is ignored —
    only the distinct gram set matters). Returns one row per input
    document: ``(doc_id, n_grams, n_hit, contaminated)`` where
    ``n_grams`` counts the document's distinct n-grams, ``n_hit`` how
    many of them appear anywhere in the eval set, and ``contaminated``
    is ``n_hit >= min_hits``.

    ``normalize=True`` applies the GPT-3 appendix-C normalization
    (lowercase, punctuation strip, whitespace collapse) to BOTH sides
    before hashing, so re-cased / re-punctuated quotes still count as
    contamination. The catalog entry runs raw (its planted windows
    are verbatim); real decontamination runs normalized.
    """
    if normalize:
        docs_g = _normalized(docs.select("doc_id", "text"))
        eval_df = _normalized(eval_df)
    else:
        docs_g = docs
    eval_grams = (
        _ngram_hashes(
            eval_df.select(F.lit(0).alias("doc_id"), "text"), n
        )
        .select("g")
        .distinct()
    )
    # materialized once: doc_grams feeds BOTH the totals aggregate and
    # the hit join, and Catalyst re-executes shared subplans per
    # consumer — without the checkpoint the corpus-wide explode+hash
    # (the most expensive narrow stage here) runs twice
    doc_grams = _ngram_hashes(docs_g, n).localCheckpoint(eager=False)
    totals = doc_grams.groupBy("doc_id").agg(
        F.count("*").alias("n_grams")
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def corpus_decontaminate(docs: DataFrame) -> DataFrame:
    """Catalog form: decontaminate ``docs`` against the deterministic
    sliced-window benchmark (see module docstring)."""
    return decontaminate_report(docs, eval_set_from_slice(docs))


def duck_decontam_sql(
    source: str = "documents",
    n: int = DECONTAM_NGRAM,
    min_hits: int = 1,
) -> str:
    """DuckDB twin of :func:`corpus_decontaminate` (1-based lists;
    ``ws[a:b]`` is inclusive of both ends, matching Spark's 1-based
    ``slice(arr, a, len)``)."""
    concat = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
    need = EVAL_WIN_START + EVAL_WIN_LEN - 1
    win_end = EVAL_WIN_START + EVAL_WIN_LEN - 1
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM {source}
), docg AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(ws) >= {n} THEN
             list_transform(generate_series(1, len(ws) - {n - 1}),
               i -> md5({concat}))
           ELSE [] END) AS g
    FROM toks
  )
), evalg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(
             generate_series(1, {EVAL_WIN_LEN - n + 1}),
             i -> md5({concat}))) AS g
    FROM (
      SELECT ws[{EVAL_WIN_START}:{win_end}] AS ws FROM toks
      WHERE doc_id % {EVAL_SLICE_MOD} = 0 AND len(ws) >= {need}
    )
  )
), totals AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
  FROM docg GROUP BY doc_id
), hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM docg JOIN evalg USING (g) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(t.n_grams, 0) AS n_grams,
       COALESCE(h.n_hit, 0) AS n_hit,
       COALESCE(h.n_hit, 0) >= {min_hits} AS contaminated
FROM {source} d
LEFT JOIN totals t ON t.doc_id = d.doc_id
LEFT JOIN hits h ON h.doc_id = d.doc_id
"""
