"""The composed pre-training filter recipe: one query that runs the
full keep/drop decision a training-data pipeline makes per document.

Composition (the standard web-corpus recipe, e.g. Gopher →
MassiveText, C4, DCLM):

    keep = gopher_pass        (Rae et al. 2021 rule battery)
         ∧ c4_keep            (Raffel et al. 2020 cleanup battery)
         ∧ model_keep         (frozen logistic quality classifier)
         ∧ is_canonical       (exact-dup removal: lowest doc_id per
                               normalized-text fingerprint survives)

Each leg already exists as its own oracle-checked catalog entry; this
entry proves they COMPOSE — same flags, one plan — which is what a
user actually runs.

Scale shape: every flag is a narrow per-doc computation, so the only
data-dependent shuffles are (a) the Gopher top-bigram aggregate and
(b) the fingerprint canonical window — both on keys, never on text.
The three doc_id equi-joins reuse one hash partitioning (Spark
co-partitions consecutive joins on the same key: one Exchange per
input side, then zero re-shuffles), and at 100 TB the whole right side
of each join is a (doc_id, boolean) pair — bytes per row, not
documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .quality_model import quality_classifier
from .textstats import c4_rules, fingerprints, gopher_rules, webify


def pretraining_filter(
    docs: DataFrame, canon_text: Column | None = None
) -> DataFrame:
    """Per-document keep/drop with per-leg reasons:
    ``(doc_id, gopher_pass, c4_keep, model_keep, is_canonical, keep)``.

    Gopher/C4 run over the web-ified text (matching their standalone
    catalog entries); the classifier and the fingerprint run over the
    raw text. ``canon_text`` optionally replaces the TEXT EXPRESSION
    of the exact-dedup leg only — a Column over ``docs``, not a
    separate DataFrame, so the leg reads the same materialized scan as
    the others and can never drop or duplicate doc_ids (the catalog
    entry passes a duplicate-planted CASE so ``is_canonical`` can
    never pass vacuously on a duplicate-free fixture scale)."""
    # materialize the 2-column scan once: the four legs are
    # independent subplans, and without this each re-reads the text
    # column from parquet (4x scan I/O). At 100 TB the equivalent is
    # writing the projected intermediate once (or a cached/bucketed
    # table), not an in-memory checkpoint; the webify regex chain
    # still runs once per webified leg — fusing the narrow legs into
    # one projection is the further step if profiling demands it.
    docs = docs.select("doc_id", "text").localCheckpoint(eager=False)
    g = gopher_rules(docs, text_col=webify()).select(
        "doc_id", "gopher_pass"
    )
    c = c4_rules(docs, text_col=webify()).select("doc_id", "c4_keep")
    q = quality_classifier(docs).select(
        "doc_id", F.col("keep").alias("model_keep")
    )
    w = Window.partitionBy("fingerprint")
    fp_docs = (
        docs
        if canon_text is None
        else docs.select("doc_id", canon_text.alias("text"))
    )
    canon = fingerprints(fp_docs).select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias(
            "is_canonical"
        ),
    )
    return (
        g.join(c, "doc_id")
        .join(q, "doc_id")
        .join(canon, "doc_id")
        .select(
            "doc_id",
            "gopher_pass",
            "c4_keep",
            "model_keep",
            "is_canonical",
            (
                F.col("gopher_pass")
                & F.col("c4_keep")
                & F.col("model_keep")
                & F.col("is_canonical")
            ).alias("keep"),
        )
    )


def duck_recipe_sql(
    gopher_sql: str,
    c4_sql: str,
    classifier_sql: str,
    fingerprint_sql: str,
) -> str:
    """DuckDB twin, composed from ALL FOUR legs' own oracle SQL
    strings (fingerprint included — see
    ``textstats.duck_fingerprint_sql``) so the recipe can never drift
    from its components."""
    return f"""
SELECT g.doc_id,
       g.gopher_pass,
       c.c4_keep,
       q.model_keep,
       f.is_canonical,
       g.gopher_pass AND c.c4_keep AND q.model_keep AND f.is_canonical
         AS keep
FROM (SELECT doc_id, gopher_pass FROM ({gopher_sql})) g
JOIN (SELECT doc_id, c4_keep FROM ({c4_sql})) c USING (doc_id)
JOIN (SELECT doc_id, keep AS model_keep FROM ({classifier_sql})) q
  USING (doc_id)
JOIN (
  SELECT doc_id,
         doc_id = min(doc_id) OVER (PARTITION BY fingerprint)
           AS is_canonical
  FROM ({fingerprint_sql})
) f USING (doc_id)
"""


# -------------------------------------------------- what-if ablations
#
# Recipe tuning is an ablation exercise: "what does each filter COST
# in surviving tokens?" The naive loop re-scans the corpus once per
# candidate recipe; the correct shape computes the per-leg flags ONCE
# and evaluates every ablation as a conditional aggregate over the
# same flag frame — K recipes for the price of one scan. The variant
# table is a broadcast literal; the per-doc keep decision per variant
# is a boolean expression; the report is one hash aggregate keyed on
# the (tiny) recipe name.

RECIPE_VARIANTS: tuple[tuple[str, bool, bool, bool, bool], ...] = (
    # (name, use_gopher, use_c4, use_model, use_canonical)
    ("full", True, True, True, True),
    ("no_gopher", False, True, True, True),
    ("no_c4", True, False, True, True),
    ("no_model", True, True, False, True),
    ("no_dedup", True, True, True, False),
    ("dedup_only", False, False, False, True),
    ("none", False, False, False, False),
)


def recipe_whatif(
    docs: DataFrame, canon_text: Column | None = None
) -> DataFrame:
    """Evaluate every RECIPE_VARIANTS ablation in ONE pass:
    ``(recipe, n_docs, n_kept, kept_tokens, kept_bp)`` — surviving
    documents, surviving whitespace tokens, and the kept fraction in
    basis points. A disabled leg keeps everything (NOT use OR flag)."""
    flags = pretraining_filter(docs, canon_text=canon_text)
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    per_doc = flags.join(toks, "doc_id")
    spark = docs.sparkSession
    variants = spark.createDataFrame(
        list(RECIPE_VARIANTS),
        "recipe string, use_gopher boolean, use_c4 boolean, "
        "use_model boolean, use_canon boolean",
    )
    keep = (
        (~F.col("use_gopher") | F.col("gopher_pass"))
        & (~F.col("use_c4") | F.col("c4_keep"))
        & (~F.col("use_model") | F.col("model_keep"))
        & (~F.col("use_canon") | F.col("is_canonical"))
    )
    return (
        per_doc.crossJoin(F.broadcast(variants))
        .withColumn("kept", keep.cast("long"))
        .groupBy("recipe")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_toks")).alias("kept_tokens"),
            F.expr(
                "cast(sum(kept) * 10000 div count(*) as bigint)"
            ).alias("kept_bp"),
        )
        .orderBy("recipe")
    )


def duck_whatif_sql(recipe_sql: str, source: str = "documents") -> str:
    """DuckDB twin: composed from the recipe oracle so ablations can
    never drift from the flag semantics."""
    values = ", ".join(
        f"('{n}', {g}, {c}, {m}, {k})"
        for n, g, c, m, k in RECIPE_VARIANTS
    )
    return f"""
WITH flags AS ({recipe_sql}),
toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM {source}
),
variants(recipe, use_gopher, use_c4, use_model, use_canon) AS (
  VALUES {values}
),
scored AS (
  SELECT v.recipe,
         CASE WHEN (NOT v.use_gopher OR f.gopher_pass)
               AND (NOT v.use_c4 OR f.c4_keep)
               AND (NOT v.use_model OR f.model_keep)
               AND (NOT v.use_canon OR f.is_canonical)
              THEN 1 ELSE 0 END AS kept,
         t.n_toks
  FROM flags f
  JOIN toks t USING (doc_id)
  CROSS JOIN variants v
)
SELECT recipe,
       CAST(count(*) AS BIGINT)            AS n_docs,
       CAST(sum(kept) AS BIGINT)           AS n_kept,
       CAST(sum(kept * n_toks) AS BIGINT)  AS kept_tokens,
       CAST(sum(kept) * 10000 // count(*) AS BIGINT) AS kept_bp
FROM scored
GROUP BY recipe
ORDER BY recipe
"""
