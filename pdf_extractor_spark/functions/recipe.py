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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .quality_model import quality_classifier
from .textstats import c4_rules, fingerprints, gopher_rules, webify


def pretraining_filter(docs: DataFrame) -> DataFrame:
    """Per-document keep/drop with per-leg reasons:
    ``(doc_id, gopher_pass, c4_keep, model_keep, is_canonical, keep)``.

    Gopher/C4 run over the web-ified text (matching their standalone
    catalog entries); the classifier and the fingerprint run over the
    raw text."""
    g = gopher_rules(docs, text_col=webify()).select(
        "doc_id", "gopher_pass"
    )
    c = c4_rules(docs, text_col=webify()).select("doc_id", "c4_keep")
    q = quality_classifier(docs).select(
        "doc_id", F.col("keep").alias("model_keep")
    )
    w = Window.partitionBy("fingerprint")
    canon = fingerprints(docs).select(
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
    gopher_sql: str, c4_sql: str, classifier_sql: str
) -> str:
    """DuckDB twin, composed from the legs' own oracle SQL strings so
    the recipe can never drift from its components."""
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
         doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_canonical
  FROM (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             AS fp
    FROM documents
  )
) f USING (doc_id)
"""
