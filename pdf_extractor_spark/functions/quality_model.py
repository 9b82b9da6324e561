"""Model-based quality filtering: a frozen logistic classifier over
document-shape features, evaluated as pure native SQL expressions.

The model-based stage of a training-data pipeline (the
fastText-classifier slot in DCLM / FineWeb-Edu recipes, here a
deterministic linear model so both engines can reproduce it exactly):
score each document with a trained logistic regression and keep those
above the decision boundary.

The weights are FROZEN constants produced by
``scripts/train_quality_model.py`` (seeded synthetic two-class corpus:
prose vs. keyword-stuffing / digit-dump / repeated-token spam;
full-batch gradient descent, deterministic). Re-running the script
reproduces them bit-for-bit. Feature definitions here and in the
trainer are twins — ``tests/test_quality_model.py`` pins them to each
other.

Scale shape: the whole operator is one narrow projection — six ratio
features from ``split()``/``regexp_replace()`` plus a dot product —
inside whole-stage codegen. No UDF, no shuffle, no state: it runs at
scan speed on any number of executors.

Exactness contract with the DuckDB oracle: every feature is a ratio of
integers (exact in IEEE 754), the dot product is written in the same
left-associated textual order in both dialects, and there is no
transcendental in the compared output (the LOGIT is reported, not the
sigmoid) — so both engines compute bit-identical doubles and
``round(.., 4)`` cannot disagree.

Known bias, documented: the char-class regexes are ASCII-centric, so
non-Latin scripts score high ``f_punct`` — the same English-centric
behavior as the C4/Gopher rule batteries (see ``textstats.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import EN_STOPWORDS

#: frozen output of scripts/train_quality_model.py (seed 42, 5000
#: full-batch GD steps, train accuracy 1.0000 on 600 docs)
WEIGHTS = {
    "bias": -4.6646,
    "f_len": 5.5725,
    "f_stop": 16.0962,
    "f_punct": 1.0212,
    "f_digit": -8.9894,
    "f_rep": 7.2382,
    "f_wordshape": -7.2731,
}

_STOP_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

# feature expressions, Spark SQL dialect; every division is
# double/double so both engines do IEEE float division
_SPARK_FEATURES = {
    "f_len": "least(cast(nt as double) / 100.0, 1.0)",
    "f_stop": (
        f"cast(size(filter(toks, x -> x in ({_STOP_LIST}))) as double)"
        " / cast(nt as double)"
    ),
    "f_punct": (
        "CASE WHEN nc > 0 THEN cast(nc - length(regexp_replace("
        "text, '[^A-Za-z0-9 ]', '')) as double) / cast(nc as double) "
        "ELSE 0.0 END"
    ),
    "f_digit": (
        "CASE WHEN nc > 0 THEN cast(length(regexp_replace("
        "text, '[^0-9]', '')) as double) / cast(nc as double) "
        "ELSE 0.0 END"
    ),
    "f_rep": (
        "cast(size(array_distinct(toks)) as double) / cast(nt as double)"
    ),
    "f_wordshape": (
        "least((cast(nc as double) / cast(nt as double)) / 10.0, 1.0)"
    ),
}

_DUCK_FEATURES = {
    "f_len": "least(CAST(nt AS DOUBLE) / 100.0, 1.0)",
    "f_stop": (
        f"CAST(len(list_filter(toks, x -> x IN ({_STOP_LIST}))) "
        "AS DOUBLE) / CAST(nt AS DOUBLE)"
    ),
    "f_punct": (
        "CASE WHEN nc > 0 THEN CAST(nc - length(regexp_replace("
        "text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(nc AS DOUBLE) "
        "ELSE 0.0 END"
    ),
    "f_digit": (
        "CASE WHEN nc > 0 THEN CAST(length(regexp_replace("
        "text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(nc AS DOUBLE) "
        "ELSE 0.0 END"
    ),
    "f_rep": (
        "CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(nt AS DOUBLE)"
    ),
    "f_wordshape": (
        "least((CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE)) / 10.0, 1.0)"
    ),
}

_ORDER = ["f_len", "f_stop", "f_punct", "f_digit", "f_rep", "f_wordshape"]


def _logit_expr(features: dict[str, str]) -> str:
    """Left-associated dot product — the SAME textual order in both
    dialects, so IEEE summation order (and thus the rounded logit) is
    identical across engines."""
    z = str(WEIGHTS["bias"])
    for name in _ORDER:
        z += f" + {WEIGHTS[name]} * ({features[name]})"
    return z


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Score documents with the frozen model: ``(doc_id, n_tokens,
    logit, keep)`` where ``keep = logit > 0`` (sigmoid(logit) is the
    calibrated probability if a caller wants one — not emitted, to
    keep the compared output free of transcendentals)."""
    z = _logit_expr(_SPARK_FEATURES)
    return (
        docs.withColumn("toks", F.split(F.col("text"), " "))
        .withColumn("nt", F.size("toks"))
        .withColumn("nc", F.length("text"))
        .select(
            "doc_id",
            F.col("nt").alias("n_tokens"),
            F.round(F.expr(z), 4).alias("logit"),
            F.expr(f"({z}) > 0").alias("keep"),
        )
    )


def duck_quality_classifier_sql(source: str = "documents") -> str:
    """DuckDB twin of :func:`quality_classifier`."""
    z = _logit_expr(_DUCK_FEATURES)
    return f"""
SELECT doc_id,
       nt AS n_tokens,
       round({z}, 4) AS logit,
       ({z}) > 0 AS keep
FROM (
  SELECT doc_id, text,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS nt,
         length(text) AS nc
  FROM {source}
)
"""


# ------------------------------------------------------- quality tiers
#
# Tiered sampling (the FineWeb-Edu / DCLM move after classifier
# scoring): bucket the corpus into quality tiers at FROZEN score
# boundaries and assign each tier a sampling epoch count; the token
# budget per tier is what the sampler actually consumes.  Frozen
# boundaries — not rank quantiles — are the 100 TB-correct shape: the
# tier label is a scan-local CASE (a global ntile would funnel every
# row through one ordered partition), so the only shuffle is the
# final ≤4-row rollup.  Boundaries were calibrated once to the
# fixture corpus's logit quartiles and frozen, exactly how production
# pipelines freeze their classifier-score bin edges.

TIER_BOUNDS = (          # (tier, epochs, min logit), descending
    ("high", 4, -0.35),
    ("medium", 2, -0.9),
    ("low", 1, -1.5),
)
REJECT_TIER = ("reject", 0)


def _tier_case(z: str) -> str:
    """CASE expression mapping a logit to its tier — identical text
    in both dialects."""
    arms = " ".join(
        f"WHEN ({z}) >= {bound} THEN '{tier}'"
        for tier, _, bound in TIER_BOUNDS
    )
    return f"CASE {arms} ELSE '{REJECT_TIER[0]}' END"


def _epochs_case(z: str) -> str:
    arms = " ".join(
        f"WHEN ({z}) >= {bound} THEN {epochs}"
        for _, epochs, bound in TIER_BOUNDS
    )
    return f"CASE {arms} ELSE {REJECT_TIER[1]} END"


def quality_tiers(docs: DataFrame) -> DataFrame:
    """Per-tier sampling plan: ``(tier, epochs, n_docs, n_tokens,
    min_logit, max_logit, budget_tokens)`` with ``budget_tokens =
    epochs * n_tokens`` — the effective token count the sampler draws
    from each tier."""
    z = _logit_expr(_SPARK_FEATURES)
    scored = (
        docs.withColumn("toks", F.split(F.col("text"), " "))
        .withColumn("nt", F.size("toks"))
        .withColumn("nc", F.length("text"))
        .select(
            F.expr(_tier_case(z)).alias("tier"),
            F.expr(_epochs_case(z)).alias("epochs"),
            F.col("nt").cast("long").alias("n_tok"),
            F.round(F.expr(z), 4).alias("logit"),
        )
    )
    return (
        scored.groupBy("tier", "epochs")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("logit").alias("min_logit"),
            F.max("logit").alias("max_logit"),
        )
        .select(
            "tier",
            F.col("epochs").cast("int").alias("epochs"),
            "n_docs",
            "n_tokens",
            "min_logit",
            "max_logit",
            (F.col("epochs") * F.col("n_tokens"))
            .cast("long").alias("budget_tokens"),
        )
    )


def duck_quality_tiers_sql(source: str = "documents") -> str:
    """DuckDB twin of :func:`quality_tiers`."""
    z = _logit_expr(_DUCK_FEATURES)
    return f"""
WITH scored AS (
  SELECT {_tier_case(z)} AS tier,
         {_epochs_case(z)} AS epochs,
         CAST(nt AS BIGINT) AS n_tok,
         round({z}, 4) AS logit
  FROM (
    SELECT doc_id, text,
           string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS nt,
           length(text) AS nc
    FROM {source}
  )
)
SELECT tier,
       CAST(epochs AS INT) AS epochs,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(logit) AS min_logit,
       max(logit) AS max_logit,
       CAST(epochs * sum(n_tok) AS BIGINT) AS budget_tokens
FROM scored
GROUP BY tier, epochs
"""
