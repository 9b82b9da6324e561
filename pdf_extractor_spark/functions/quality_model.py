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
