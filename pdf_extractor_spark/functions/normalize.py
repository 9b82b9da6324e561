"""Unicode NFC normalization audit — corpus hygiene before dedup.

Exact dedup, shingle hashing and substring matching all key on raw
bytes, so two renderings of the same text — precomposed ``é`` vs
``e`` + COMBINING ACUTE — defeat them. Production pipelines therefore
normalize to NFC early and AUDIT how much of the corpus needed it
(a spike in non-NFC content usually means a new source with a
different toolchain). This operator reports, per document, the
code-point counts before/after NFC and whether the text was already
normalized.

Engine twins: Spark has no built-in UAX #15 implementation, so the
normalization runs as an Arrow-batched pandas UDF over
``unicodedata.normalize`` (stdlib); the DuckDB oracle uses its native
``nfc_normalize``. Both implement Unicode canonical composition —
verified bit-identical on composed/decomposed/multi-mark/ligature
inputs before this module was wired (ligatures are COMPATIBILITY
characters: NFC keeps them, only NFKC folds them — a classic
normalization bug this audit would catch).

The fixture corpus is already NFC, which would make the audit
vacuous, so both sides first apply the same deterministic
DENORMALIZATION (every ``e`` of every third document decomposed to
``e`` + U+0301) — the role the untrusted upstream source plays in
production.

Scale shape: one narrow map (regexp denormalize → Arrow batch
normalize → lengths), zero shuffles; text never leaves the scan
stage except as two integers and a bool.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: documents with doc_id % NFC_MUT_MOD == 1 arrive denormalized
NFC_MUT_MOD = 3

_COMBINING_ACUTE = "́"


def _nfc_series(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(lambda t: unicodedata.normalize("NFC", t))


def _nfc_udf():
    # built lazily with a typed return (a DDL-string returnType needs
    # an active SparkContext at decoration time — import-order trap)
    return pandas_udf(_nfc_series, StringType())


def denormalized_text() -> "F.Column":
    """The deterministic upstream-denormalization stand-in: every
    ``e`` of every third document becomes ``e`` + COMBINING ACUTE
    (which NFC composes back to ``é``)."""
    return F.when(
        F.col("doc_id") % NFC_MUT_MOD == 1,
        F.regexp_replace("text", "e", "e" + _COMBINING_ACUTE),
    ).otherwise(F.col("text"))


def duck_denormalized_text(col: str = "text") -> str:
    return (
        f"CASE WHEN doc_id % {NFC_MUT_MOD} = 1 THEN "
        f"regexp_replace({col}, 'e', 'e' || chr(769), 'g') "
        f"ELSE {col} END"
    )


def nfc_audit(docs: DataFrame) -> DataFrame:
    """(doc_id, n_before, n_after, is_nfc): code-point counts around
    NFC and the already-normalized flag."""
    denorm = docs.select(
        "doc_id", denormalized_text().alias("dt")
    )
    # one UDF evaluation per row: materialize the normalized column
    # before deriving both outputs from it
    normed = denorm.select(
        "doc_id", "dt", _nfc_udf()("dt").alias("nt")
    )
    return normed.select(
        "doc_id",
        F.length("dt").alias("n_before"),
        F.length("nt").alias("n_after"),
        (F.col("nt") == F.col("dt")).alias("is_nfc"),
    )


# -------------------------------------------------- width folding
#
# Full-width → half-width folding (the JA/ZH-corpus normalization
# step: CJK sources render ASCII as full-width forms U+FF01-U+FF5E
# and spaces as U+3000, which defeats tokenizers, URL matching and
# dedup keyed on ASCII). This is the width-compatibility subset of
# NFKC applied surgically — full NFKC also folds ligatures and
# superscripts, which corpora usually do NOT want. Implemented as
# ``translate`` (a per-character map, native in both engines — one
# narrow codegen'd map, no UDF). The fixture corpus carries no
# full-width text, so every fourth document is deterministically
# WIDENED first (the bijective inverse map) — the upstream-source
# role, same pattern as the NFC denormalizer above.

WIDTH_MUT_MOD = 4

_ASCII_RANGE = "".join(chr(c) for c in range(0x21, 0x7F))
_FULLWIDTH_RANGE = "".join(chr(c + 0xFEE0) for c in range(0x21, 0x7F))
_IDEO_SPACE = "　"


def widened_text() -> "F.Column":
    return F.when(
        F.col("doc_id") % WIDTH_MUT_MOD == 2,
        F.translate(
            "text", _ASCII_RANGE + " ", _FULLWIDTH_RANGE + _IDEO_SPACE
        ),
    ).otherwise(F.col("text"))


def width_fold(docs: DataFrame) -> DataFrame:
    """(doc_id, n_fullwidth, folded): count of full-width code points
    in the (widened) input and the folded text — which must equal the
    original corpus text exactly (the widen/fold maps are inverse
    bijections; the hash gate checks the folded strings
    themselves)."""
    wt = docs.select("doc_id", widened_text().alias("wt"))
    fw = _FULLWIDTH_RANGE + _IDEO_SPACE
    return wt.select(
        "doc_id",
        (
            F.length("wt") - F.length(F.translate("wt", fw, ""))
        ).cast("long").alias("n_fullwidth"),
        F.translate("wt", fw, _ASCII_RANGE + " ").alias("folded"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duck_width_fold_sql(source: str = "documents") -> str:
    a = _sql_quote(_ASCII_RANGE + " ")
    f = _sql_quote(_FULLWIDTH_RANGE + _IDEO_SPACE)
    return f"""
WITH wt AS (
  SELECT doc_id,
         CASE WHEN doc_id % {WIDTH_MUT_MOD} = 2
              THEN translate(text, {a}, {f})
              ELSE text END AS wt
  FROM {source}
)
SELECT doc_id,
       (length(wt) - length(translate(wt, {f}, '')))::BIGINT
         AS n_fullwidth,
       translate(wt, {f}, {a}) AS folded
FROM wt
"""


def duck_nfc_audit_sql(source: str = "documents") -> str:
    return f"""
WITH denorm AS (
  SELECT doc_id, {duck_denormalized_text()} AS dt FROM {source}
)
SELECT doc_id,
       length(dt)::INT AS n_before,
       length(nfc_normalize(dt))::INT AS n_after,
       nfc_normalize(dt) = dt AS is_nfc
FROM denorm
"""
