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
