"""The compliance gate: one keep/drop verdict per document from the
composed opt-out stack — classic REP (noindex, meta + header), AI
opt-outs (noai, TDM reservation) and content licenses.

Each signal family keeps its own harvest operator (visible, auditable
rows); this module is the POLICY that a specific corpus applies on
top. The instance shipped here is the strict commercial-open-corpus
policy, restrictive-wins with a stable reason precedence:

    noindex  >  noai  >  tdm-reservation  >  license

- ``noindex`` (REP, either channel) — the page said "don't index";
- ``noai`` — the page said "don't train on me";
- an active TDM reservation — mining rights reserved (an explicit
  ``0`` non-reservation passes);
- a license story whose STRICTEST declared license forbids
  commercial use (conflicts resolve conservative: min over signals);
  a page with NO license signal passes this policy's license check —
  license-REQUIRED corpora would flip that one predicate.

Scale shape: the three verdict inputs are all keyed by doc_id and
produced by doc_id-spread Arrow stages, so the composing joins
co-partition on the same key; the license leg pre-aggregates to one
row per doc before joining. In production all three ride the single
extraction pass and the gate is a narrow map over its output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .aioptout import ai_optout_signals
from .license import license_signals
from .metarobots import meta_robots_verdicts


def compliance_gate(docs: DataFrame) -> DataFrame:
    """(doc_id, keep, reason) — reason is the FIRST failing check in
    precedence order, '' when kept."""
    rep = meta_robots_verdicts(docs).select("doc_id", "indexable")
    ai = ai_optout_signals(docs).select(
        "doc_id", "noai", "tdm_reserved"
    )
    lic = license_signals(docs).groupBy("doc_id").agg(
        F.min(F.col("allows_commercial").cast("int")).alias("lic_min")
    )
    reason = (
        F.when(~F.col("indexable"), F.lit("noindex"))
        .when(F.col("noai"), F.lit("noai"))
        .when(F.col("tdm_reserved"), F.lit("tdm-reservation"))
        .when(F.col("lic_min") == 0, F.lit("license"))
        .otherwise(F.lit(""))
    )
    return (
        docs.select("doc_id")
        .join(rep, "doc_id")
        .join(ai, "doc_id")
        .join(lic, "doc_id", "left")
        .select(
            "doc_id",
            (reason == "").alias("keep"),
            reason.alias("reason"),
        )
    )


def duck_compliance_sql(source: str = "documents") -> str:
    """Closed-form twin: the composed schedules of the three
    harvests' wrappers, same precedence."""
    return f"""
WITH v AS (
  SELECT doc_id,
    (doc_id % 8 IN (2, 4, 5) OR doc_id % 5 = 0) AS noindex,
    doc_id % 9 IN (1, 5, 8)                      AS noai,
    doc_id % 9 IN (3, 6)                         AS tdm,
    doc_id % 6 IN (2, 5)                         AS lic_bad
  FROM {source}
)
SELECT doc_id,
  NOT (noindex OR noai OR tdm OR lic_bad) AS keep,
  CASE WHEN noindex THEN 'noindex'
       WHEN noai THEN 'noai'
       WHEN tdm THEN 'tdm-reservation'
       WHEN lic_bad THEN 'license'
       ELSE '' END AS reason
FROM v
"""
