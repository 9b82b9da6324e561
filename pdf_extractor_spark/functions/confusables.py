"""Unicode confusable-skeleton folding (UTS #39-style, subset) —
the homoglyph defense a web corpus needs before exact dedup and
blocklist matching.

Spam and SEO mills evade hash dedup and keyword blocklists by
swapping Latin letters for visually-identical Cyrillic/Greek
codepoints ("pаypal" with U+0430) and by salting text with
zero-width characters. The *skeleton* operation folds a documented
confusable subset back to Latin and strips the zero-width family,
so two visually-identical documents get the SAME dedup key.

Everything here is a pure NATIVE narrow map in both engines —
``translate`` (codepoint-wise in Spark and DuckDB alike) plus one
``regexp_replace`` with the zero-width class written as literal
characters (identical pattern source for Java regex and RE2). No
Python touches the text; the fold composes in front of any
hash-based dedup at zero additional shuffle cost.

The catalog query plants a deterministic ATTACK first (Cyrillic
swaps on every third doc, a zero-width injection on every fifth —
both expressed natively too) and then verifies the skeleton equals
the original text — the fold provably undoes the evasion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# documented confusable subset: Cyrillic/Greek lookalikes that fold
# to Latin (UTS #39 confusables.txt entries; lowercase + uppercase)
CONF_SRC = "аеорсхуіјѕԛԝАВЕКМНОРСТХЅІЈον"
CONF_DST = "aeopcxyijsqwABEKMHOPCTXSIJov"
# zero-width family + soft hyphen, as literal chars so the SAME
# pattern source works under Java regex and RE2
ZW_CLASS = "[​‌‍⁠﻿­]"

# the attack alphabet the catalog query plants (a strict subset of
# the fold, so skeleton(attack(x)) == x whenever x is confusable-free)
_ATK_SRC = "aeopcxy"
_ATK_DST = "аеорсху"


def skeleton(col: Column) -> Column:
    """Confusable skeleton: fold lookalikes to Latin, strip
    zero-widths."""
    return F.regexp_replace(
        F.translate(col, CONF_SRC, CONF_DST), ZW_CLASS, ""
    )


def confusable_skeleton_report(docs: DataFrame) -> DataFrame:
    """(doc_id, attacked, zw_injected, n_confusables, skeleton_ok):
    plant the deterministic homoglyph/zero-width attack, fold it
    back, verify the skeleton equals the original text. n_confusables
    counts the confusable codepoints the attacked text carries
    (translate-delete length trick — still native)."""
    base = F.when(
        F.col("doc_id") % 3 == 1,
        F.translate(F.col("text"), _ATK_SRC, _ATK_DST),
    ).otherwise(F.col("text"))
    zw = F.col("doc_id") % 5 == 2
    attacked = F.when(
        zw,
        F.concat(
            F.substring(base, 1, 10),
            F.lit("​"),
            F.substring(base, 11, 1 << 30),
        ),
    ).otherwise(base)
    return docs.select(
        "doc_id",
        (F.col("doc_id") % 3 == 1).alias("attacked"),
        zw.alias("zw_injected"),
        (
            F.length(attacked)
            - F.length(F.translate(attacked, CONF_SRC, ""))
        ).alias("n_confusables"),
        (skeleton(attacked) == F.col("text")).alias("skeleton_ok"),
    )


def duck_confusables_sql(source: str = "documents") -> str:
    """Twin: the same native expressions under DuckDB (translate is
    codepoint-wise there too; RE2 accepts the literal-char class)."""
    return f"""
WITH a AS (
  SELECT doc_id, text,
    CASE WHEN doc_id % 3 = 1
         THEN translate(text, '{_ATK_SRC}', '{_ATK_DST}')
         ELSE text END AS atk0
  FROM {source}
), b AS (
  SELECT doc_id, text,
    CASE WHEN doc_id % 5 = 2
         THEN substring(atk0, 1, 10) || '​' || substring(atk0, 11)
         ELSE atk0 END AS atk
  FROM a
)
SELECT doc_id,
  doc_id % 3 = 1 AS attacked,
  doc_id % 5 = 2 AS zw_injected,
  length(atk) - length(translate(atk, '{CONF_SRC}', ''))
    AS n_confusables,
  regexp_replace(
    translate(atk, '{CONF_SRC}', '{CONF_DST}'),
    '{ZW_CLASS}', '', 'g'
  ) = text AS skeleton_ok
FROM b
"""
