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


def confusable_dedup_report(docs: DataFrame) -> DataFrame:
    """One row: homoglyph-evaded duplicates caught by skeleton-keyed
    exact dedup vs plain-hash exact dedup. The corpus is unioned with
    an attacked COPY of every third document (Cyrillic swaps — a
    spammer's repost); plain md5 keys see two distinct documents,
    skeleton keys collapse them. Only 16-byte hashes ever shuffle —
    text stays where it was scanned."""
    base = docs.select("doc_id", "text")
    attacked = base.where(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.translate(F.col("text"), _ATK_SRC, _ATK_DST).alias("text"),
    )
    uni = base.unionByName(attacked)

    def dup_groups(key: Column) -> Column:
        return F.sum(F.when(F.col("n") > 1, 1).otherwise(0))

    plain = (
        uni.groupBy(F.md5("text").alias("k"))
        .agg(F.count("*").alias("n"))
        .agg(dup_groups(F.col("n")).alias("g"),
             F.count("*").alias("t"))
        .select(F.col("g").alias("plain_dup_groups"),
                F.col("t").alias("plain_distinct"))
    )
    skel = (
        uni.groupBy(F.md5(skeleton(F.col("text"))).alias("k"))
        .agg(F.count("*").alias("n"))
        .agg(dup_groups(F.col("n")).alias("g"),
             F.count("*").alias("t"))
        .select(F.col("g").alias("skeleton_dup_groups"),
                F.col("t").alias("skeleton_distinct"))
    )
    return plain.crossJoin(skel).select(
        "plain_dup_groups", "plain_distinct",
        "skeleton_dup_groups", "skeleton_distinct",
        (F.col("skeleton_dup_groups") - F.col("plain_dup_groups"))
        .alias("evasions_caught"),
    )


def duck_confusable_dedup_sql(source: str = "documents") -> str:
    """Twin: same union + two group-bys under DuckDB."""
    return f"""
WITH uni AS (
  SELECT doc_id, text FROM {source}
  UNION ALL
  SELECT doc_id + 1000000,
         translate(text, '{_ATK_SRC}', '{_ATK_DST}')
  FROM {source} WHERE doc_id % 3 = 1
), p AS (
  SELECT count(*) FILTER (n > 1) AS g, count(*) AS t
  FROM (SELECT md5(text) AS k, count(*) AS n FROM uni GROUP BY 1)
), s AS (
  SELECT count(*) FILTER (n > 1) AS g, count(*) AS t
  FROM (
    SELECT md5(regexp_replace(
             translate(text, '{CONF_SRC}', '{CONF_DST}'),
             '{ZW_CLASS}', '', 'g')) AS k, count(*) AS n
    FROM uni GROUP BY 1
  )
)
SELECT p.g AS plain_dup_groups, p.t AS plain_distinct,
       s.g AS skeleton_dup_groups, s.t AS skeleton_distinct,
       s.g - p.g AS evasions_caught
FROM p, s
"""
