"""URL query-parameter significance learning (DUST detection).

Crawlers waste fetch budget and dedup capacity on DUST — Different
URLs with Similar Text (Bar-Yossef et al., "Do not crawl in the DUST",
WWW'07): the same page reachable under session ids, tracking tags and
sort toggles.  Production crawl stacks learn per-site parameter rules
("utm_* never changes content on this host → strip before frontier
insert") instead of shipping a global regex, because significance is
site-specific — ``?page=`` is content on a forum and noise on a
mirror.  This operator learns those rules from crawl evidence alone:

For every ``(host, param)`` pair, group the observed URLs by their
RESIDUAL — the URL with that one parameter removed (remaining params
sorted, so synthesis order cannot leak in).  Within a residual group
the pages differ only in that parameter's value; if every group
collapses to ONE distinct content fingerprint while at least one
group actually saw ≥ 2 distinct values (evidence, not absence), the
parameter is strippable.  A single counter-example group (two
contents under one residual) vetoes the rule — the conservative
direction, since a wrongly-stripped significant param silently drops
pages from the corpus.

Fixture shape (closed form, both engines): URLs are synthesized from
``doc_id`` — 8 variants per content group ``doc_id div 8``, with
``sort = (doc_id % 8) div 4`` SIGNIFICANT (it is folded into the
content fingerprint) and ``utm = doc_id % 4`` tracking-only.  The
report must therefore flag exactly ``utm`` as strippable and ``sort``
as not, on every host.

Scale shape (100 TB contract):

- The corpus is touched once by a narrow map emitting
  ``(url, content_fp)`` — the fingerprint is a fixed-width bigint
  (production: the page's content hash, already computed by the dedup
  stack); document text never enters this operator at all.
- URL parsing (query split, residual construction) is pure native
  string/array expressions — no UDF, whole-stage codegen.
- The one corpus-wide exchange groups on
  ``(host, param, md5(residual))`` — the residual URL is hashed
  before the shuffle so the exchange carries fixed-width keys, never
  raw URLs; both aggregates are partially aggregable count-distincts.
- The rule table is ``hosts × params`` — orders of magnitude smaller
  than the corpus; it broadcasts back into ``urlnorm``-style
  canonicalization as a strip-list.

No reference counterpart (the reference is a single-document
extractor) — this is a crawl-curation operator from the task brief's
beyond-the-reference list, sibling to :mod:`.urlnorm` (static
canonicalization) and :mod:`.templates` (host-level diversity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: URL variants per content group in the fixture synthesis
VARIANTS = 8
#: number of synthetic hosts
N_HOSTS = 20

#: deterministic page synthesis — Spark SQL / DuckDB twins.  The url
#: carries one significant param (sort, folded into content_fp) and
#: one tracking param (utm, content-invariant).
SPARK_URL = (
    "concat('https://shop', cast((doc_id div 8) % 20 as string),"
    " '.example/item/', cast(doc_id div 8 as string),"
    " '?sort=', cast((doc_id % 8) div 4 as string),"
    " '&utm=', cast(doc_id % 4 as string))"
)
SPARK_CONTENT_FP = "(doc_id div 8) * 2 + (doc_id % 8) div 4"

DUCK_URL = (
    "'https://shop' || CAST((doc_id // 8) % 20 AS VARCHAR)"
    " || '.example/item/' || CAST(doc_id // 8 AS VARCHAR)"
    " || '?sort=' || CAST((doc_id % 8) // 4 AS VARCHAR)"
    " || '&utm=' || CAST(doc_id % 4 AS VARCHAR)"
)
DUCK_CONTENT_FP = "(doc_id // 8) * 2 + (doc_id % 8) // 4"


def param_rules(pages: DataFrame) -> DataFrame:
    """(host, param, max_content_variants, evidence_groups,
    strippable) learned from a ``(url, content_fp)`` frame.

    ``strippable`` ⇔ no residual group ever saw two contents AND at
    least one group saw ≥ 2 distinct values of the parameter.
    """
    parsed = pages.select(
        "content_fp",
        F.expr("element_at(split(url, '[?]'), 1)").alias("base"),
        F.expr("split(element_at(split(url, '[?]'), 2), '&')")
        .alias("pairs"),
    )
    ex = (
        parsed.select(
            "content_fp", "base", "pairs",
            F.explode("pairs").alias("pair"),
        )
        .select(
            F.expr("element_at(split(base, '/'), 3)").alias("host"),
            F.expr("element_at(split(pair, '='), 1)").alias("param"),
            F.expr("element_at(split(pair, '='), 2)").alias("value"),
            # residual hashed BEFORE the exchange — fixed-width key
            F.expr(
                "md5(concat(base, '?', array_join(array_sort("
                "filter(pairs, x -> x != pair)), '&')))"
            ).alias("residual_h"),
            "content_fp",
        )
    )
    groups = ex.groupBy("host", "param", "residual_h").agg(
        F.countDistinct("content_fp").alias("n_contents"),
        F.countDistinct("value").alias("n_values"),
    )
    return (
        groups.groupBy("host", "param")
        .agg(
            F.max("n_contents").cast("bigint")
            .alias("max_content_variants"),
            F.sum(F.expr("CASE WHEN n_values >= 2 THEN 1 ELSE 0 END"))
            .cast("bigint").alias("evidence_groups"),
        )
        .select(
            "host", "param", "max_content_variants", "evidence_groups",
            F.expr("max_content_variants = 1 AND evidence_groups >= 1")
            .alias("strippable"),
        )
        .orderBy("host", "param")
    )


def synth_pages(docs: DataFrame) -> DataFrame:
    """Fixture ``(url, content_fp)`` synthesis from ``documents``."""
    return docs.select(
        F.expr(SPARK_URL).alias("url"),
        F.expr(SPARK_CONTENT_FP).cast("bigint").alias("content_fp"),
    )


def duck_param_rules_sql(source: str = "documents") -> str:
    """DuckDB twin — same synthesis, same parse, same residual hash,
    same evidence rule."""
    return f"""
WITH pages AS (
  SELECT {DUCK_URL} AS url,
         CAST({DUCK_CONTENT_FP} AS BIGINT) AS content_fp
  FROM {source}
), parsed AS (
  SELECT content_fp,
         string_split(url, '?')[1] AS base,
         string_split(string_split(url, '?')[2], '&') AS pairs
  FROM pages
), ex0 AS (
  SELECT content_fp, base, pairs, unnest(pairs) AS pair FROM parsed
), ex AS (
  SELECT string_split(base, '/')[3] AS host,
         string_split(pair, '=')[1] AS param,
         string_split(pair, '=')[2] AS value,
         md5(base || '?' || array_to_string(
             list_sort(list_filter(pairs, x -> x <> pair)), '&'))
           AS residual_h,
         content_fp
  FROM ex0
), groups AS (
  SELECT host, param, residual_h,
         COUNT(DISTINCT content_fp) AS n_contents,
         COUNT(DISTINCT value) AS n_values
  FROM ex GROUP BY host, param, residual_h
)
SELECT host, param,
       CAST(MAX(n_contents) AS BIGINT) AS max_content_variants,
       CAST(SUM(CASE WHEN n_values >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS evidence_groups,
       (MAX(n_contents) = 1
        AND SUM(CASE WHEN n_values >= 2 THEN 1 ELSE 0 END) >= 1)
         AS strippable
FROM groups GROUP BY host, param ORDER BY host, param
"""


def dust_strip_report(docs: DataFrame) -> DataFrame:
    """(host, n_rules, n_raw, n_after) — the learned rules APPLIED:
    every parameter flagged strippable is removed from its host's
    URLs (remaining params re-sorted into canonical order) and the
    per-host frontier collapse is measured as distinct-URL counts
    before and after.  The fixture's 8-variant groups must collapse
    to 2 (``sort`` survives, ``utm`` does not).

    Scale shape (100 TB contract): the rule table is hosts × params —
    broadcast back against the corpus (never shuffled); the strip is
    a pure native array expression (no UDF); the one exchange is the
    per-host distinct aggregation whose keys are short canonical URL
    strings, the same width the frontier itself shuffles."""
    pages = synth_pages(docs)
    strip_sets = (
        param_rules(pages)
        .where("strippable")
        .groupBy("host")
        .agg(F.collect_set("param").alias("strip_params"))
    )
    parsed = pages.select(
        "url",
        F.expr("element_at(split(url, '[?]'), 1)").alias("base"),
        F.expr("split(element_at(split(url, '[?]'), 2), '&')")
        .alias("pairs"),
        F.expr("element_at(split(url, '/'), 3)").alias("host"),
    )
    stripped = (
        parsed.join(F.broadcast(strip_sets), "host", "left")
        .select(
            "host", "url",
            F.expr(
                "CASE WHEN strip_params IS NULL THEN url ELSE "
                "CASE WHEN size(filter(pairs, x -> NOT "
                "array_contains(strip_params, "
                "element_at(split(x, '='), 1)))) = 0 THEN base "
                "ELSE concat(base, '?', array_join(array_sort("
                "filter(pairs, x -> NOT array_contains(strip_params, "
                "element_at(split(x, '='), 1)))), '&')) END END"
            ).alias("canonical_url"),
        )
    )
    return (
        stripped.groupBy("host")
        .agg(
            F.countDistinct("url").alias("n_raw"),
            F.countDistinct("canonical_url").alias("n_after"),
        )
        .join(
            F.broadcast(
                strip_sets.select(
                    "host",
                    F.size("strip_params").cast("bigint")
                    .alias("n_rules"),
                )
            ),
            "host", "left",
        )
        .select(
            "host",
            F.coalesce("n_rules", F.lit(0)).alias("n_rules"),
            "n_raw", "n_after",
        )
        .orderBy("host")
    )


def duck_dust_strip_sql(source: str = "documents") -> str:
    """Closed-form twin: per host, raw URLs are the (group, sort,
    utm) synthesis and stripping the one strippable param (utm)
    leaves (group, sort) — counted over the doc_ids actually present
    so partial trailing groups stay exact."""
    return f"""
WITH p AS (
  SELECT (doc_id // 8) % 20 AS h, doc_id // 8 AS grp,
         (doc_id % 8) // 4 AS sort, doc_id % 4 AS utm
  FROM {source}
)
SELECT 'shop' || CAST(h AS VARCHAR) || '.example' AS host,
       CAST(1 AS BIGINT) AS n_rules,
       count(DISTINCT CAST(grp AS VARCHAR) || ':'
             || CAST(sort AS VARCHAR) || ':'
             || CAST(utm AS VARCHAR)) AS n_raw,
       count(DISTINCT CAST(grp AS VARCHAR) || ':'
             || CAST(sort AS VARCHAR)) AS n_after
FROM p
GROUP BY h
ORDER BY host
"""
