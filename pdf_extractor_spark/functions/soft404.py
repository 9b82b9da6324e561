"""Soft-404 detection — flagging hosts that answer HTTP 200 with
error pages, so the corpus doesn't fill up with "Page Not Found"
boilerplate and the crawler stops trusting those hosts' status codes.

The Heritrix-class signal pair:

* per page: an error-phrase match ("page not found", "error 404",
  "does not exist", "no longer available" — case-insensitive) on a
  page whose DECLARED status is 200 (an honest 404 is not soft — the
  fixture plants an honest host to prove the distinction);
* per host: template uniformity — soft-404s come from one server
  template, so their lengths collapse onto a single modal value.
  The report carries the modal-length count over the host's 200-
  status pages alongside the soft rate.

Flag rule: a host is flagged when ≥ 10 % of its 200-status pages
match the error phrases.  All native expressions: one narrow map
(phrase flag + length), then two partially-aggregable exchanges
((host, len) then host) carrying fixed-width counter rows — page
text never shuffles (plan-pinned).

Fixture (closed form): ``host = doc_id % 25``.  Hosts 3/7/11 are
soft-404-prone: every 4th page serves the fixed error template under
status 200.  Host 17 serves the SAME template for the same pages but
declares status 404 honestly — its soft count must be zero.  All
other pages carry the document text under status 200.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ERROR_BODY = (
    "Error 404 - Page Not Found. The page you requested does not "
    "exist or is no longer available."
)

PRONE_HOSTS = (3, 7, 11)
HONEST_HOST = 17

#: same source text compiles under Java regex and RE2
PHRASE_RE = (
    "(?i)(page not found|error 404|does not exist|no longer available)"
)


def synth_status_pages(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, host, status, body) per the fixture."""
    h = F.col("doc_id") % 25
    err_page = (F.col("doc_id") % 4 == 1) & h.isin(
        *PRONE_HOSTS, HONEST_HOST
    )
    return docs.select(
        "doc_id",
        F.concat(F.lit("site"), h.cast("string"), F.lit(".example"))
        .alias("host"),
        F.when(
            (F.col("doc_id") % 4 == 1) & (h == HONEST_HOST), F.lit(404)
        )
        .otherwise(F.lit(200))
        .cast("int")
        .alias("status"),
        F.when(err_page, F.lit(ERROR_BODY))
        .otherwise(F.col("text"))
        .alias("body"),
    )


def soft404_report(pages: DataFrame) -> DataFrame:
    """(host, n_pages, n_ok200, n_soft404, modal_len_count, flagged).

    Stage 1 projects the fixed-width row (host, flags, length) — the
    body is dropped before any exchange.  ``modal_len_count`` is the
    size of the largest identical-length cohort among the host's
    200-status pages (the template-uniformity signal); a count, so
    modal ties cannot make the output nondeterministic."""
    page = pages.select(
        "host",
        (F.col("status") == 200).alias("ok200"),
        (
            (F.col("status") == 200) & F.col("body").rlike(PHRASE_RE)
        ).alias("soft"),
        F.when(F.col("status") == 200, F.length("body")).alias("len200"),
    )
    by_len = page.groupBy("host", "len200").agg(
        F.count("*").alias("n"),
        F.sum(F.col("soft").cast("long")).alias("s"),
        F.sum(F.col("ok200").cast("long")).alias("o"),
    )
    return (
        by_len.groupBy("host")
        .agg(
            F.sum("n").alias("n_pages"),
            F.sum("o").alias("n_ok200"),
            F.sum("s").alias("n_soft404"),
            F.max(
                F.when(F.col("len200").isNotNull(), F.col("n"))
            ).alias("modal_len_count"),
        )
        .select(
            "host",
            F.col("n_pages").cast("bigint").alias("n_pages"),
            F.col("n_ok200").cast("bigint").alias("n_ok200"),
            F.col("n_soft404").cast("bigint").alias("n_soft404"),
            F.col("modal_len_count").cast("bigint").alias(
                "modal_len_count"
            ),
            (
                (F.col("n_soft404") > 0)
                & (F.col("n_soft404") * 10 >= F.col("n_ok200"))
            ).alias("flagged"),
        )
        .orderBy("host")
    )


def duck_soft404_sql(source: str = "documents") -> str:
    """DuckDB twin: identical synthesis arithmetic, phrase regex,
    two-level rollup and flag rule."""
    prone = ", ".join(str(h) for h in PRONE_HOSTS)
    return f"""
WITH pages AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 25 AS VARCHAR) || '.example' AS host,
         CASE WHEN doc_id % 4 = 1 AND doc_id % 25 = {HONEST_HOST}
              THEN 404 ELSE 200 END AS status,
         CASE WHEN doc_id % 4 = 1
                   AND doc_id % 25 IN ({prone}, {HONEST_HOST})
              THEN '{ERROR_BODY}' ELSE text END AS body
  FROM {source}
), page AS (
  SELECT host,
         status = 200 AS ok200,
         status = 200 AND regexp_matches(body, '{PHRASE_RE}') AS soft,
         CASE WHEN status = 200 THEN length(body) END AS len200
  FROM pages
), by_len AS (
  SELECT host, len200, count(*) AS n,
         sum(CASE WHEN soft THEN 1 ELSE 0 END) AS s,
         sum(CASE WHEN ok200 THEN 1 ELSE 0 END) AS o
  FROM page GROUP BY host, len200
)
SELECT host,
       CAST(sum(n) AS BIGINT) AS n_pages,
       CAST(sum(o) AS BIGINT) AS n_ok200,
       CAST(sum(s) AS BIGINT) AS n_soft404,
       CAST(max(CASE WHEN len200 IS NOT NULL THEN n END) AS BIGINT)
         AS modal_len_count,
       sum(s) > 0 AND sum(s) * 10 >= sum(o) AS flagged
FROM by_len GROUP BY host ORDER BY host
"""
