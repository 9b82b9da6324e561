"""Crawl-trap detection — repeating-path-segment hosts.

Calendar widgets, faceted navigation and session-id path schemes
generate unbounded URL spaces under one host ("/cal/2020/cal/2020/…"
each fetch discovering the next repetition); a frontier without trap
detection sinks its politeness-limited budget into them.  Production
crawlers (Heritrix's path-repetition rule is the classic) flag a host
when a dominant share of its discovered paths contain an immediately
repeated segment pair, then cap or excise the host in the frontier.

Detector (pure path-string analysis, no synthesis knowledge):

- split the path on ``/``, drop empties;
- a path CYCLES iff some adjacent segment pair repeats immediately
  (``segs[i]=segs[i+2] AND segs[i+1]=segs[i+3]``) — the two-segment
  unit covers the one-segment case (``/a/a/a/a``) too;
- per host: ``is_trap ⇔ cycle_pages * 2 >= n_pages`` at
  ``n_pages >= MIN_PAGES`` — integer cross-multiplication, never a
  float ratio, so the engines cannot drift at the threshold.  The
  majority rule keeps real sites with a stray user-generated cyclic
  path (``/tag/x/tag/x``) unflagged.

Fixture shape (closed form, both engines): hosts follow the discovery
stack's convention (:mod:`.robots` ``site{(doc_id div 7) % 20}``), so
trap verdicts compose directly with the frontier/robots/budget
operators.  Host indices ``% 7 == 3`` (3, 10, 17) are calendar traps:
80 % of their pages carry a 2-4× repeated ``/cal/<year>`` unit (every
fifth page is a normal landing page); every 97th document anywhere is
a stray user-generated cycle, which must NOT flip its (normal) host.

Scale shape (100 TB contract): the detector is one narrow map (split
+ a bounded ``exists`` over the segment array — native higher-order
functions, whole-stage codegen, no UDF) followed by one partially
aggregable count per host; the path string is dropped BEFORE the
exchange, which carries only ``(host, int, int)`` partials.  Output
is host-bounded, not corpus-bounded.

No reference counterpart (single-document extractor) — crawl-curation
operator from the task brief's beyond-the-reference list, sibling to
:mod:`.templates` (content-side host filter; this is the URL-side
twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .robots import DUCK_HOST, SPARK_HOST

#: below this page count a host verdict is noise
MIN_PAGES = 5

#: deterministic path synthesis — Spark SQL / DuckDB twins
SPARK_PATH = (
    "CASE WHEN pmod(pmod(doc_id div 7, 20), 7) = 3 AND doc_id % 5 != 0"
    " THEN repeat(concat('/cal/', cast(2000 + doc_id % 3 as string)),"
    "             2 + cast(doc_id % 3 as int))"
    " WHEN doc_id % 97 = 0 THEN '/tag/x/tag/x'"
    " ELSE concat('/p/', cast(doc_id % 13 as string),"
    "             '/v', cast(doc_id % 11 as string)) END"
)
DUCK_PATH = (
    "CASE WHEN ((doc_id // 7) % 20) % 7 = 3 AND doc_id % 5 != 0"
    " THEN repeat('/cal/' || CAST(2000 + doc_id % 3 AS VARCHAR),"
    "             CAST(2 + doc_id % 3 AS INT))"
    " WHEN doc_id % 97 = 0 THEN '/tag/x/tag/x'"
    " ELSE '/p/' || CAST(doc_id % 13 AS VARCHAR)"
    "     || '/v' || CAST(doc_id % 11 AS VARCHAR) END"
)

#: path cycles ⇔ an adjacent two-segment unit repeats immediately
_SPARK_CYCLES = (
    "size(segs) >= 4 AND exists(sequence(1, size(segs) - 3),"
    " i -> element_at(segs, i) = element_at(segs, i + 2)"
    " AND element_at(segs, i + 1) = element_at(segs, i + 3))"
)


def synth_paths(docs: DataFrame) -> DataFrame:
    """Fixture ``(host, path)`` synthesis from ``documents``."""
    return docs.select(
        F.expr(SPARK_HOST).alias("host"),
        F.expr(SPARK_PATH).alias("path"),
    )


def trap_report(pages: DataFrame) -> DataFrame:
    """(host, n_pages, cycle_pages, max_depth, is_trap) from a
    ``(host, path)`` frame."""
    per_page = pages.select(
        "host",
        F.expr("filter(split(path, '/'), s -> s != '')").alias("segs"),
    ).select(
        "host",
        F.expr("size(segs)").alias("depth"),
        F.expr(_SPARK_CYCLES).alias("cycles"),
    )
    return (
        per_page.groupBy("host")
        .agg(
            F.count("*").cast("int").alias("n_pages"),
            F.sum(F.expr("CASE WHEN cycles THEN 1 ELSE 0 END"))
            .cast("int").alias("cycle_pages"),
            F.max("depth").cast("int").alias("max_depth"),
        )
        .select(
            "host", "n_pages", "cycle_pages", "max_depth",
            F.expr(f"n_pages >= {MIN_PAGES}"
                   " AND cycle_pages * 2 >= n_pages").alias("is_trap"),
        )
        .orderBy("host")
    )


def duck_traps_sql(source: str = "documents") -> str:
    """DuckDB twin — same synthesis, same segment-cycle predicate,
    same integer majority threshold."""
    return f"""
WITH pages AS (
  SELECT {DUCK_HOST} AS host, {DUCK_PATH} AS path FROM {source}
), per_page AS (
  SELECT host,
         list_filter(string_split(path, '/'), s -> s <> '') AS segs
  FROM pages
), flags AS (
  SELECT host, len(segs) AS depth,
         len(list_filter(range(1, len(segs) - 2),
             i -> segs[i] = segs[i + 2]
                  AND segs[i + 1] = segs[i + 3])) > 0 AS cycles
  FROM per_page
), rollup_host AS (
  SELECT host,
         CAST(count(*) AS INT) AS n_pages,
         CAST(sum(CASE WHEN cycles THEN 1 ELSE 0 END) AS INT)
           AS cycle_pages,
         CAST(max(depth) AS INT) AS max_depth
  FROM flags GROUP BY host
)
SELECT host, n_pages, cycle_pages, max_depth,
       (n_pages >= {MIN_PAGES} AND cycle_pages * 2 >= n_pages)
         AS is_trap
FROM rollup_host ORDER BY host
"""
