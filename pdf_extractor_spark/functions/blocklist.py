"""URL blocklist filtering (UT1/adult-list style) — the step every
web-corpus pipeline runs FIRST, before extraction is even attempted:
drop documents whose host falls under a blocked registered domain or
whose path contains a blocked keyword segment.

Scale shape (the part that matters at 100 TB):

- Real blocklists are large (UT1 ships ~4M domains), so membership
  must be an **equi join against a broadcast table**, never a
  ``LIKE``-per-entry scan (that is O(corpus x blocklist)). Suffix
  semantics ("blocking ``badnet.com`` also blocks
  ``ads.eu.badnet.com``") are made equi-joinable by expanding each
  host into its domain suffixes on label boundaries — a host of L
  labels yields at most L-1 suffix keys (hosts are short; this is a
  bounded narrow map), each of which probes the broadcast hash table
  map-side. Zero shuffle of corpus rows.
- Path-keyword blocking is ``arrays_overlap`` against a literal
  array — pure narrow map inside codegen.
- The document ``text`` column is never touched: column pruning keeps
  the scan at (doc_id, source, lang) for the synthetic-url catalog
  query, and (url) alone on a real pages table.

Blocking semantics (UT1 convention):

- a host is blocked by entry ``d`` iff ``host == d`` or host ends
  with ``"." + d`` (label boundary — ``notbadnet.com`` is NOT blocked
  by ``badnet.com``);
- a path is blocked iff any ``/``-segment equals a blocked keyword
  (exact segment match, not substring — ``/cassino-reviews`` is not
  blocked by ``casino``).

No reference counterpart (the reference is a single-document
extractor, ``extractor.py``) — this is a training-pipeline operator
from the task brief's beyond-the-reference list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: frozen blocklists for the catalog query (stand-ins for UT1-class
#: lists; the operator takes them as parameters).
BLOCKED_DOMAINS = ("badnet.com", "example.net", "tracker.org")
BLOCKED_PATH_WORDS = ("casino", "pills")

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#:]*)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"


# ---------------------------------------------------------------------
# Deterministic url synthesis for the fixture documents table (the
# real pipeline's pages table carries url natively). Hosts rotate
# through blocked-suffix, blocked-exact, lookalike (NOT blocked — the
# label-boundary case) and clean shapes; every 11th path carries a
# blocked keyword segment, every 13th a lookalike substring.
# ---------------------------------------------------------------------

def synth_block_url() -> Column:
    d = F.col("doc_id")
    host = (
        F.when(d % 7 == 0, F.concat(F.lit("ads.eu"), F.lit(".badnet.com")))
        .when(d % 7 == 1, F.lit("example.net"))
        .when(d % 7 == 2, F.lit("notbadnet.com"))  # lookalike: kept
        .when(d % 7 == 3, F.concat(F.lit("cdn"), (d % 3).cast("string"),
                                   F.lit(".tracker.org")))
        .otherwise(
            F.concat(F.lit("site"), (d % 5).cast("string"),
                     F.lit(".example.org"))
        )
    )
    seg = (
        F.when(d % 11 == 0, F.lit("casino"))
        .when(d % 13 == 0, F.lit("casino-reviews"))  # substring: kept
        .otherwise(F.lit("article"))
    )
    return F.concat(
        F.lit("https://"), host, F.lit("/"), seg, F.lit("/"),
        d.cast("string"),
    )


DUCK_BLOCK_URL = (
    "'https://' || "
    "CASE WHEN doc_id % 7 = 0 THEN 'ads.eu.badnet.com' "
    "WHEN doc_id % 7 = 1 THEN 'example.net' "
    "WHEN doc_id % 7 = 2 THEN 'notbadnet.com' "
    "WHEN doc_id % 7 = 3 THEN 'cdn' || CAST(doc_id % 3 AS VARCHAR) "
    "|| '.tracker.org' "
    "ELSE 'site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' END "
    "|| '/' || "
    "CASE WHEN doc_id % 11 = 0 THEN 'casino' "
    "WHEN doc_id % 13 = 0 THEN 'casino-reviews' "
    "ELSE 'article' END || '/' || CAST(doc_id AS VARCHAR)"
)


def host_suffixes(host: Column) -> Column:
    """All label-boundary suffixes of ``host`` with >= 2 labels:
    ``a.b.c.com`` -> [``a.b.c.com``, ``b.c.com``, ``c.com``]. Native
    transform over a bounded label array — no UDF."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # sequence(1, 0) DESCENDS in Spark, so a single-label host must
    # short-circuit to an empty index array, not rely on an empty range
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.array_join(F.slice(labels, i, n), ".")
    )


def url_blocklist_report(
    docs_with_url: DataFrame,
    domains: tuple[str, ...] = BLOCKED_DOMAINS,
    path_words: tuple[str, ...] = BLOCKED_PATH_WORDS,
) -> DataFrame:
    """Per-document blocklist decision over ``(doc_id, url)``:
    (doc_id, host, block_domain, path_blocked, is_kept). The domain
    probe is host-suffix expansion -> equi join against the broadcast
    blocklist; the path probe is ``arrays_overlap`` in codegen. The
    only exchange is the per-doc regroup after suffix expansion, and
    ``max`` is partially aggregable, so the map-side combine collapses
    each doc's <= L suffix rows locally and the shuffle carries ONE
    fixed-width row per document — never text. ``block_domain`` is
    the greatest matching entry ('' when clean); the shipped lists
    are suffix-disjoint so at most one entry can match a host."""
    spark = docs_with_url.sparkSession
    block = spark.createDataFrame(
        [(d.lower(),) for d in domains], "block_domain string"
    )
    path_words = tuple(w.lower() for w in path_words)
    # DNS hosts and URL schemes are case-insensitive (RFC 3986 §6.2.2.1)
    # and UT1-class keyword blocking is case-blind by convention —
    # normalize the url once so 'HTTPS://Ads.BADNET.com/CASINO' cannot
    # bypass the filter by casing.
    url_l = F.lower(F.col("url"))
    host = F.regexp_extract(url_l, _HOST_RE, 1)
    segs = F.filter(
        F.split(F.regexp_extract(url_l, _PATH_RE, 1), "/"),
        lambda s: s != "",
    )
    based = docs_with_url.select(
        "doc_id",
        host.alias("host"),
        F.arrays_overlap(
            segs, F.array(*[F.lit(w) for w in path_words])
        ).cast("int").alias("path_blocked"),
    )
    probed = (
        based.withColumn("sfx", F.explode_outer(host_suffixes(F.col("host"))))
        .join(
            F.broadcast(block),
            F.col("sfx") == F.col("block_domain"),
            "left",
        )
        .groupBy("doc_id", "host", "path_blocked")
        .agg(F.max("block_domain").alias("bd"))
    )
    return probed.select(
        "doc_id",
        "host",
        F.coalesce(F.col("bd"), F.lit("")).alias("block_domain"),
        "path_blocked",
        (
            (F.col("bd").isNull()) & (F.col("path_blocked") == 0)
        ).cast("int").alias("is_kept"),
    )


def duck_blocklist_sql(
    domains: tuple[str, ...] = BLOCKED_DOMAINS,
    path_words: tuple[str, ...] = BLOCKED_PATH_WORDS,
) -> str:
    """DuckDB twin over the synthetic-url documents table. The oracle
    states the SEMANTICS directly (per-entry suffix test + segment
    membership) — the Spark side's join shape must reproduce it."""
    dom_match = (
        "(SELECT max(d) FROM (SELECT unnest(["
        + ",".join(f"'{d.lower()}'" for d in domains)
        + "]) AS d) WHERE host = d OR host LIKE '%.' || d)"
    )
    seg_list = ",".join(f"'{w.lower()}'" for w in path_words)
    return f"""
WITH u AS (
  SELECT doc_id, lower({DUCK_BLOCK_URL}) AS url FROM documents
), h AS (
  SELECT doc_id,
         regexp_extract(url, '{_HOST_RE}', 1) AS host,
         list_has_any(
           list_filter(string_split(
             regexp_extract(url, '{_PATH_RE}', 1), '/'),
             s -> s <> ''),
           [{seg_list}]) AS pb
  FROM u
), m AS (
  SELECT doc_id, host, pb, {dom_match} AS bd FROM h
)
SELECT doc_id, host,
       coalesce(bd, '') AS block_domain,
       CAST(pb AS INTEGER) AS path_blocked,
       CAST(bd IS NULL AND NOT pb AS INTEGER) AS is_kept
FROM m
ORDER BY doc_id
"""
