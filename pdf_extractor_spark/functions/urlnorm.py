"""URL canonicalization + canonical-URL dedup (web-corpus ops).

A crawl sees the same page under many spellings: mixed-case hosts,
explicit default ports, tracking parameters (utm_*, gclid, fbclid,
...), shuffled query order, fragments. Training pipelines canonicalize
BEFORE url-level dedup, or near-identical pages survive as "distinct
urls". Steps here (the conservative, no-information-loss subset every
major pipeline agrees on):

1. lowercase the scheme and host,
2. strip an explicit default port (``:80`` http / ``:443`` https),
3. drop the fragment,
4. drop tracking parameters (utm_*, gclid, fbclid, ref, mc_cid,
   mc_eid, igshid, msclkid),
5. sort the surviving query parameters,
6. empty path → ``/``.

Everything is native Column expressions (regexp + array HOFs — no
UDFs, stays inside whole-stage codegen), with bit-identical DuckDB
twins for the oracle. Scale shape: canonicalization is a pure narrow
map; the dedup step is one ``row_number`` window partitioned by the
canonical url — the same pay-once shuffle as
:mod:`.sampling`'s domain cap, and at 10^12 rows the window key is
the canonical url hash, never document payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# one param per element: "k=v"; tracking keys dropped by prefix match
TRACKING_PARAM_REGEX = (
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref|mc_cid|mc_eid|igshid|"
    "msclkid)="
)
_URL_PARTS = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
_QUERY_PART = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract — a single
    native expression tree (regexp extracts + array HOFs)."""
    scheme = F.lower(F.regexp_extract(url, _URL_PARTS, 1))
    hostport = F.lower(F.regexp_extract(url, _URL_PARTS, 2))
    host = (
        F.when(
            scheme == "http", F.regexp_replace(hostport, ":80$", "")
        )
        .when(
            scheme == "https", F.regexp_replace(hostport, ":443$", "")
        )
        .otherwise(hostport)
    )
    path = F.regexp_extract(url, _URL_PARTS, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_PART, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
        )
    )
    qjoin = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoin == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qjoin)
        ),
    )


def duck_canonical_url(url_expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` over a VARCHAR
    expression."""
    u = url_expr
    scheme = f"lower(regexp_extract({u}, '{_URL_PARTS}', 1))"
    hostport = f"lower(regexp_extract({u}, '{_URL_PARTS}', 2))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN "
        f"regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN "
        f"regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = (
        f"CASE WHEN regexp_extract({u}, '{_URL_PARTS}', 3) = '' "
        f"THEN '/' ELSE regexp_extract({u}, '{_URL_PARTS}', 3) END"
    )
    query = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> len(p) > 0 AND NOT "
        f"regexp_matches(p, '{TRACKING_PARAM_REGEX}')))"
    )
    qjoin = f"array_to_string({params}, '&')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qjoin} = '' THEN '' ELSE '?' || {qjoin} END"
    )


# ---------------------------------------------------------------------
# Deterministic MESSY url synthesis for the fixture documents table
# (the real pipeline's pages table carries url natively). Docs
# {r, r+5, r+10, r+15} inside each 20-block canonicalize to the SAME
# url through DIFFERENT spellings (case, default port, tracking
# params, fragment, param order — parity alternates within each
# cluster, so equality only holds through canonicalization) and the
# dedup step has real work to do.
# ---------------------------------------------------------------------

def messy_url() -> Column:
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(
        F.lit("https")
    )
    host = F.when(
        d % 2 == 0,
        F.concat(F.lit("Site"), (d % 5).cast("string"),
                 F.lit(".Example.COM:443")),
    ).otherwise(
        F.concat(F.lit("site"), (d % 5).cast("string"),
                 F.lit(".example.com")),
    )
    path = F.concat(
        F.lit("/p/"), F.floor(d / 20).cast("string")
    )
    tail = F.when(
        d % 2 == 0, F.lit("?utm_source=feed&b=2&a=1#sec3")
    ).otherwise(F.lit("?a=1&gclid=XYZ&b=2"))
    return F.concat(scheme, F.lit("://"), host, path, tail)


DUCK_MESSY_URL = (
    "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' "
    "|| CASE WHEN doc_id % 2 = 0 THEN 'Site' || "
    "CAST(doc_id % 5 AS VARCHAR) || '.Example.COM:443' "
    "ELSE 'site' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' "
    "END || '/p/' || CAST(doc_id // 20 AS VARCHAR) || "
    "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1#sec3' "
    "ELSE '?a=1&gclid=XYZ&b=2' END"
)


def url_canonical_report(docs: DataFrame) -> DataFrame:
    """Per-document canonicalization + canonical-url dedup decision:
    (doc_id, canonical_url, is_kept) where the LOWEST doc_id per
    canonical url is kept — one narrow map + one window shuffle on
    the canonical key."""
    w = Window.partitionBy("canonical_url").orderBy("doc_id")
    return (
        docs.select(
            "doc_id", messy_url().alias("url")
        )
        .withColumn("canonical_url", canonical_url(F.col("url")))
        .withColumn(
            "is_kept",
            (F.row_number().over(w) == 1).cast("int"),
        )
        .select("doc_id", "canonical_url", "is_kept")
    )
