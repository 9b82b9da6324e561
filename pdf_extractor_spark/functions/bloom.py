"""Deterministic Bloom-filter URL seen-set for recurring crawls.

The admission gate a crawler runs before fetching/keeping a URL:
"have we seen this URL in the previous snapshot?"  At 10^12 URLs the
exact seen-set cannot ship to executors, but a Bloom filter over it
can — false positives only (a fraction of fresh URLs wrongly skipped,
tunable via bits-per-key), never false negatives (a seen URL is
always caught).

Engine-twin construction (Spark's builtin ``bloom_filter_agg`` is
not reproducible in DuckDB, so the filter is built from scratch on
the md5 hash family both engines share):

- ``K_HASHES`` indexes per URL: ``h_i = md5(url || ':' || i)`` 60-bit
  prefix mod ``M_BITS``.
- The bit array is ``N_WORDS`` bigint words of **63 usable bits**
  (bit = idx % 63, word = idx div 63) — the sign bit is never set, so
  no engine-specific two's-complement shift behavior is in play.
- Build: one narrow map + explode(K) + a ≤``N_WORDS``-group bit_or
  aggregate with map-side combine.
- Probe (the 100 TB shape): the whole filter folds into ONE map row
  (~``8*N_WORDS`` bytes) broadcast to every task; membership is
  evaluated scan-locally with ``forall`` over the K (word, mask)
  pairs — the probe side shuffles NOTHING.

The fixture marks ``doc_id % 4 != 0`` URLs as the previous snapshot
and probes all URLs: seen URLs must always hit (no false negatives);
at the fixture fill factor (~1.5%) the expected false-positive rate
is ~(0.015)^5 ≈ 1e-9, so the oracle can assert ``seen ==
in_old`` exactly while the test documents the FP semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K_HASHES = 5
N_WORDS = 2048
BITS_PER_WORD = 63
M_BITS = N_WORDS * BITS_PER_WORD

# url synthesized from doc_id — same style as the other corpus ops
SPARK_URL = (
    "concat('https://h', cast(pmod(doc_id, 50) as string),"
    " '.example/page/', cast(doc_id as string))"
)
DUCK_URL = ("'https://h' || CAST(doc_id % 50 AS VARCHAR)"
            " || '.example/page/' || CAST(doc_id AS VARCHAR)")

OLD_PRED_SPARK = "pmod(doc_id, 4) != 0"
OLD_PRED_DUCK = "doc_id % 4 != 0"

# k bit indexes for a url column expression (Spark dialect)
_IDX = ("transform(sequence(0, {k}), i -> pmod(cast(conv(substring("
        "md5(concat({url}, ':', cast(i as string))), 1, 15), 16, 10)"
        " as bigint), {m}))")


def _spark_indexes(url_expr: str) -> str:
    return _IDX.format(k=K_HASHES - 1, url=url_expr, m=M_BITS)


def bloom_seen_report(docs: DataFrame) -> DataFrame:
    """(doc_id, url, in_old, seen): Bloom verdict per probed URL
    against the previous-snapshot URL set."""
    urls = docs.select(
        "doc_id",
        F.expr(SPARK_URL).alias("url"),
        F.expr(OLD_PRED_SPARK).alias("in_old"),
        F.expr(_spark_indexes(SPARK_URL)).alias("idx"),
    )
    bits = (
        urls.filter("in_old")
        .select(F.explode("idx").alias("i"))
        .select(
            F.expr(f"i div {BITS_PER_WORD}").alias("w"),
            F.expr(
                f"shiftleft(cast(1 as bigint), "
                f"cast(i % {BITS_PER_WORD} as int))"
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    bloom = bits.agg(
        F.map_from_entries(
            F.collect_list(F.struct("w", "word"))
        ).alias("bloom")
    )
    return (
        urls.crossJoin(F.broadcast(bloom))
        .select(
            "doc_id", "url", "in_old",
            F.expr(
                f"forall(idx, i -> "
                f"coalesce(bloom[i div {BITS_PER_WORD}], 0L) & "
                f"shiftleft(cast(1 as bigint), "
                f"cast(i % {BITS_PER_WORD} as int)) != 0)"
            ).alias("seen"),
        )
    )


def duck_bloom_sql(source: str = "documents") -> str:
    """DuckDB twin — same hash family and bit layout; the relational
    probe (join + count == K) replaces the map lookup, same result."""
    return f"""
WITH urls AS (
  SELECT doc_id, {DUCK_URL} AS url, {OLD_PRED_DUCK} AS in_old
  FROM {source}
), idx AS (
  SELECT doc_id, url, in_old,
         CAST('0x' || substr(md5(url || ':' || CAST(i AS VARCHAR)),
              1, 15) AS BIGINT) % {M_BITS} AS bit_idx
  FROM urls, generate_series(0, {K_HASHES - 1}) AS t(i)
), words AS (
  SELECT bit_idx // {BITS_PER_WORD} AS w,
         bit_or(1::BIGINT << CAST(bit_idx % {BITS_PER_WORD} AS INT))
           AS word
  FROM idx WHERE in_old GROUP BY 1
), probe AS (
  SELECT i.doc_id,
         count(*) FILTER (
           WHERE (w.word & (1::BIGINT
                  << CAST(i.bit_idx % {BITS_PER_WORD} AS INT))) != 0
         ) AS hits
  FROM idx i
  LEFT JOIN words w ON i.bit_idx // {BITS_PER_WORD} = w.w
  GROUP BY i.doc_id
)
SELECT u.doc_id, u.url, u.in_old,
       coalesce(p.hits, 0) = {K_HASHES} AS seen
FROM urls u LEFT JOIN probe p ON u.doc_id = p.doc_id
"""
