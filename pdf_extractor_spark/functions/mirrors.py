"""Mirror-host detection: host pairs serving the same content.

Mirrors (full-site copies under a different domain: country CDNs,
scrapers, archive re-hosts) are a crawl-budget sink and a dedup
amplifier — every mirrored page is a guaranteed duplicate fetch. The
standard detection is set overlap over per-page CONTENT fingerprints
aggregated to the host: two hosts whose fingerprint sets overlap
beyond a threshold are mirror candidates, and the smaller one is
dropped from the frontier (or demoted to spot-check recrawls).

Scale shape: the join key is the 16-byte content fingerprint — text
never shuffles. (host, fingerprint) is de-duplicated FIRST (map-side
combinable), so a host re-serving one page 10^6 times contributes one
row. The self-join fans out per fingerprint as C(H,2) over the H
hosts sharing it; boilerplate fingerprints shared by thousands of
hosts would explode that, so fingerprints above ``max_hosts_per_fp``
are dropped before the join — the same frequency cap the n-gram
overlap join uses (a page served by that many hosts is boilerplate,
not mirroring evidence; dropping it loses nothing and bounds the
fan-out by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import host_of, synth_url
from .textstats import fingerprints

MIRROR_MIN_JACCARD_BP = 3000   # 30 % set overlap → mirror candidate
MAX_HOSTS_PER_FP = 32          # boilerplate cap on the join fan-out


def mirror_host_pairs(
    docs: DataFrame,
    text_col: Column | None = None,
    min_jaccard_bp: int = MIRROR_MIN_JACCARD_BP,
    max_hosts_per_fp: int = MAX_HOSTS_PER_FP,
) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, jaccard_bp) for host pairs
    whose distinct-fingerprint Jaccard (basis points, integer-exact)
    reaches ``min_jaccard_bp``. ``text_col`` optionally replaces the
    text expression (the catalog plants cross-host duplicates so the
    query cannot pass vacuously on the duplicate-free fixtures)."""
    src = docs.select(
        "doc_id",
        synth_url().alias("url"),
        (text_col if text_col is not None else F.col("text")).alias(
            "text"
        ),
    ).withColumn("host", host_of())
    fps = (
        fingerprints(src.select(F.col("host").alias("doc_id"), "text"))
        .withColumnRenamed("doc_id", "host")
        .distinct()
    )
    # lazy localCheckpoint: fps feeds the boilerplate-cap aggregate,
    # the capped join AND the size aggregate — without it each
    # consumer re-scans and re-hashes the corpus text. The frame is
    # (host, 16-byte fp), tiny relative to the text it summarizes.
    fps = fps.localCheckpoint(eager=False)
    # boilerplate cap: a fingerprint on too many hosts is dropped
    capped = fps.join(
        fps.groupBy("fingerprint")
        .agg(F.count("*").alias("n_hosts"))
        .where(F.col("n_hosts") <= max_hosts_per_fp)
        .select("fingerprint"),
        "fingerprint",
    )
    sizes = capped.groupBy("host").agg(F.count("*").alias("n_fps"))
    a = capped.select(F.col("host").alias("host_a"), "fingerprint")
    b = capped.select(F.col("host").alias("host_b"), "fingerprint")
    shared = (
        a.join(b, "fingerprint")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(
            sizes.withColumnRenamed("host", "host_a").withColumnRenamed(
                "n_fps", "n_a"
            ),
            "host_a",
        )
        .join(
            sizes.withColumnRenamed("host", "host_b").withColumnRenamed(
                "n_fps", "n_b"
            ),
            "host_b",
        )
        .withColumn(
            "jaccard_bp",
            F.expr("shared * 10000 div (n_a + n_b - shared)"),
        )
        .where(F.col("jaccard_bp") >= min_jaccard_bp)
        .select("host_a", "host_b", "shared", "n_a", "n_b", "jaccard_bp")
        .orderBy("host_a", "host_b")
    )


def duck_mirror_sql(
    text_expr: str = "text",
    source: str = "documents",
    min_jaccard_bp: int = MIRROR_MIN_JACCARD_BP,
    max_hosts_per_fp: int = MAX_HOSTS_PER_FP,
) -> str:
    from .sampling import DUCK_SYNTH_URL, HOST_REGEX

    return rf"""
WITH src AS (
  SELECT regexp_extract({DUCK_SYNTH_URL}, '{HOST_REGEX}', 1) AS host,
         {text_expr} AS text
  FROM {source}
), fps AS (
  SELECT DISTINCT host,
         md5(trim(regexp_replace(lower(text),
                  '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fingerprint
  FROM src
), capped AS (
  SELECT host, fingerprint FROM fps
  WHERE fingerprint IN (
    SELECT fingerprint FROM fps GROUP BY fingerprint
    HAVING count(*) <= {max_hosts_per_fp}
  )
), sizes AS (
  SELECT host, count(*) AS n_fps FROM capped GROUP BY host
), shared AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
  FROM capped a JOIN capped b ON a.fingerprint = b.fingerprint
  WHERE a.host < b.host
  GROUP BY a.host, b.host
)
SELECT s.host_a, s.host_b,
       CAST(s.shared AS BIGINT)  AS shared,
       CAST(sa.n_fps AS BIGINT)  AS n_a,
       CAST(sb.n_fps AS BIGINT)  AS n_b,
       CAST(s.shared * 10000 // (sa.n_fps + sb.n_fps - s.shared)
            AS BIGINT)           AS jaccard_bp
FROM shared s
JOIN sizes sa ON s.host_a = sa.host
JOIN sizes sb ON s.host_b = sb.host
WHERE s.shared * 10000 // (sa.n_fps + sb.n_fps - s.shared)
      >= {min_jaccard_bp}
ORDER BY s.host_a, s.host_b
"""
