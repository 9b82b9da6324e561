"""Corpus-management operators: per-domain capping and deterministic
hash sampling.

Both are standard steps in a Common-Crawl-scale training-data
pipeline: a handful of hosts contribute a grossly disproportionate
share of pages, so corpora cap documents-per-domain; and every
pipeline needs reproducible subsampling that doesn't depend on row
order or RNG state (hash-mod sampling keeps the SAME documents across
re-runs, partitionings, and engines).

Scale notes (100 TB):

- **domain cap**: `row_number() over (partition by host order by
  doc_id)` — a sort-based window that spills per host. The crawl's top
  domain can be ~1% of the corpus in one window partition; that is
  sort-spill territory, not OOM (Spark's window sorts run off-heap and
  spill), and because only the TOP-k rows per host are kept the
  follow-up aggregate collapses immediately. If k is tiny and the skew
  extreme, the two-pass variant (approximate per-host counts →
  pre-filter obvious keepers → window only over hosts above k) cuts
  the sorted volume; the single-window form is the correct default.
- **hash sampling**: pure scan-local predicate on a hash of the key —
  no shuffle, no sort, trivially reproducible. The md5-based bucket is
  used here so DuckDB verifies bit-for-bit; on a real cluster
  `xxhash64` computes faster but md5 is noise next to parquet I/O.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deterministic URL synthesis for the fixture documents table (the
# testdata carries `source`/`lang` but no URL column; the pages table
# of the real pipeline has `url` natively)
HOST_REGEX = "^https?://([^/]+)/"
DOMAIN_CAP_DEFAULT = 30
SAMPLE_BUCKETS = 100


def synth_url() -> Column:
    return F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )


DUCK_SYNTH_URL = (
    "'https://' || source || '.example.com/' || lang || '/' "
    "|| CAST(doc_id AS VARCHAR)"
)


def host_of(url_col: str = "url") -> Column:
    return F.regexp_extract(F.col(url_col), HOST_REGEX, 1)


def domain_cap_stats(
    docs: DataFrame, k: int = DOMAIN_CAP_DEFAULT
) -> DataFrame:
    """Cap documents per host at ``k`` (keep the k smallest doc_ids —
    deterministic) and report per-host totals vs kept counts."""
    with_host = docs.withColumn("url", synth_url()).withColumn(
        "host", host_of()
    )
    w = Window.partitionBy("host").orderBy("doc_id")
    ranked = with_host.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("rn") <= k).cast("long")).alias("n_kept"),
        )
        .orderBy("host")
    )


# hash bucket in [0, SAMPLE_BUCKETS): first 15 md5 hex chars of the
# stringified key, mod buckets — reproducible in any engine with md5
def hash_bucket(key_col: str = "doc_id") -> Column:
    return (
        F.expr(
            "cast(conv(substring(md5(cast("
            f"{key_col} as string)), 1, 15), 16, 10) as bigint)"
        )
        % SAMPLE_BUCKETS
    )


def duck_hash_bucket(key_col: str = "doc_id") -> str:
    return (
        f"(CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) % {SAMPLE_BUCKETS})"
    )


def hash_sample_stats(docs: DataFrame, pct: int = 10) -> DataFrame:
    """Deterministic ``pct``% hash sample of the corpus, reported per
    language: total docs, sampled docs, observed fraction (the
    unbiasedness check a pipeline asserts before trusting the
    sample)."""
    sampled = (hash_bucket() < pct).cast("long")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sampled).alias("n_sampled"),
            F.round(
                F.sum(sampled).cast("double") / F.count("*"), 4
            ).alias("observed_frac"),
        )
        .orderBy("lang")
    )
