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


# hash bucket in [0, buckets): first 15 md5 hex chars of the
# stringified key, mod buckets — reproducible in any engine with md5
def hash_bucket(
    key_col: str = "doc_id", buckets: int = SAMPLE_BUCKETS
) -> Column:
    return (
        F.expr(
            "cast(conv(substring(md5(cast("
            f"{key_col} as string)), 1, 15), 16, 10) as bigint)"
        )
        % buckets
    )


def duck_hash_bucket(
    key_col: str = "doc_id", buckets: int = SAMPLE_BUCKETS
) -> str:
    return (
        f"(CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) % {buckets})"
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


# ------------------------------------------------- domain / language mixing
#
# DoReMi-lite corpus mixing: given frozen target shares (basis
# points), compute the largest total token budget the corpus can
# serve at those shares (the scarcest group binds), derive each
# group's deterministic hash-sampling rate, and report the realized
# draw. The standard step between filtering and sequence packing when
# a pre-training mix is specified by fraction, not by count. All
# arithmetic integer-exact; the per-doc draw is the same md5 bucket
# family as hash_sample_stats, so re-runs and both engines agree
# bit-for-bit.
#
# Scale shape: two tiny aggregates (per-group counts; one global min
# over <= |groups| rows), target + rate tables broadcast, the per-doc
# keep decision a scan-local predicate — document text never shuffles
# and the corpus is read once.

TARGET_MIX_BP = {
    "en": 5000, "de": 1500, "fr": 1500, "es": 1000, "zh": 1000,
}
MIX_BUCKETS = 10_000


def mix_bucket(key_col: str = "doc_id") -> Column:
    return hash_bucket(key_col, MIX_BUCKETS)


def duck_mix_bucket(key_col: str = "doc_id") -> str:
    return duck_hash_bucket(key_col, MIX_BUCKETS)


def domain_mix_report(
    docs: DataFrame, mix: dict[str, int] | None = None
) -> DataFrame:
    """Per-group mixing report: (lang, n_docs, n_tokens, target_bp,
    quota_tokens, rate_bp, n_kept, kept_tokens). ``quota_tokens`` is
    the group's share of the binding budget; ``rate_bp`` the derived
    deterministic sampling rate; n_kept/kept_tokens the realized
    draw."""
    mix = TARGET_MIX_BP if mix is None else mix
    spark = docs.sparkSession
    target = spark.createDataFrame(
        sorted(mix.items()), "lang string, target_bp long"
    )
    toks = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_toks")
    )
    # lazy localCheckpoint: Catalyst has no common-subplan reuse, and
    # toks feeds both the budget aggregates and the per-doc keep pass —
    # without it the corpus is scanned and re-split twice. The
    # checkpointed frame is the narrow (doc_id, lang, n_toks)
    # projection, tiny relative to the text it summarizes.
    toks = toks.localCheckpoint(eager=False)
    # full outer: a targeted language ABSENT from the corpus must still
    # bind the budget (its n_tokens = 0 drives the min to 0 — the
    # scarcest-group-binds contract) and must appear in the report.
    grp = (
        toks.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .join(target, "lang", "full_outer")
        .na.fill({"target_bp": 0, "n_docs": 0, "n_tokens": 0})
    )
    # the scarcest targeted group binds the total achievable budget
    cap = grp.where(F.col("target_bp") > 0).agg(
        F.min(F.expr("(n_tokens * 10000) div target_bp")).alias("budget")
    )
    rates = grp.crossJoin(F.broadcast(cap)).select(
        "lang",
        "n_docs",
        "n_tokens",
        "target_bp",
        F.expr("(budget * target_bp) div 10000").alias("quota_tokens"),
        F.expr(
            "case when n_tokens > 0 then "
            "((budget * target_bp) div 10000) * 10000 div n_tokens "
            "else 0 end"
        ).alias("rate_bp"),
    )
    kept = (
        toks.join(
            F.broadcast(rates.select("lang", "rate_bp")), "lang"
        )
        .where(mix_bucket() < F.col("rate_bp"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_toks").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .na.fill({"n_kept": 0, "kept_tokens": 0})
        .orderBy("lang")
    )


def duck_domain_mix_sql(
    source: str = "documents", mix: dict[str, int] | None = None
) -> str:
    """DuckDB twin of :func:`domain_mix_report`."""
    mix = TARGET_MIX_BP if mix is None else mix
    values = ", ".join(f"('{k}', {v})" for k, v in sorted(mix.items()))
    return f"""
WITH target(lang, target_bp) AS (VALUES {values}),
toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks
  FROM {source}
), agg AS (
  SELECT lang, count(*) AS n_docs, sum(n_toks) AS n_tokens
  FROM toks GROUP BY lang
), grp AS (
  -- full outer: targets absent from the corpus bind the budget at 0
  SELECT coalesce(a.lang, tg.lang) AS lang,
         coalesce(a.n_docs, 0) AS n_docs,
         coalesce(a.n_tokens, 0) AS n_tokens,
         coalesce(tg.target_bp, 0) AS target_bp
  FROM agg a FULL JOIN target tg ON a.lang = tg.lang
), cap AS (
  SELECT min((n_tokens * 10000) // target_bp) AS budget
  FROM grp WHERE target_bp > 0
), rates AS (
  SELECT lang, n_docs, n_tokens, target_bp,
         (cap.budget * target_bp) // 10000 AS quota_tokens,
         CASE WHEN n_tokens > 0 THEN
           ((cap.budget * target_bp) // 10000) * 10000 // n_tokens
         ELSE 0 END AS rate_bp
  FROM grp CROSS JOIN cap
), kept AS (
  SELECT t.lang, count(*) AS n_kept, sum(t.n_toks) AS kept_tokens
  FROM toks t JOIN rates r ON t.lang = r.lang
  WHERE {duck_mix_bucket()} < r.rate_bp
  GROUP BY t.lang
)
SELECT r.lang,
       CAST(r.n_docs AS BIGINT) AS n_docs,
       CAST(r.n_tokens AS BIGINT) AS n_tokens,
       CAST(r.target_bp AS BIGINT) AS target_bp,
       CAST(r.quota_tokens AS BIGINT) AS quota_tokens,
       CAST(r.rate_bp AS BIGINT) AS rate_bp,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
ORDER BY r.lang
"""


# ------------------------------------------------ leakage-safe splits
#
# Train/validation/test assignment for a crawl corpus. The unit of
# assignment is the REGISTERED domain (eTLD+1 against an embedded
# public-suffix subset), not the page: near-duplicate pages live
# overwhelmingly within a site (templates, mirrors, pagination), so a
# page-level random split leaks train content into eval. Putting
# every page of a domain in one split is the standard defense (the
# same reason dedup keys on content, not url).
#
# Scale shape: registered-domain extraction and the md5 bucket are
# scan-local native expressions — zero exchanges, zero UDFs, text
# untouched. The embedded suffix subset mirrors how a production job
# ships the PSL: a broadcast lookup, here inlined as expression
# literals so the DuckDB twin is bit-identical.

# multi-label suffixes under which the NEXT label is the registrable
# name; includes PSL *private-section* entries (github.io-class
# platform registries — each subdomain is an independent publisher,
# exactly the leakage boundary wanted). example.com is listed as a
# private registry because the fixture corpus synthesizes its hosts
# as {source}.example.com.
SPLIT_SUFFIXES = (
    "example.com", "co.uk", "com.au", "co.jp",
    "github.io", "blogspot.com",
)
SPLIT_BUCKETS = 100
SPLIT_TRAIN_LT = 90   # buckets [0, 90) → train
SPLIT_VALID_LT = 95   # buckets [90, 95) → valid; [95, 100) → test


def registered_domain(host_col: Column) -> Column:
    """eTLD+1: the label before a known multi-label suffix, else the
    last two labels."""
    out = F.regexp_extract(host_col, r"([^.]+\.[^.]+)$", 1)
    for suf in SPLIT_SUFFIXES:
        pat = "([^.]+\\." + suf.replace(".", "\\.") + ")$"
        out = F.when(
            host_col.endswith("." + suf),
            F.regexp_extract(host_col, pat, 1),
        ).otherwise(out)
    return out


def duck_registered_domain(host_expr: str) -> str:
    out = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
    for suf in SPLIT_SUFFIXES:
        esc = suf.replace(".", "\\.")
        out = (
            f"CASE WHEN suffix({host_expr}, '.{suf}') "
            f"THEN regexp_extract({host_expr}, '([^.]+\\.{esc})$', 1) "
            f"ELSE {out} END"
        )
    return out


def holdout_split_report(docs: DataFrame) -> DataFrame:
    """Per-document split assignment: (doc_id, registered_domain,
    split). The bucket is md5 of the registered domain — every page
    of a domain lands in the same split by construction, re-runs and
    both engines agree bit-for-bit, and adding documents never moves
    an existing domain between splits (stability under corpus
    growth, which a modulo over a running row count would not give)."""
    docs = docs.select("doc_id", synth_url().alias("url"))
    dom = registered_domain(host_of())
    bucket = hash_bucket("registered_domain", SPLIT_BUCKETS)
    return (
        docs.select("doc_id", dom.alias("registered_domain"))
        .select(
            "doc_id",
            "registered_domain",
            F.when(bucket < SPLIT_TRAIN_LT, F.lit("train"))
            .when(bucket < SPLIT_VALID_LT, F.lit("valid"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


def duck_holdout_split_sql(source: str = "documents") -> str:
    dom = duck_registered_domain(
        f"regexp_extract({DUCK_SYNTH_URL}, '{HOST_REGEX}', 1)"
    )
    bucket = duck_hash_bucket("registered_domain", SPLIT_BUCKETS)
    return f"""
WITH assigned AS (
  SELECT doc_id, {dom} AS registered_domain
  FROM {source}
)
SELECT doc_id,
       registered_domain,
       CASE WHEN {bucket} < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN {bucket} < {SPLIT_VALID_LT} THEN 'valid'
            ELSE 'test' END AS split
FROM assigned
"""


# -------------------------- weighted priority sampling (A-ES / A-ExpJ)
#
# Efraimidis-Spirakis: draw u ~ U(0,1) per item, rank by u^(1/w) and
# keep the top k — a one-pass, merge-friendly weighted sample without
# replacement where inclusion probability tracks weight. The
# distributed shape is the whole point: each partition keeps its own
# top-k, the driver merges k-sized heaps (Spark's TakeOrdered), no
# global sort, no shuffle of the corpus. u comes from the repo's
# 60-bit md5 hash so the "random" draw is reproducible across
# re-runs, partitionings and engines; ranking uses the monotone
# equivalent ln(u)/w (double) — adjacent priorities of distinct
# hashes differ by far more than one ulp, so both engines select the
# same k rows even though libm ulps may differ.

WEIGHTED_SAMPLE_K = 50


def weighted_priority_sample(
    docs: DataFrame, k: int = WEIGHTED_SAMPLE_K
) -> DataFrame:
    """Top-k weighted sample of documents with weight =
    whitespace-token count: (doc_id, weight, priority_r6).
    priority_r6 is ln(u)/w rounded to 6 places — reported so the
    selection is auditable, rounded so the engines hash-match."""
    scored = docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").alias("weight"),
        F.expr(
            "ln((cast(conv(substring(md5(cast(doc_id as string)),"
            " 1, 15), 16, 10) as double) + 0.5) / 1152921504606846976.0)"
            " / size(split(text, ' '))"
        ).alias("priority"),
    )
    return (
        scored.orderBy(F.desc("priority"), "doc_id")
        .limit(k)
        .select(
            "doc_id", "weight",
            F.round("priority", 6).alias("priority_r6"),
        )
    )


def duck_weighted_sample_sql(
    source: str = "documents", k: int = WEIGHTED_SAMPLE_K
) -> str:
    """DuckDB twin (same hash draw, same rank)."""
    return f"""
WITH scored AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS weight,
         ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) + 0.5) / 1152921504606846976.0)
           / len(string_split(text, ' ')) AS priority
  FROM {source}
)
SELECT doc_id, weight, round(priority, 6) AS priority_r6
FROM scored
ORDER BY priority DESC, doc_id
LIMIT {k}
"""
