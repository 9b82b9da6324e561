"""The composed fetch batch — discovery ∪ refetch under ONE
politeness window.

A production crawl cycle fetches two kinds of URL each round: NEW
candidates admitted by the frontier (discovery) and KNOWN pages whose
estimated change probability says they are overdue (refetch).  The
two legs compete for the same per-host politeness budget — a host's
fetch slots are a shared resource, and ranking each leg separately
would let the combined rate exceed what robots.txt allows.  This
operator composes the two stacks into one auditable plan:

- **discover leg**: :func:`frontier.frontier_batch` rows with
  ``selected`` (already seen-set- and robots-admitted), priority =
  proposer in-degree;
- **refetch leg**: :func:`recrawl.recrawl_schedule` rows in the
  ``hot`` tier (P(changed) > 0.8), priority = staleness bucket
  (``stale_e9 div 5e9`` capped at 9, so refetch urgency and discovery
  in-degree land on comparable small-integer scales);
- **URL dedup across legs**: a known hot page that other pages also
  link to surfaces in BOTH legs; fetching it twice in one cycle would
  burn two politeness slots on one target, so the union dedups by URL
  first and the refetch row wins (its presence means the page is
  KNOWN — the discover row's unseen claim is stale);
- **one window** over the union: ``row_number() OVER (PARTITION BY
  host ORDER BY prio DESC, src, fetch_id)`` — both legs' URL families
  instantiate the same ``site{(id//7)%20}.example`` host template, so
  the partition genuinely interleaves discovery and refetch rows for
  the same origin, and the per-host cap bounds their COMBINED rate.
  Selected rows are scheduled ``(rank-1) × Crawl-delay(host)``
  seconds apart via the parsed robots delay (host parity determines
  the profile: ``(id//7) % 2 ≡ host_index % 2`` because the host
  modulus 20 is even).

Like ``recipe.corpus_filter_recipe``, the DuckDB oracle is COMPOSED
from the legs' own published SQL (``duck_frontier_sql`` /
``duck_recrawl_sql`` as subqueries), so the composition cannot drift
from the parts the driver already gates.

Scale shape (100 TB contract): both legs arrive as fixed-width
verdict rows (no text); the union is columnar-cheap; the single
window exchange partitions by host exactly like the frontier's own
cap (hosts ≪ rows, and a pathological per-host pile is what the cap
bounds).  No leg is recomputed: each is one subplan, the window runs
once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .frontier import _delay_case, frontier_batch
from .recrawl import duck_recrawl_sql, recrawl_schedule
from .robots import (
    DUCK_HOST_T,
    DUCK_PATH_T,
    DUCK_PROFILE_T,
    SPARK_HOST_T,
    SPARK_PATH_T,
    SPARK_PROFILE_T,
)

BATCH_K = 3          # combined per-host fetch slots per cycle
STALE_BUCKET_DIV = 5_000_000_000  # stale_e9 → 0..9 priority bucket
STALE_BUCKET_CAP = 9

# the host index (id div 7 mod 20) determines the robots profile
# (id div 7 mod 2) because 20 is even — so the union rows can carry
# host-derived delays without re-deriving per-leg profiles; the
# profile templates are robots.py's single-source-of-truth {c} forms


def fetch_batch_plan(docs: DataFrame) -> DataFrame:
    """(src, fetch_id, url, prio, rk, selected, fetch_offset_s) — the
    cycle's combined fetch plan with per-host politeness shared
    across discovery and refetch."""
    discover = (
        frontier_batch(docs)
        .where("selected")
        .select(
            F.lit("discover").alias("src"),
            F.col("cand_id").alias("fetch_id"),
            "url",
            F.col("n_proposers").cast("int").alias("prio"),
        )
    )
    refetch = (
        recrawl_schedule(docs)
        .where("tier = 'hot'")
        .select(
            F.lit("refetch").alias("src"),
            F.col("doc_id").alias("fetch_id"),
            F.expr(
                "concat("
                + SPARK_HOST_T.format(c="doc_id") + ", "
                + SPARK_PATH_T.format(c="doc_id") + ")"
            ).alias("url"),
            F.expr(
                f"cast(least(stale_e9 div {STALE_BUCKET_DIV}, "
                f"{STALE_BUCKET_CAP}) as int)"
            ).alias("prio"),
        )
    )
    # one URL may surface in BOTH legs (a known hot page that other
    # pages also link to): fetching it twice in one cycle would burn
    # two politeness slots on one target.  Dedup by URL first —
    # refetch wins ('refetch' > 'discover' lexically), because
    # presence in the refetch leg means the page is KNOWN and the
    # discover row's unseen claim is stale.
    w_dedup = Window.partitionBy("url").orderBy(
        F.col("src").desc(), F.col("fetch_id")
    )
    u = (
        discover.unionByName(refetch)
        .withColumn("dup_rn", F.row_number().over(w_dedup))
        .where("dup_rn = 1")
        .drop("dup_rn")
        .withColumn("host", F.expr("split(url, '/')[0]"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("prio").desc(), F.col("src"), F.col("fetch_id")
    )
    delay = _delay_case(SPARK_PROFILE_T.format(c="fetch_id"))
    return (
        u.select(
            "src", "fetch_id", "url", "prio",
            F.row_number().over(w).alias("rk"),
        )
        .select(
            "src", "fetch_id", "url", "prio", "rk",
            (F.col("rk") <= BATCH_K).alias("selected"),
            F.when(
                F.col("rk") <= BATCH_K,
                (F.col("rk") - 1) * F.expr(delay),
            ).otherwise(F.lit(-1)).alias("fetch_offset_s"),
        )
    )


def duck_fetch_plan_sql(source: str = "documents") -> str:
    """Oracle composed from the legs' own SQL — the frontier and
    recrawl subqueries are the exact strings their driver rows gate."""
    from .frontier import duck_frontier_sql

    delay = _delay_case(DUCK_PROFILE_T.format(c="fetch_id"))
    url = ("{h} || {p}".format(h=DUCK_HOST_T.format(c="doc_id"),
                               p=DUCK_PATH_T.format(c="doc_id")))
    return f"""
WITH discover AS (
  SELECT 'discover' AS src, cand_id AS fetch_id, url,
         CAST(n_proposers AS INT) AS prio
  FROM ({duck_frontier_sql(source)}) f
  WHERE selected
),
refetch AS (
  SELECT 'refetch' AS src, doc_id AS fetch_id,
         {url} AS url,
         CAST(least(stale_e9 // {STALE_BUCKET_DIV},
                    {STALE_BUCKET_CAP}) AS INT) AS prio
  FROM ({duck_recrawl_sql(source)}) r
  WHERE tier = 'hot'
),
both_legs AS (
  SELECT *, row_number() OVER (
           PARTITION BY url ORDER BY src DESC, fetch_id
         ) AS dup_rn
  FROM (SELECT * FROM discover UNION ALL SELECT * FROM refetch)
),
u AS (
  SELECT src, fetch_id, url, prio,
         string_split(url, '/')[1] AS host
  FROM both_legs WHERE dup_rn = 1
),
ranked AS (
  SELECT src, fetch_id, url, prio,
         row_number() OVER (
           PARTITION BY host
           ORDER BY prio DESC, src, fetch_id
         ) AS rk
  FROM u
)
SELECT src, fetch_id, url, prio, rk,
       (rk <= {BATCH_K}) AS selected,
       CASE WHEN rk <= {BATCH_K}
            THEN (rk - 1) * ({delay})
            ELSE -1 END AS fetch_offset_s
FROM ranked
"""
