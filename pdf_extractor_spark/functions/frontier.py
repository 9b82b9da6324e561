"""Crawl-frontier batch selection — the discovery-side capstone.

A recurring crawl turns the last snapshot into the next fetch batch:
harvest outlinks, deduplicate candidates, drop URLs already crawled,
drop URLs robots.txt forbids, rank what remains by a popularity
prior, and cap per-host picks so no origin is hammered.  This
operator composes those five stages into ONE auditable frame — every
candidate appears in the output with its seen/allowed/rank/selected
verdicts, so the oracle gates the whole admission pipeline, not just
the survivors.

Stage shapes (the 100 TB contract):

- **Candidate generation** is a narrow map + explode: each document
  proposes 3 outlink candidate ids (fixed-width bigints — URL strings
  are derived AFTER dedup, so the wide exchange never carries text).
- **Candidate dedup** is one groupBy(cand_id) count/min — partially
  aggregable; the proposer count doubles as the URL in-degree used
  for ranking (in-degree prioritization, the classic frontier
  heuristic).
- **Seen-set** is a LeftAnti-style broadcast join against the
  previous snapshot's ids.  At bench scale the exact set broadcasts;
  at 10^12 URLs the exact set cannot ship — the drop-in replacement
  is the Bloom probe in :mod:`.bloom` (one broadcast map row,
  scan-local membership), accepting its documented false-positive
  semantics.  The catalog entry keeps the exact join so the oracle
  is exact; the scale swap is a one-line substitution.
- **Robots admission** reuses :func:`.robots.profile_rules` — the
  parsed REP rule table broadcasts, the LIKE residual rides on the
  broadcast join, and the RFC 9309 longest-match/allow-wins verdict
  folds into one integer MAX (same construction as
  ``corpus_robots_filter``).
- **Politeness cap** is ONE window over all verdict rows:
  ``row_number() OVER (PARTITION BY host ORDER BY admitted DESC,
  in-degree DESC, cand_id)``.  Sorting admitted rows first makes
  their row numbers 1..m exactly the admitted-only ranks, so no
  separate ranked frame (and no self-join re-deriving the verdict
  subplan — which would double every corpus scan) is needed; rejected
  rows report rank -1.  The window exchange carries fixed-width
  verdict rows, partitioned by host — hosts are orders of magnitude
  fewer than candidates, and a pathological single-host candidate
  pile is exactly what the cap bounds.

No reference counterpart (the reference is a single-document
extractor) — this is the web-scale discovery layer from the task
brief, composing robots/bloom/linkgraph machinery already gated by
their own catalog rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .robots import (
    DUCK_HOST_T as _HOST_T,
    DUCK_PATH_T as _PATH_T,
    DUCK_PROFILE_T as _PROFILE_T,
    SPARK_HOST_T as _SPARK_HOST_T,
    SPARK_PATH_T as _SPARK_PATH_T,
    SPARK_PROFILE_T as _SPARK_PROFILE_T,
    profile_delays,
    profile_rules,
)

ID_SPACE = 2_000        # candidate-id space (dense at every SF)
PREV_MULT = 53          # previous-snapshot id arithmetic
CAND_PRIMES = (131, 197, 277)  # same family as linkgraph edges
POLITENESS_K = 3        # max picks per host per batch

# candidate URL family = the robots fixture family instantiated over
# cand_id (robots.py owns the {c} templates), so profile A/B rules
# genuinely admit/reject shapes and the two oracles cannot drift


def _cand_expr() -> str:
    parts = ", ".join(
        f"pmod(doc_id * {p} + {j}, {ID_SPACE})"
        for j, p in enumerate(CAND_PRIMES)
    )
    return f"array({parts})"


def _delay_case(dialect_profile: str) -> str:
    """CASE expr mapping a profile to its parsed Crawl-delay seconds
    — built from :func:`profile_delays` (the REAL robots parser) at
    plan-build time, so both engines inline identical literals."""
    arms = " ".join(
        f"WHEN {p} THEN {d}"
        for p, d in sorted(profile_delays().items())
    )
    return f"CASE {dialect_profile} {arms} ELSE 1 END"


def frontier_batch(docs: DataFrame) -> DataFrame:
    """(cand_id, url, n_proposers, seen, allowed, rk, selected,
    fetch_offset_s) for every deduplicated candidate — the selected
    rows are the next fetch batch, scheduled ``(rank-1) ×
    Crawl-delay(host)`` seconds apart so no origin is fetched faster
    than its robots.txt allows; the rest carry their rejection
    verdicts."""
    spark = docs.sparkSession

    cand = (
        docs.select(
            "doc_id",
            F.explode(F.expr(_cand_expr())).alias("cand_id"),
        )
        .groupBy("cand_id")
        .agg(F.count("*").alias("n_proposers"))
    )

    prev = (
        docs.where(F.expr("pmod(doc_id, 3) = 0"))
        .select(F.expr(
            f"pmod(doc_id * {PREV_MULT}, {ID_SPACE})"
        ).alias("prev_id"))
        .distinct()
    )
    feat = (
        cand.join(
            F.broadcast(prev),
            cand.cand_id == prev.prev_id,
            "left",
        )
        .select(
            "cand_id", "n_proposers",
            F.col("prev_id").isNotNull().alias("seen"),
            F.expr(_SPARK_HOST_T.format(c="cand_id")).alias("host"),
            F.expr(_SPARK_PROFILE_T.format(c="cand_id")).alias("profile"),
            F.expr(_SPARK_PATH_T.format(c="cand_id")).alias("path"),
        )
    )

    rules = spark.createDataFrame(
        profile_rules(), "profile int, like_pattern string, priority int"
    )
    verdict = (
        feat.join(
            F.broadcast(rules),
            on=[feat.profile == rules.profile,
                F.expr("path like like_pattern")],
            how="left",
        )
        .groupBy("cand_id", "n_proposers", "seen", "host", "path")
        .agg(F.max("priority").alias("best"))
        .select(
            "cand_id", "n_proposers", "seen", "host", "path",
            F.coalesce(
                F.expr("pmod(best, 2) = 1"), F.lit(True)
            ).alias("allowed"),
        )
    )

    w = Window.partitionBy("host").orderBy(
        F.expr("NOT seen AND allowed").desc(),
        F.col("n_proposers").desc(),
        F.col("cand_id"),
    )
    return verdict.select(
        "cand_id",
        F.concat(F.col("host"), F.col("path")).alias("url"),
        "n_proposers", "seen", "allowed",
        F.expr("NOT seen AND allowed").alias("admitted"),
        F.row_number().over(w).alias("rn"),
    ).select(
        "cand_id", "url", "n_proposers", "seen", "allowed",
        F.when(F.col("admitted"), F.col("rn"))
        .otherwise(F.lit(-1)).alias("rk"),
        (F.col("admitted") & (F.col("rn") <= POLITENESS_K))
        .alias("selected"),
        F.when(
            F.col("admitted") & (F.col("rn") <= POLITENESS_K),
            (F.col("rn") - 1) * F.expr(
                _delay_case(_SPARK_PROFILE_T.format(c="cand_id"))
            ),
        ).otherwise(F.lit(-1)).alias("fetch_offset_s"),
    )


def duck_frontier_sql(source: str = "documents") -> str:
    """DuckDB twin — same arithmetic, same parsed robots rule table,
    same window ordering."""
    rule_rows = ", ".join(
        "({}, '{}', {})".format(p, lp.replace("'", "''"), pr)
        for p, lp, pr in profile_rules()
    )
    cand_union = " UNION ALL ".join(
        f"SELECT (doc_id * {p} + {j}) % {ID_SPACE} AS cand_id "
        f"FROM {source}"
        for j, p in enumerate(CAND_PRIMES)
    )
    host = _HOST_T.format(c="cand_id")
    profile = _PROFILE_T.format(c="cand_id")
    path = _PATH_T.format(c="cand_id")
    delay_case = _delay_case(profile)
    return f"""
WITH rules(profile, like_pattern, priority) AS (VALUES {rule_rows}),
cand_raw AS ({cand_union}),
cand AS (
  SELECT cand_id, count(*) AS n_proposers
  FROM cand_raw GROUP BY 1
),
prev AS (
  SELECT DISTINCT (doc_id * {PREV_MULT}) % {ID_SPACE} AS prev_id
  FROM {source} WHERE doc_id % 3 = 0
),
feat AS (
  SELECT c.cand_id, c.n_proposers,
         (p.prev_id IS NOT NULL) AS seen,
         {host} AS host, {profile} AS profile, {path} AS path
  FROM cand c LEFT JOIN prev p ON c.cand_id = p.prev_id
),
verdict AS (
  SELECT f.cand_id, f.n_proposers, f.seen, f.host, f.path,
         coalesce(max(r.priority) % 2 = 1, TRUE) AS allowed
  FROM feat f
  LEFT JOIN rules r
    ON f.profile = r.profile
   AND f.path LIKE r.like_pattern ESCAPE '\\'
  GROUP BY 1, 2, 3, 4, 5
),
numbered AS (
  SELECT *, (NOT seen AND allowed) AS admitted,
         row_number() OVER (
           PARTITION BY host
           ORDER BY (NOT seen AND allowed) DESC,
                    n_proposers DESC, cand_id
         ) AS rn
  FROM verdict
)
SELECT cand_id, host || path AS url, n_proposers, seen, allowed,
       CASE WHEN admitted THEN rn ELSE -1 END AS rk,
       (admitted AND rn <= {POLITENESS_K}) AS selected,
       CASE WHEN admitted AND rn <= {POLITENESS_K}
            THEN (rn - 1) * ({delay_case})
            ELSE -1 END AS fetch_offset_s
FROM numbered
"""
