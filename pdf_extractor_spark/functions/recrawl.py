"""Recrawl scheduling from observed change rates.

A recurring crawl cannot refetch 10^12 pages every cycle — it ranks
pages by how likely they are to have changed since their last fetch.
The classic estimator (Cho & Garcia-Molina 2003, "Estimating
Frequency of Change") models page changes as a Poisson process and
estimates the rate from n revisits of which X showed a change:

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5))

(the +0.5 terms are the paper's bias correction, keeping the
estimator finite at X = n).  lambda_hat is a rate PER REVISIT
INTERVAL; a page's staleness probability after ``age`` intervals is
``1 - exp(-lambda_hat * age)``, and the scheduler tiers pages by
that probability.

Engine-twin discipline (the repo rule: no cross-engine
transcendentals — Java's and C's ``ln``/``exp`` can disagree in the
last ulp): the estimator's domain here is tiny — n in 4..8, X in
0..n — so ``lambda_hat`` is computed ONCE in Python, scaled to
integer micro-units, and inlined as identical CASE literals in both
engines.  The tier test ``P(stale) > theta`` is rewritten exactly as
``lambda_e6 * age_ms > -ln(1 - theta) * 1e9`` — an INTEGER comparison
against frozen thresholds, so both engines compare bit-identical
bigints and no float ever crosses an engine boundary.

Fixture arithmetic (closed-form in both engines): each doc carries
``n_obs = 4 + doc_id % 5`` revisit observations of which
``n_changed = (doc_id * 13) % (n_obs + 1)`` showed change, and its
last fetch was ``age_ms = (doc_id * 97) % 10000`` milli-intervals
ago (0..10 revisit intervals, so all three tiers are populated).

Scale shape (100 TB contract): a pure narrow map — zero exchanges,
zero UDFs; the CASE lookup is whole-stage-codegen'd per row.  The
real-data variant reads (n_obs, n_changed, age) columns from the
fetch-history table instead of the fixture arithmetic; the estimator
table stays a broadcastable literal because its domain is bounded by
the revisit-count cap a scheduler enforces anyway.

No reference counterpart (single-document extractor) — crawl-ops
layer from the task brief's web-scale axis.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

N_OBS_BASE = 4
N_OBS_SPAN = 5          # n_obs in 4..8
AGE_MULT = 97
AGE_MOD = 10_000

# -ln(1 - theta) * 1e9, frozen (math.log evaluated once, below);
# e9 because stale = lam_e6 (1e-6 units) * age_ms (1e-3 intervals)
HOT_THETA = 0.8
WARM_THETA = 0.3
HOT_E9 = round(-math.log(1 - HOT_THETA) * 1e9)    # 1_609_437_912
WARM_E9 = round(-math.log(1 - WARM_THETA) * 1e9)  # 356_674_944


def lambda_e6(n_obs: int, n_changed: int) -> int:
    """Cho-Garcia-Molina rate estimate in integer micro-units."""
    return round(
        -math.log((n_obs - n_changed + 0.5) / (n_obs + 0.5)) * 1e6
    )


def _lam_case() -> str:
    """CASE over the packed (n_obs, n_changed) key — dialect-neutral
    SQL shared verbatim by both engines."""
    arms = " ".join(
        f"WHEN {n * 16 + x} THEN {lambda_e6(n, x)}"
        for n in range(N_OBS_BASE, N_OBS_BASE + N_OBS_SPAN)
        for x in range(n + 1)
    )
    return f"CASE n_obs * 16 + n_changed {arms} ELSE -1 END"


_TIER_SQL = (
    f"CASE WHEN stale_e9 > {HOT_E9} THEN 'hot' "
    f"WHEN stale_e9 > {WARM_E9} THEN 'warm' "
    "ELSE 'cold' END"
)


def recrawl_schedule(docs: DataFrame) -> DataFrame:
    """(doc_id, n_obs, n_changed, lam_e6, age_ms, stale_e9, tier) —
    the refetch plan: 'hot' pages are overdue (P(changed) > 0.8),
    'warm' are candidates (> 0.3), 'cold' can wait."""
    base = docs.select(
        "doc_id",
        F.expr(f"cast({N_OBS_BASE} + pmod(doc_id, {N_OBS_SPAN}) "
               "as int)").alias("n_obs"),
    ).select(
        "doc_id", "n_obs",
        F.expr("cast(pmod(doc_id * 13, n_obs + 1) as int)")
        .alias("n_changed"),
        F.expr(f"cast(pmod(doc_id * {AGE_MULT}, {AGE_MOD}) as int)")
        .alias("age_ms"),
    )
    return base.select(
        "doc_id", "n_obs", "n_changed",
        # bigint: lam_e6 * age_ms peaks near 2.9e10, past int32
        F.expr(_lam_case()).cast("bigint").alias("lam_e6"),
        "age_ms",
    ).select(
        "doc_id", "n_obs", "n_changed", "lam_e6", "age_ms",
        F.expr("lam_e6 * age_ms").alias("stale_e9"),
    ).select(
        "*", F.expr(_TIER_SQL).alias("tier"),
    )


def duck_recrawl_sql(source: str = "documents") -> str:
    """DuckDB twin — same frozen estimator literals, same integer
    threshold compare."""
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST({N_OBS_BASE} + doc_id % {N_OBS_SPAN} AS INT) AS n_obs,
         CAST((doc_id * {AGE_MULT}) % {AGE_MOD} AS INT) AS age_ms
  FROM {source}
),
obs AS (
  SELECT doc_id, n_obs,
         CAST((doc_id * 13) % (n_obs + 1) AS INT) AS n_changed,
         age_ms
  FROM base
),
est AS (
  SELECT doc_id, n_obs, n_changed,
         CAST({_lam_case()} AS BIGINT) AS lam_e6,
         age_ms
  FROM obs
),
scored AS (
  SELECT *, lam_e6 * age_ms AS stale_e9 FROM est
)
SELECT doc_id, n_obs, n_changed, lam_e6, age_ms, stale_e9,
       {_TIER_SQL} AS tier
FROM scored
"""
