"""Max-min fair crawl budget allocation (water-filling).

Above the per-host politeness cap sits a GLOBAL constraint: a fetch
fleet has B slots per cycle, and hosts' demands (admitted frontier
candidates) always exceed it at web scale.  Allocating
proportionally starves small hosts; allocating first-come floods big
ones.  The classic answer is max-min fairness via water-filling:
raise one common level L until the budget is exhausted, giving every
host ``min(demand, L)`` — small hosts are fully satisfied, big hosts
are capped at the level, and no host can gain without a
smaller-demand host losing.

Integer water-filling, deterministically (both engines, closed
form):

1. sort hosts by (demand, host); let ``P_k`` = prefix demand sum and
   ``k`` = rank.  For each row the candidate level is
   ``L_k = (B - (P_k - d_k)) div (n - k + 1)`` — the level reached if
   every smaller-demand host is fully satisfied and the remaining
   ``n-k+1`` hosts share what's left;
2. the TRUE level is ``max(L_k)`` over rows where the candidate is
   consistent (``L_k < d_k``: this host is genuinely capped).  When
   no row qualifies the budget covers total demand and every host
   gets its full demand;
3. base allocation ``min(d, L)`` spends ``sum(min(d, L)) ≤ B``; the
   integer remainder ``R`` hands one extra slot to the first ``R``
   capped hosts ordered by host id (deterministic tie-break, so the
   oracle agrees row for row).

Demand here = admitted candidates per host from the frontier's own
verdict frame, CEILED at the politeness cap ``POLITENESS_K`` — a
grant above what the per-host window downstream can consume in one
cycle would strand budget (slots charged globally but unusable) —
so the global and per-host constraints compose.  Budget ``B`` is a
module constant at fixture scale and a parameter in production.

``capped`` in the output means the host did NOT receive its full
(ceiled) demand — computed from the FINAL allocation, after the
remainder hand-out, so a host topped up to its demand by a remainder
slot reports capped = false.

Scale shape (100 TB contract): rows are (host, demand) — one per
host, orders of magnitude fewer than candidates.  One sort-window
over hosts computes ranks and prefix sums; the level and remainder
are two scalar aggregates broadcast back (the 1-row crossJoin idiom
the catalog already pins).  Nothing here touches candidate-level
data, let alone text.

No reference counterpart — crawl capacity planning from the task
brief's web-scale axis (max-min fairness per RFC 970's precedent and
the classic water-filling construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .frontier import POLITENESS_K, frontier_batch

BUDGET = 40  # global fetch slots per cycle at fixture scale


def fair_allocation(demands: list[tuple[str, int]],
                    budget: int = BUDGET) -> dict[str, int]:
    """Python reference of the same integer water-filling (tests)."""
    if not demands:
        return {}
    rows = sorted(demands, key=lambda t: (t[1], t[0]))
    n = len(rows)
    total = sum(d for _, d in rows)
    if total <= budget:
        return dict(demands)
    level = 0
    prefix = 0
    for k, (_, d) in enumerate(rows, start=1):
        cand = (budget - prefix) // (n - k + 1)
        if cand < d:
            level = max(level, cand)
        prefix += d
    base = {h: min(d, level) for h, d in demands}
    rem = budget - sum(base.values())
    for h in sorted(h for h, d in demands if d > level):
        if rem <= 0:
            break
        base[h] += 1
        rem -= 1
    return base


def crawl_budget_report(docs: DataFrame,
                        budget: int = BUDGET) -> DataFrame:
    """(host, demand, alloc, capped) — the cycle's fair allocation
    over the frontier's admitted per-host demand."""
    demand = (
        frontier_batch(docs)
        .where("rk != -1")
        .select(F.expr("split(url, '/')[0]").alias("host"))
        .groupBy("host")
        .agg(F.expr(
            f"cast(least(count(*), {POLITENESS_K}) as int)"
        ).alias("demand"))
    )
    w = Window.orderBy("demand", "host")
    ranked = demand.select(
        "host", "demand",
        F.row_number().over(w).alias("k"),
        F.sum("demand").over(w).alias("pk"),
    )
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.sum("demand").alias("total"),
    )
    lvl = (
        ranked.crossJoin(F.broadcast(stats))
        .select(F.expr(
            f"CASE WHEN ({budget} - (pk - demand)) div (n - k + 1)"
            f" < demand THEN ({budget} - (pk - demand))"
            " div (n - k + 1) ELSE -1 END"
        ).alias("cand"))
        .agg(F.max("cand").alias("level"))
    )
    base = (
        ranked.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(lvl))
        .select(
            "host", "demand", "total", "level",
            F.expr(f"CASE WHEN total <= {budget} THEN demand "
                   "ELSE least(demand, level) END").alias("base"),
        )
    )
    spent = base.agg(F.sum("base").alias("spent"))
    return (
        base.crossJoin(F.broadcast(spent))
        .select(
            "host", "demand", "base",
            F.expr(f"{budget} - spent").alias("rem"),
            # a host is capped only when the budget is actually
            # over-subscribed — with total <= budget the sentinel
            # level -1 must not mark anyone capped or hand out
            # remainder slots beyond demand
            F.expr(f"total > {budget} AND demand > level")
            .alias("capped"),
        )
        .select(
            "host", "demand", "base", "rem", "capped",
            F.when(
                F.col("capped"),
                F.row_number().over(
                    Window.partitionBy("capped").orderBy("host")
                ),
            ).otherwise(F.lit(0)).alias("cap_rank"),
        )
        .select(
            "host", "demand",
            F.expr(
                "cast(base + CASE WHEN cap_rank > 0 AND"
                " cap_rank <= rem THEN 1 ELSE 0 END as int)"
            ).alias("alloc"),
        )
        # capped = final allocation short of demand (remainder slots
        # can top a level-adjacent host up to its full demand)
        .select(
            "host", "demand", "alloc",
            (F.col("alloc") < F.col("demand")).alias("capped"),
        )
    )


def duck_budget_sql(source: str = "documents",
                    budget: int = BUDGET) -> str:
    """DuckDB twin over the frontier subquery — same rank/prefix
    window, same integer level identity, same remainder hand-out."""
    from .frontier import POLITENESS_K, duck_frontier_sql

    return f"""
WITH demand AS (
  SELECT string_split(url, '/')[1] AS host,
         CAST(least(count(*), {POLITENESS_K}) AS INT) AS demand
  FROM ({duck_frontier_sql(source)}) f
  WHERE rk != -1
  GROUP BY 1
),
ranked AS (
  SELECT host, demand,
         row_number() OVER (ORDER BY demand, host) AS k,
         sum(demand) OVER (ORDER BY demand, host
                           ROWS UNBOUNDED PRECEDING) AS pk,
         count(*) OVER () AS n,
         sum(demand) OVER () AS total
  FROM demand
),
lvl AS (
  SELECT max(CASE WHEN ({budget} - (pk - demand)) // (n - k + 1)
                       < demand
              THEN ({budget} - (pk - demand)) // (n - k + 1)
              ELSE -1 END) AS level
  FROM ranked
),
based AS (
  SELECT r.host, r.demand, r.total, l.level,
         CASE WHEN r.total <= {budget} THEN r.demand
              ELSE least(r.demand, l.level) END AS base
  FROM ranked r CROSS JOIN lvl l
),
spent AS (SELECT sum(base) AS spent FROM based),
capped AS (
  SELECT b.*, s.spent,
         (b.total > {budget} AND b.demand > b.level) AS is_capped
  FROM based b CROSS JOIN spent s
),
ranked_cap AS (
  SELECT *,
         CASE WHEN is_capped
              THEN row_number() OVER (
                     PARTITION BY is_capped ORDER BY host)
              ELSE 0 END AS cap_rank
  FROM capped
)
SELECT host, demand, alloc, (alloc < demand) AS capped
FROM (
  SELECT host, demand,
         CAST(base + CASE WHEN cap_rank > 0
                           AND cap_rank <= {budget} - spent
                      THEN 1 ELSE 0 END AS INT) AS alloc
  FROM ranked_cap
)
"""
