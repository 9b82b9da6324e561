"""Water-filling crawl budget: the integer level identity vs brute
force, max-min fairness properties, and the engine stage."""

from __future__ import annotations

import random

from pdf_extractor_spark.functions.budget import (
    BUDGET,
    crawl_budget_report,
    fair_allocation,
)

SF = "/root/testdata/sf0.001"


def _brute(demands: list[tuple[str, int]],
           budget: int) -> dict[str, int]:
    """Literal water-filling: raise the level one unit at a time."""
    if not demands:
        return {}
    total = sum(d for _, d in demands)
    if total <= budget:
        return dict(demands)
    level = 0
    while sum(min(d, level + 1) for _, d in demands) <= budget:
        level += 1
    base = {h: min(d, level) for h, d in demands}
    rem = budget - sum(base.values())
    for h in sorted(h for h, d in demands if d > level):
        if rem <= 0:
            break
        base[h] += 1
        rem -= 1
    return base


class TestReference:
    def test_closed_form_equals_brute_force(self):
        rng = random.Random(7)
        for trial in range(200):
            n = rng.randint(1, 12)
            demands = [(f"h{i}", rng.randint(0, 30))
                       for i in range(n)]
            budget = rng.randint(0, 80)
            assert fair_allocation(demands, budget) == \
                _brute(demands, budget), (demands, budget)

    def test_properties(self):
        demands = [("a", 50), ("b", 3), ("c", 12), ("d", 1)]
        alloc = fair_allocation(demands, 20)
        assert sum(alloc.values()) == 20          # budget exhausted
        assert alloc["b"] == 3 and alloc["d"] == 1  # small: satisfied
        # max-min: no capped host is 2+ slots behind another capped
        capped = [alloc[h] for h, d in demands if alloc[h] < d]
        assert max(capped) - min(capped) <= 1

    def test_under_subscription_returns_demands(self):
        demands = [("a", 5), ("b", 2)]
        assert fair_allocation(demands, 40) == dict(demands)


class TestSparkStage:
    def test_matches_reference_on_frontier_demand(self, spark):
        from pdf_extractor_spark.functions.frontier import (
            POLITENESS_K,
            frontier_batch,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        raw: dict[str, int] = {}
        for r in frontier_batch(docs).collect():
            if r.rk != -1:
                host = r.url.split("/")[0]
                raw[host] = raw.get(host, 0) + 1
        # demand composes with the politeness cap: grants above what
        # the per-host window can consume would strand budget
        demand = {h: min(d, POLITENESS_K) for h, d in raw.items()}
        expect = fair_allocation(sorted(demand.items()), BUDGET)
        got = {r.host: r for r in crawl_budget_report(docs).collect()}
        assert {h: r.alloc for h, r in got.items()} == expect
        assert sum(r.alloc for r in got.values()) == \
            min(BUDGET, sum(demand.values()))
        for h, r in got.items():
            assert r.demand == demand[h]
            # capped == final allocation short of (ceiled) demand —
            # exact, two-sided
            assert r.capped == (r.alloc < demand[h]), h

    def test_plan_no_cartesian_on_data(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_crawl_budget"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the only nested-loop joins are against broadcast 1-row
        # aggregates (the pinned catalog idiom); no data×data product
        assert "CartesianProduct" not in plan
        for schema in plan.split("ReadSchema: struct<")[1:]:
            assert "text" not in schema.split(">")[0]
