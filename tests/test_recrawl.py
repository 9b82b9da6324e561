"""Recrawl scheduling: frozen Cho-Garcia-Molina estimator table,
integer tier thresholds, and the zero-exchange plan."""

from __future__ import annotations

import math

from pdf_extractor_spark.functions.recrawl import (
    AGE_MOD,
    AGE_MULT,
    HOT_THETA,
    N_OBS_BASE,
    N_OBS_SPAN,
    WARM_THETA,
    lambda_e6,
    recrawl_schedule,
)

SF = "/root/testdata/sf0.001"


class TestEstimator:
    def test_matches_paper_formula(self):
        for n in range(N_OBS_BASE, N_OBS_BASE + N_OBS_SPAN):
            for x in range(n + 1):
                lam = -math.log((n - x + 0.5) / (n + 0.5))
                assert lambda_e6(n, x) == round(lam * 1e6)

    def test_zero_changes_zero_rate_and_monotone(self):
        for n in range(N_OBS_BASE, N_OBS_BASE + N_OBS_SPAN):
            assert lambda_e6(n, 0) == 0
            lams = [lambda_e6(n, x) for x in range(n + 1)]
            assert lams == sorted(lams) and lams[-1] > 0

    def test_integer_threshold_equals_probability_test(self):
        # lam_e6 * age_ms > -ln(1-theta)*1e9 ⟺ 1-exp(-lam*age) > theta
        # (up to the frozen quantization, far from any fixture
        # boundary)
        from pdf_extractor_spark.functions.recrawl import HOT_E9, WARM_E9

        for n in (4, 8):
            for x in (1, n):
                for age_ms in (1, 500, 9999):
                    lam = lambda_e6(n, x) / 1e6
                    p = 1 - math.exp(-lam * age_ms / 1000)
                    stale = lambda_e6(n, x) * age_ms
                    if abs(p - HOT_THETA) > 1e-4:
                        assert (stale > HOT_E9) == (p > HOT_THETA)
                    if abs(p - WARM_THETA) > 1e-4:
                        assert (stale > WARM_E9) == (p > WARM_THETA)


class TestSparkStage:
    def test_rows_and_tiers(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = recrawl_schedule(docs).collect()
        assert len(rows) == docs.count()
        tiers = {r.tier for r in rows}
        assert tiers == {"hot", "warm", "cold"}
        for r in rows[:50]:
            n = N_OBS_BASE + r.doc_id % N_OBS_SPAN
            x = (r.doc_id * 13) % (n + 1)
            assert (r.n_obs, r.n_changed) == (n, x)
            assert r.lam_e6 == lambda_e6(n, x)
            assert r.age_ms == (r.doc_id * AGE_MULT) % AGE_MOD
            assert r.stale_e9 == r.lam_e6 * r.age_ms

    def test_plan_is_a_pure_narrow_map(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_recrawl_schedule"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.lstrip().startswith("*(1)")  # whole-stage codegen
