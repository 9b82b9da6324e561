"""Tests for the recipe ablation matrix (functions/recipe.py
recipe_whatif): algebraic invariants every ablation set must obey,
and the single-pass plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.functions.recipe import (
    RECIPE_VARIANTS,
    recipe_whatif,
)

GOOD = (
    "The committee published its annual report on Tuesday. "
    "Members discussed the budget and approved three new projects. "
) * 6


def _docs(spark):
    rows = [
        (1, "en", GOOD),
        (2, "en", GOOD + "extra tail words here."),
        (3, "en", GOOD),          # exact duplicate of 1 -> not canonical
        (4, "en", "short"),        # fails gopher length rules
        (5, "en", GOOD.replace(".", " { } .")),  # braces: c4 drop
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


class TestWhatIf:
    def test_invariants(self, spark):
        rep = {r.recipe: r for r in recipe_whatif(_docs(spark)).collect()}
        assert set(rep) == {v[0] for v in RECIPE_VARIANTS}
        n = rep["none"].n_docs
        # 'none' keeps everything
        assert rep["none"].n_kept == n
        assert rep["none"].kept_bp == 10000
        # monotone: full recipe keeps a subset of every ablation
        for name in ("no_gopher", "no_c4", "no_model", "no_dedup",
                     "dedup_only", "none"):
            assert rep["full"].n_kept <= rep[name].n_kept
            assert rep["full"].kept_tokens <= rep[name].kept_tokens
        # the planted duplicate must cost exactly one doc vs no_dedup
        assert rep["no_dedup"].n_kept >= rep["full"].n_kept
        # every variant aggregates over the same corpus
        assert all(r.n_docs == n for r in rep.values())

    def test_single_pass_plan(self, spark):
        plan = (
            recipe_whatif(_docs(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the variant table joins broadcast; the ablation never adds
        # a per-variant shuffle of documents
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan
