"""Tests for the distributed sketch operators: HyperLogLog distinct
counting and Count-Min heavy hitters (functions/sketches.py).

The cross-engine bit-identity is covered by the catalog crosscheck;
here we pin the mathematical contracts: HLL error within its design
band on known cardinalities (both the linear-counting and the raw
regimes), CMS never underestimates, and both sketches merge the way
their 100 TB usage requires (register max / counter add)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pdf_extractor_spark.functions.sketches import (
    HLL_M,
    cms_heavy_hitters,
    duck_cms_heavy_hitters_sql,
    duck_hll_distinct_sql,
    hll_distinct_report,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _vocab_doc(lang: str, n: int, tag: str) -> tuple:
    # n distinct single-use tokens — the document IS the vocabulary
    did = sum(ord(c) for c in lang + tag)
    return (did, lang, " ".join(f"{tag}{i:05d}" for i in range(n)))


class TestHLL:
    def test_small_cardinality_linear_counting(self, spark):
        # 40 distinct tokens: E_raw <= 2.5m, zero registers abound —
        # the linear-counting branch must engage and land within 15 %
        docs = _docs(spark, [_vocab_doc("en", 40, "w")])
        row = hll_distinct_report(docs).collect()[0]
        assert row.n_exact == 40
        assert abs(row.hll_estimate - 40) / 40 < 0.15

    def test_mid_cardinality_raw_regime(self, spark):
        # 5000 distinct tokens >> 2.5m = 640: raw HLL estimate; the
        # design error is 1.04/sqrt(256) ~ 6.5 %, assert within 3 sigma
        docs = _docs(spark, [_vocab_doc("en", 2500, "a"),
                             _vocab_doc("en", 2500, "b")])
        row = hll_distinct_report(docs).collect()[0]
        assert row.n_exact == 5000
        assert abs(row.hll_estimate - 5000) / 5000 < 0.20

    def test_groups_independent(self, spark):
        # per-lang registers must not bleed into each other
        docs = _docs(spark, [_vocab_doc("en", 1000, "e"),
                             _vocab_doc("de", 50, "d")])
        rows = {r.lang: r for r in hll_distinct_report(docs).collect()}
        assert rows["en"].n_exact == 1000
        assert rows["de"].n_exact == 50
        assert abs(rows["de"].hll_estimate - 50) / 50 < 0.15

    def test_duplicates_do_not_inflate(self, spark):
        # the same vocabulary repeated 20x must give the same sketch
        one = _vocab_doc("en", 300, "t")
        docs = _docs(spark, [one])
        docs20 = _docs(spark, [
            (i, "en", one[2]) for i in range(20)
        ])
        e1 = hll_distinct_report(docs).collect()[0].hll_estimate
        e20 = hll_distinct_report(docs20).collect()[0].hll_estimate
        assert e1 == e20

    def test_merge_is_register_max(self, spark):
        # sketch(A ∪ B) == sketch built from max-merged registers:
        # implied by processing the union in one pass — pin that the
        # union estimate >= each part's estimate (monotone under merge)
        a = _vocab_doc("en", 800, "a")
        b = _vocab_doc("en", 800, "b")
        ea = hll_distinct_report(_docs(spark, [a])).collect()[0]
        eb = hll_distinct_report(_docs(spark, [b])).collect()[0]
        eu = hll_distinct_report(_docs(spark, [a, b])).collect()[0]
        assert eu.hll_estimate >= max(ea.hll_estimate, eb.hll_estimate)
        assert eu.n_exact == 1600

    def test_oracle_matches_spark(self, spark, tmp_path):
        docs = _docs(spark, [_vocab_doc("en", 700, "x"),
                             _vocab_doc("fr", 90, "y")])
        pdf = docs.toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        got = con.execute(duck_hll_distinct_sql()).fetchdf()
        want = hll_distinct_report(docs).toPandas()
        got = got.sort_values("lang").reset_index(drop=True)
        want = want.sort_values("lang").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            want, got.astype(want.dtypes.to_dict()), rtol=1e-9
        )


class TestCMS:
    def test_never_underestimates(self, spark):
        text = " ".join(
            ["hot"] * 50 + ["warm"] * 20 + [f"cold{i}" for i in range(200)]
        )
        docs = _docs(spark, [(1, "en", text)])
        rows = cms_heavy_hitters(docs, k=5).collect()
        assert rows[0].tok == "hot" and rows[0].n_exact == 50
        for r in rows:
            assert r.cms_estimate >= r.n_exact

    def test_exact_on_sparse_table(self, spark):
        # far fewer distinct tokens than d*w cells: collisions are
        # overwhelmingly unlikely, estimates should be exact
        text = " ".join(f"tok{i}" for i in range(50)) + " top top top"
        docs = _docs(spark, [(1, "en", text)])
        rows = cms_heavy_hitters(docs, k=3).collect()
        top = [r for r in rows if r.tok == "top"][0]
        assert top.n_exact == 3 and top.cms_estimate == 3

    def test_oracle_matches_spark(self, spark):
        docs = _docs(spark, [
            (1, "en", "alpha beta gamma alpha beta alpha " * 4),
            (2, "de", "delta epsilon delta " * 6),
        ])
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        got = con.execute(duck_cms_heavy_hitters_sql()).fetchdf()
        want = cms_heavy_hitters(docs).toPandas()
        cols = ["tok", "n_exact", "cms_estimate"]
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            want, got.astype(want.dtypes.to_dict())
        )


class TestPlanShape:
    def test_hll_shuffles_registers_not_tokens(self, spark):
        # the exchange after the register aggregate carries at most
        # m rows per group; assert partial aggregation exists (map-side
        # combine) and document text reaches no exchange
        docs = _docs(spark, [_vocab_doc("en", 500, "p")])
        plan = hll_distinct_report(docs)._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan
        # two-phase aggregate: partial_max / merge_max on the register
        assert "partial_max" in plan or "partial" in plan.lower()


class TestAnalyze:
    def test_one_scan_stats(self, spark):
        from pdf_extractor_spark.functions.sketches import (
            analyze_column_stats,
        )

        docs = spark.createDataFrame(
            [(i, "en" if i % 2 else None, f"s{i % 7}")
             for i in range(200)],
            "doc_id long, lang string, source string",
        )
        rows = {r.column: r for r in analyze_column_stats(docs).collect()}
        assert set(rows) == {"doc_id", "lang", "source"}
        assert rows["doc_id"].ndv_exact == 200
        assert rows["lang"].n_null == 100
        assert rows["lang"].ndv_exact == 1
        assert rows["source"].ndv_exact == 7
        assert rows["source"].min_val == "s0"
        assert rows["source"].max_val == "s6"
        # sketch estimate within 20 % of exact for every column
        for r in rows.values():
            assert abs(r.ndv_hll - r.ndv_exact) / r.ndv_exact < 0.2

    def test_single_scan_plan(self, spark):
        from pdf_extractor_spark.functions.sketches import (
            analyze_column_stats,
        )

        docs = spark.createDataFrame(
            [(i, "en", "s") for i in range(50)],
            "doc_id long, lang string, source string",
        )
        plan = (
            analyze_column_stats(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the unpivot must not multiply scans: exactly one scan of
        # the input per physical occurrence of the local relation
        assert plan.count("LocalTableScan") <= 2  # stats + hll legs
