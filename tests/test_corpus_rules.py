"""Tests for the web-corpus rule batteries (Gopher A1.1 / C4 §2.2)
added in round 2 — hand-built documents exercise the rule edges that
the synthetic vocab table can't (bullets, dup lines, lorem ipsum,
braces, sentence punctuation)."""

from __future__ import annotations

import pytest

from pdf_extractor_spark.functions.textstats import (
    C4_MIN_SENTENCES,
    GOPHER_MIN_WORDS,
    c4_rules,
    gopher_rules,
)

GOOD_TEXT = (
    "the quick brown fox jumps over a lazy dog near the river bank "
    "and then walks on to find some food for the long winter that "
    "is coming soon with snow and ice on every hill and field "
    "while birds fly south in large flocks looking for warm places "
    "to stay until spring returns with flowers and green leaves"
)  # 59 words, all alpha, stopword-rich

DUP_LINES_TEXT = "alpha beta gamma\nalpha beta gamma\nalpha beta gamma\ndelta"
REPEAT_BIGRAM_TEXT = "spam ham " * 30 + "end"  # one bigram dominates
SHORT_TEXT = "tiny doc"


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        out = gopher_rules(_frame(spark, [(1, GOOD_TEXT)])).collect()[0]
        assert out.n_words >= GOPHER_MIN_WORDS
        assert out.alpha_word_frac == 1.0
        assert out.symbol_ratio == 0.0
        assert out.n_stopwords >= 2
        assert bool(out.gopher_pass)

    def test_short_doc_fails_min_words(self, spark):
        out = gopher_rules(_frame(spark, [(1, SHORT_TEXT)])).collect()[0]
        assert out.n_words == 2
        assert not bool(out.gopher_pass)

    def test_duplicate_lines_detected(self, spark):
        out = gopher_rules(
            _frame(spark, [(1, DUP_LINES_TEXT)])
        ).collect()[0]
        # 4 lines, 2 distinct -> 0.5 duplicate fraction
        assert out.dup_line_frac == 0.5
        assert not bool(out.gopher_pass)

    def test_repeated_bigram_detected(self, spark):
        out = gopher_rules(
            _frame(spark, [(1, REPEAT_BIGRAM_TEXT)])
        ).collect()[0]
        # "ham spam" and "spam ham" each ~half of all bigrams
        assert out.top_bigram_frac > 0.2
        assert not bool(out.gopher_pass)

    def test_symbol_ratio(self, spark):
        text = "# # # # " + GOOD_TEXT
        out = gopher_rules(_frame(spark, [(1, text)])).collect()[0]
        assert out.symbol_ratio > 0.05

    def test_single_word_doc_no_bigrams(self, spark):
        out = gopher_rules(_frame(spark, [(1, "solo")])).collect()[0]
        assert out.top_bigram_frac == 0.0
        assert out.n_words == 1


class TestC4Rules:
    def test_sentences_counted(self, spark):
        text = "One sentence here. Two now! Three maybe? And four."
        out = c4_rules(_frame(spark, [(1, text)])).collect()[0]
        assert out.n_sentences == 4
        assert bool(out.c4_keep)

    def test_lorem_ipsum_dropped(self, spark):
        text = "Lorem Ipsum dolor sit amet. Fine text. More text here."
        out = c4_rules(_frame(spark, [(1, text)])).collect()[0]
        assert bool(out.has_lorem)
        assert not bool(out.c4_keep)

    def test_brace_dropped(self, spark):
        text = "var x = {a: 1}. Good sentence. Another one. And more."
        out = c4_rules(_frame(spark, [(1, text)])).collect()[0]
        assert bool(out.has_brace)
        assert not bool(out.c4_keep)

    def test_javascript_flag(self, spark):
        text = (
            "Please enable javascript to view. Real content. More. Yes."
        )
        out = c4_rules(_frame(spark, [(1, text)])).collect()[0]
        assert bool(out.has_js)
        assert not bool(out.c4_keep)

    def test_too_few_sentences_dropped(self, spark):
        out = c4_rules(_frame(spark, [(1, "No terminal punct")]))
        row = out.collect()[0]
        assert row.n_sentences < C4_MIN_SENTENCES
        assert not bool(row.c4_keep)

    def test_line_fractions(self, spark):
        text = "short\na line with at least five words here.\nmid one"
        row = c4_rules(_frame(spark, [(1, text)])).collect()[0]
        assert row.ge5w_line_frac == pytest.approx(1 / 3, abs=1e-3)
        assert row.end_punct_line_frac == pytest.approx(1 / 3, abs=1e-3)


class TestBigramCost:
    def test_hand_computed_scores(self, spark):
        from pdf_extractor_spark.functions.textstats import bigram_costs

        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c"), (3, "x")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_bigrams, r.sum_pbp, r.avg_pbp, r.keep)
            for r in bigram_costs(docs).collect()
        }
        # c2: (a b)=3, (b a)=1, (b c)=1; c1: a=3, b=2
        # p_bp: a b -> 10000, b a -> 5000, b c -> 5000
        assert got[1] == (3, 25000, 8333, True)
        assert got[2] == (2, 15000, 7500, True)
        assert got[3] == (0, 0, 0, False)  # <2 tokens: no bigrams

    def test_matches_duckdb_twin_on_fixture(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.textstats import (
            bigram_costs,
            duck_bigram_sql,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = sorted(tuple(r) for r in bigram_costs(docs).collect())
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        orows = sorted(
            tuple(r) for r in con.sql(duck_bigram_sql()).fetchall()
        )
        assert rows == orows
        # threshold must discriminate (never vacuous)
        keeps = {r[4] for r in rows}
        assert keeps == {True, False}

    def test_text_never_shuffles(self, spark):
        import re

        from pdf_extractor_spark.functions.textstats import bigram_costs

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = (
            bigram_costs(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        for m in re.findall(r"Exchange [^\n]*", plan):
            assert "text" not in m, m


class TestConfusableSkeleton:
    """UTS #39-style homoglyph fold: the skeleton undoes the planted
    attack, counts the confusables, and is a pure native plan."""

    def test_fold_undoes_attack_and_counts(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.confusables import (
            confusable_skeleton_report, duck_confusables_sql,
        )

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        got = confusable_skeleton_report(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = con.sql(duck_confusables_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert (gs.to_numpy() == ws.to_numpy()).all()
        # the fold provably undoes the evasion on every doc
        assert bool(got.skeleton_ok.all())
        # the attack is non-vacuous: attacked docs carry confusables
        atk = got[got.attacked]
        assert len(atk) > 0 and bool((atk.n_confusables > 0).all())
        assert bool((got[~got.attacked].n_confusables == 0).all())

    def test_skeleton_is_pure_narrow_map(self, spark):
        from pdf_extractor_spark.functions.confusables import (
            confusable_skeleton_report,
        )

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        plan = (
            confusable_skeleton_report(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan

    def test_known_homoglyph_examples(self):
        # pure expression check through Spark's local eval is covered
        # above; here pin the TABLE itself: every src/dst pair aligned
        from pdf_extractor_spark.functions.confusables import (
            CONF_DST, CONF_SRC,
        )
        assert len(CONF_SRC) == len(CONF_DST)
        fold = dict(zip(CONF_SRC, CONF_DST))
        assert fold["а"] == "a" and fold["о"] == "o"  # Cyrillic
        assert fold["Е"] == "E" and fold["Х"] == "X"
        assert fold["ο"] == "o" and fold["ν"] == "v"  # Greek

    def test_skeleton_dedup_catches_evasions(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.confusables import (
            confusable_dedup_report, duck_confusable_dedup_sql,
        )

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        got = confusable_dedup_report(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = con.sql(duck_confusable_dedup_sql()).df()
        cols = sorted(got.columns)
        assert (got[cols].to_numpy() == want[cols].to_numpy()).all()
        row = got.iloc[0]
        # the attacked reposts are invisible to plain hashing but
        # collapse under the skeleton key — and nothing else changes
        assert row.evasions_caught > 0
        assert row.skeleton_distinct == row.plain_distinct \
            - row.evasions_caught

    def test_dedup_report_shuffles_hashes_never_text(self, spark):
        from pdf_extractor_spark.functions.confusables import (
            confusable_dedup_report,
        )

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        plan = (
            confusable_dedup_report(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re as _re
        keys = "".join(_re.findall(
            r"Exchange hashpartitioning\(([^)]*)\)", plan))
        assert keys and "text#" not in keys
