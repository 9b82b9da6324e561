"""Tests for the round-4 training-pipeline operators: benchmark
decontamination and the frozen model-based quality classifier."""

from __future__ import annotations

import duckdb
import pytest

from pdf_extractor_spark.functions.decontam import (
    DECONTAM_NGRAM,
    corpus_decontaminate,
    decontaminate_report,
    duck_decontam_sql,
    eval_set_from_slice,
)
from pdf_extractor_spark.functions.quality_model import (
    WEIGHTS,
    duck_quality_classifier_sql,
    quality_classifier,
)

SF = "/root/testdata/sf0.001"

PROSE = (
    "the growth of the market is a result of the change in the "
    "process and the level of the research in the field over time "
    "for each case that the team saw in the study of the area"
)
SPAM = " ".join(["buy"] * 10 + [str(n * 7919) for n in range(30)])


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_planted_quote_detected(self, spark):
        # eval doc quotes a 12-token chunk of doc 7: 12-8+1=5 hits
        chunk = " ".join(f"tok{i}" for i in range(12))
        corpus = _docs(
            spark,
            [
                (7, "lead words here then " + chunk + " trailing text"),
                (8, "completely unrelated body of other words " * 3),
            ],
        )
        ev = spark.createDataFrame([(0, chunk)], "eval_id long, text string")
        got = {
            r.doc_id: r
            for r in decontaminate_report(corpus, ev).collect()
        }
        assert got[7].contaminated and got[7].n_hit == 5
        assert not got[8].contaminated and got[8].n_hit == 0

    def test_short_doc_zero_grams(self, spark):
        corpus = _docs(spark, [(1, "too few tokens here")])
        ev = spark.createDataFrame([(0, PROSE)], "eval_id long, text string")
        row = decontaminate_report(corpus, ev).collect()[0]
        assert row.n_grams == 0 and not row.contaminated

    def test_matches_duckdb_twin_on_testdata(self, spark):
        sdf = (
            corpus_decontaminate(spark.read.parquet(f"{SF}/documents.parquet"))
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        odf = (
            con.execute(duck_decontam_sql())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        odf = odf.astype(sdf.dtypes.to_dict())
        assert sdf.equals(odf)
        # non-vacuous at the smallest SF: the sliced eval windows hit
        # their own source docs by construction
        assert sdf.contaminated.sum() > 0

    def test_eval_slice_windows_hit_their_sources(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        ev_ids = {r.eval_id for r in eval_set_from_slice(docs).collect()}
        assert ev_ids  # slice produced eval rows
        got = {
            r.doc_id: r for r in corpus_decontaminate(docs).collect()
        }
        expect = 20 - DECONTAM_NGRAM + 1  # grams in one lifted window
        for did in ev_ids:
            assert got[did].n_hit >= expect

    def test_eval_side_broadcast_text_never_shuffles(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            corpus_decontaminate(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        # every exchange carries (doc_id, counts) or gram hashes —
        # never the text column
        import re

        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "text" not in m.group(1), m.group(0)


class TestQualityClassifier:
    def test_prose_kept_spam_dropped(self, spark):
        got = {
            r.doc_id: r
            for r in quality_classifier(
                _docs(spark, [(1, PROSE), (2, SPAM)])
            ).collect()
        }
        assert got[1].keep and got[1].logit > 0
        assert not got[2].keep and got[2].logit < 0

    def test_matches_duckdb_twin_on_testdata(self, spark):
        sdf = (
            quality_classifier(spark.read.parquet(f"{SF}/documents.parquet"))
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        odf = (
            con.execute(duck_quality_classifier_sql())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        odf = odf.astype(sdf.dtypes.to_dict())
        assert sdf.equals(odf)

    def test_sql_matches_trainer_feature_twin(self, spark):
        # the frozen weights are only valid while the SQL features and
        # the trainer's Python features stay in lockstep
        import importlib.util
        import pathlib

        spec = importlib.util.spec_from_file_location(
            "tqm",
            pathlib.Path(__file__).resolve().parents[1]
            / "scripts"
            / "train_quality_model.py",
        )
        tqm = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tqm)
        texts = [PROSE, SPAM, "short one", "a b c d e 12345 !!!"]
        rows = [(i, t) for i, t in enumerate(texts)]
        got = {
            r.doc_id: r.logit
            for r in quality_classifier(_docs(spark, rows)).collect()
        }
        order = ["f_len", "f_stop", "f_punct", "f_digit", "f_rep",
                 "f_wordshape"]
        for i, t in enumerate(texts):
            feats = tqm.features(t)
            z = WEIGHTS["bias"]
            for name, f in zip(order, feats):
                z += WEIGHTS[name] * f
            assert got[i] == pytest.approx(round(z, 4), abs=1e-4), t

    def test_pure_narrow_map_no_exchange(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            quality_classifier(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        # codegen'd stages print as "*(n)" in executedPlan().toString()
        assert "*(1)" in plan


class TestNormalizedDecontam:
    def test_recased_quote_caught_only_with_normalize(self, spark):
        chunk = " ".join(f"tok{i}" for i in range(10))
        recased = " ".join(
            f"TOK{i}," if i % 2 else f"Tok{i}" for i in range(10)
        )
        corpus = _docs(spark, [(7, "lead in words then " + recased)])
        ev = spark.createDataFrame(
            [(0, chunk)], "eval_id long, text string"
        )
        raw = decontaminate_report(corpus, ev).collect()[0]
        assert raw.n_hit == 0  # verbatim hashing misses the re-case
        norm = decontaminate_report(
            corpus, ev, normalize=True
        ).collect()[0]
        assert norm.contaminated and norm.n_hit == 3  # 10 toks, n=8

    def test_normalize_is_narrow_and_anchors_all_docs(self, spark):
        import re

        corpus = _docs(spark, [(1, "A! B? C."), (2, PROSE)])
        ev = spark.createDataFrame(
            [(0, PROSE.upper())], "eval_id long, text string"
        )
        report = decontaminate_report(corpus, ev, normalize=True)
        rows = {r.doc_id: r for r in report.collect()}
        assert set(rows) == {1, 2}  # short doc keeps its (0,0) row
        assert rows[2].contaminated  # upper-cased eval still hits
        # "narrow": normalization must not push text into any exchange
        plan = report._jdf.queryExecution().executedPlan().toString()
        for m in re.findall(r"Exchange [^\n]*", plan):
            assert "text" not in m, m

    def test_normalize_survives_line_wrap_and_tabs(self, spark):
        # whitespace is COLLAPSED, not deleted: a line-wrapped or
        # tab-separated verbatim quote must still hit (deleting \n
        # would fuse tokens across breaks and miss every wrapped
        # quote)
        chunk = " ".join(f"tok{i}" for i in range(10))
        wrapped = (
            "lead in words then "
            + chunk.replace("tok4 tok5", "tok4\ntok5").replace(
                "tok7 tok8", "tok7\ttok8"
            )
        )
        corpus = _docs(spark, [(7, wrapped)])
        ev = spark.createDataFrame(
            [(0, chunk)], "eval_id long, text string"
        )
        raw = decontaminate_report(corpus, ev).collect()[0]
        norm = decontaminate_report(
            corpus, ev, normalize=True
        ).collect()[0]
        assert raw.n_hit == 0  # verbatim split(' ') misses the wrap
        assert norm.contaminated and norm.n_hit == 3


class TestQualityTiers:
    def test_tiers_partition_corpus_and_budget_arithmetic(self, spark):
        from pdf_extractor_spark.functions.quality_model import (
            TIER_BOUNDS, quality_tiers)

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = {r.tier: r for r in quality_tiers(docs).collect()}
        assert set(rows) == {"high", "medium", "low", "reject"}
        assert sum(r.n_docs for r in rows.values()) == docs.count()
        for r in rows.values():
            assert r.budget_tokens == r.epochs * r.n_tokens
        assert rows["reject"].epochs == 0
        # tier score ranges must not overlap and must respect bounds
        bounds = dict((t, b) for t, _, b in TIER_BOUNDS)
        assert rows["high"].min_logit >= bounds["high"]
        assert rows["medium"].max_logit < bounds["high"]
        assert rows["medium"].min_logit >= bounds["medium"]
        assert rows["low"].max_logit < bounds["medium"]
        assert rows["reject"].max_logit < bounds["low"]

    def test_tier_agrees_with_classifier_logit(self, spark):
        from pdf_extractor_spark.functions.quality_model import (
            quality_classifier, quality_tiers)

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        logits = [r.logit for r in quality_classifier(docs).collect()]
        high = sum(1 for z in logits if z >= -0.35)
        got = {r.tier: r.n_docs for r in quality_tiers(docs).collect()}
        assert got["high"] == high

    def test_scan_local_no_window_single_rollup_exchange(self, spark):
        import re

        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_quality_tiers"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "Sort" not in plan
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
