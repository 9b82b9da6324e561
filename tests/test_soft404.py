"""Soft-404 detection: phrase flag vs honest 404s, the host rollup
vs DuckDB, and the plan (body never shuffles)."""

from __future__ import annotations

import duckdb

from pdf_extractor_spark.functions.soft404 import (
    HONEST_HOST,
    PRONE_HOSTS,
    duck_soft404_sql,
    soft404_report,
    synth_status_pages,
)

SF = "/root/testdata/sf0.001"


class TestSemantics:
    def test_honest_404_is_not_soft(self, spark):
        """The same error body under a declared 404 must not count."""
        rows = spark.createDataFrame(
            [
                ("h1", 200, "Error 404 - Page Not Found."),
                ("h1", 404, "Error 404 - Page Not Found."),
                ("h1", 200, "real content here"),
            ],
            "host string, status int, body string",
        )
        r = soft404_report(rows).collect()[0]
        assert r.n_pages == 3 and r.n_ok200 == 2
        assert r.n_soft404 == 1  # only the lying 200

    def test_flag_rule_threshold(self, spark):
        """9 clean + 1 soft = 10% of 200s -> flagged; 10 clean + 1
        soft < 10% -> not."""
        mk = lambda n_clean: [("h", 200, "page not found")] + [
            ("h", 200, f"clean body {i} with distinct length {'x' * i}")
            for i in range(n_clean)
        ]
        for n_clean, want in ((9, True), (10, False)):
            df = spark.createDataFrame(
                mk(n_clean), "host string, status int, body string"
            )
            assert soft404_report(df).collect()[0].flagged == want

    def test_modal_count_tracks_template(self, spark):
        df = spark.createDataFrame(
            [("h", 200, "page not found")] * 4
            + [("h", 200, "a"), ("h", 200, "bb"), ("h", 404, "ccc")],
            "host string, status int, body string",
        )
        r = soft404_report(df).collect()[0]
        assert r.modal_len_count == 4  # the four identical templates


class TestOracleMatch:
    def test_fixture_matches_duckdb(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = [
            tuple(r)
            for r in soft404_report(synth_status_pages(docs)).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'"
        )
        want = [tuple(r) for r in con.execute(duck_soft404_sql()).fetchall()]
        assert got == want
        by_host = {r[0]: r for r in got}
        for h in PRONE_HOSTS:
            assert by_host[f"site{h}.example"][5]  # flagged
        honest = by_host[f"site{HONEST_HOST}.example"]
        assert honest[3] == 0 and not honest[5]  # zero soft, unflagged
        clean = by_host["site0.example"]
        assert not clean[5]


class TestPlan:
    def test_body_never_crosses_an_exchange(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_soft404"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        for seg in plan.split("Exchange hashpartitioning")[1:]:
            head = seg.split("\n")[0]
            assert "body#" not in head and "text#" not in head
        # partial aggregation before both exchanges
        assert plan.count("HashAggregate") >= 4
