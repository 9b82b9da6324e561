"""Page-level REP: token grammar, template inertness through the
real parser, header-channel native scan, fixture verdicts vs DuckDB,
the link-graph composition pin, and the plan."""

from __future__ import annotations

import duckdb

from pdf_extractor_spark.functions.metarobots import (
    duck_meta_robots_sql,
    meta_robots_verdicts,
    parse_robots_tokens,
    wrap_html_robots,
)
from pdf_extractor_spark.operators.html_extract import harvest_directives

SF = "/root/testdata/sf0.001"


class TestTokenGrammar:
    def test_rep_tokens(self):
        cases = [
            ("noindex", (True, False)),
            (" NoFollow ", (False, True)),
            ("noindex, nofollow", (True, True)),
            ("NONE", (True, True)),
            ("all", (False, False)),
            ("index, follow", (False, False)),
            ("noarchive, nosnippet", (False, False)),
            ("noindex,noarchive , NOFOLLOW", (True, True)),
            ("", (False, False)),
        ]
        for content, want in cases:
            assert parse_robots_tokens(content) == want, content


class TestHarvest:
    def test_robots_meta_harvested(self):
        page = (
            b"<html><head><meta name='ROBOTS' content='noindex'>"
            b"</head><body><p>x</p></body></html>"
        )
        assert ("robots", "noindex") in harvest_directives(page)

    def test_template_wrapped_meta_is_inert(self):
        got = harvest_directives(wrap_html_robots("t", 7))
        assert all(k != "robots" for k, _ in got)

    def test_variant_pages_round_trip(self):
        # variant 4 carries both restrictions; variant 0 carries none
        got4 = dict(harvest_directives(wrap_html_robots("t", 4)))
        assert got4["robots"] == "noindex, nofollow"
        got0 = harvest_directives(wrap_html_robots("t", 0))
        assert all(k != "robots" for k, _ in got0)


class TestOracleMatch:
    def test_verdicts_match_duckdb(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = [tuple(r) for r in meta_robots_verdicts(docs).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'"
        )
        want = [
            tuple(r) for r in con.execute(duck_meta_robots_sql()).fetchall()
        ]
        assert got == want
        # both channels fire somewhere, and combine restrictively
        assert any(r[3] and not r[1] for r in got)  # header-only noindex
        assert any(r[1] and not r[3] for r in got)  # meta-only noindex
        by_id = {r[0]: r for r in got}
        for d, r in by_id.items():
            assert r[4] == (not (r[1] or r[3]))  # indexable
            assert r[5] == (not r[2])            # followable


class TestLinkGraphComposition:
    def test_nofollow_pages_feed_no_edges(self, spark):
        """REP gating the discovery stack: filtering the anchor-edge
        harvest by this operator's verdicts removes exactly the
        nofollow pages' outlinks from the PageRank/frontier input."""
        from pyspark.sql import functions as F

        from pdf_extractor_spark.functions.anchors import anchor_rows

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        verdicts = meta_robots_verdicts(docs)
        edges = anchor_rows(docs)
        kept = edges.join(
            verdicts.where(F.col("followable")).select("doc_id"), "doc_id"
        )
        n_foll = verdicts.where(F.col("followable")).count()
        assert kept.count() == 3 * n_foll  # 3 outlinks per kept page
        bad = kept.join(
            verdicts.where(~F.col("followable")).select("doc_id"), "doc_id"
        )
        assert bad.count() == 0


class TestPlan:
    def test_one_exchange_no_join(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_meta_robots"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
        assert "CartesianProduct" not in plan
