"""Canonical/meta-refresh harvesting: WHATWG refresh grammar,
template inertness, the refresh↔redirect-graph pin, and the
one-Arrow-pass plan."""

from __future__ import annotations

from pdf_extractor_spark.functions.canonical import (
    html_redirect_edges,
    wrap_html_directives,
)
from pdf_extractor_spark.operators.html_extract import (
    harvest_directives,
    parse_refresh,
)

SF = "/root/testdata/sf0.001"


class TestRefreshGrammar:
    def test_variant_forms_parse(self):
        u = "https://a.example/p"
        assert parse_refresh(f"5; url={u}") == (5, u)
        assert parse_refresh(f"5;URL='{u}'") == (5, u)
        assert parse_refresh(f'0, url="{u}"') == (0, u)
        assert parse_refresh(f"2.5 ;  Url = {u}") == (2, u)

    def test_bare_number_is_self_reload(self):
        assert parse_refresh("30") == (30, None)
        assert parse_refresh(" 30 ") == (30, None)

    def test_garbage_rejected(self):
        assert parse_refresh("never") is None
        assert parse_refresh("url=https://a.example") is None


class TestHarvest:
    def test_template_refresh_is_inert(self):
        # doc_id 8: canonical (8%4==0) + template trap (8%6==2)
        got = harvest_directives(wrap_html_directives("t", 8))
        assert [k for k, _ in got] == ["canonical"]
        assert "evil" not in str(got)

    def test_self_reload_harvested_but_edgeless(self):
        # doc_id 6: bare-number refresh only (6%12==6, 6%3==0, 6%4!=0)
        got = harvest_directives(wrap_html_directives("t", 6))
        assert got == [("refresh", "30")]

    def test_rel_list_membership(self):
        # doc_id 16: rel='alternate canonical' still harvests
        got = harvest_directives(wrap_html_directives("t", 16))
        assert any(k == "canonical" for k, _ in got)

    def test_unterminated_content_quote_degrades_to_no_edge(self):
        # quote repair closes the runaway attribute at the next tag
        # start, truncating the refresh value to '5;' — which parses
        # as a self-reload (url None), never as a WRONG edge
        page = (b"<html><head><meta http-equiv='refresh' "
                b"content='5; url=https://a.example/page/9"
                b"<link rel='canonical' href='/c'></head>"
                b"<body><p>Body text.</p></body></html>")
        got = harvest_directives(page)
        assert ("refresh", "5;") in got
        assert parse_refresh("5;") == (5, None)

    def test_duplicate_attribute_first_wins(self):
        # review regression: WHATWG drops duplicate attributes (first
        # occurrence wins); last-wins would follow the wrong target
        page = (b"<html><head><meta http-equiv='refresh' "
                b"content='0;url=https://a.example/page/1' "
                b"content='0;url=https://b.example/page/2'>"
                b"<link rel='canonical' href='/first' href='/second'>"
                b"</head><body>x</body></html>")
        got = dict(harvest_directives(page))
        assert got["refresh"] == "0;url=https://a.example/page/1"
        assert got["canonical"] == "/first"


class TestSparkStage:
    def test_refresh_edges_equal_redirect_graph(self, spark):
        from pdf_extractor_spark.functions.redirects import (
            redirect_edges,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        harvested = {
            (r.doc_id, r.target_id)
            for r in html_redirect_edges(docs).collect()
            if r.kind == "refresh"
        }
        synthesized = {
            (r.node, r.nxt) for r in redirect_edges(docs).collect()
        }
        assert harvested == synthesized and harvested

    def test_canonical_rows_and_delays(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = html_redirect_edges(docs).collect()
        canon = [r for r in rows if r.kind == "canonical"]
        assert canon and all(
            r.target_id == r.doc_id and r.doc_id % 4 == 0
            and r.delay_s == -1 for r in canon
        )
        refresh = [r for r in rows if r.kind == "refresh"]
        assert all(r.delay_s == r.doc_id % 7 for r in refresh)

    def test_plan_one_arrow_pass(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_html_redirect_edges"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1
        assert "CartesianProduct" not in plan
