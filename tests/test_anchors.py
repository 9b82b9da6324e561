"""Anchor harvesting and the anchor-text corpus operator."""

from __future__ import annotations

import re

from pdf_extractor_spark.operators.html_extract import harvest_anchors


class TestHarvest:
    def test_basic_pairs_with_nested_markup(self):
        html = (b"<html><body><a href='https://x.example/p'>X "
                b"<b>Site</b></a><p><a href='/rel'>rel</a></p>"
                b"</body></html>")
        assert harvest_anchors(html) == [
            ("https://x.example/p", "X Site"), ("/rel", "rel"),
        ]

    def test_unterminated_anchor_flushes_at_eof(self):
        html = b"<body><a href='https://z.example/r'>tail text"
        assert harvest_anchors(html) == [
            ("https://z.example/r", "tail text")
        ]

    def test_nested_anchor_implies_close(self):
        html = (b"<body><a href='/a'>one <a href='/b'>two</a></body>")
        assert harvest_anchors(html) == [("/a", "one"), ("/b", "two")]

    def test_hrefless_and_empty_href_skipped(self):
        html = b"<body><a name='x'>no link</a><a href=''>empty</a>"
        assert harvest_anchors(html) == []

    def test_boilerplate_context_anchors_kept(self):
        html = (b"<body><nav><a href='https://n.example/'>Nav</a>"
                b"</nav><footer><a href='https://f.example/'>F</a>"
                b"</footer></body>")
        assert [h for h, _ in harvest_anchors(html)] == [
            "https://n.example/", "https://f.example/",
        ]

    def test_script_content_never_yields_anchors(self):
        html = (b"<body><script>var s = \"<a href='https://ev.il/'>"
                b"x</a>\";</script><a href='https://ok.example/'>ok"
                b"</a></body>")
        assert [h for h, _ in harvest_anchors(html)] == [
            "https://ok.example/"
        ]


class TestOperator:
    def test_harvested_graph_equals_pagerank_input_graph(self, spark):
        from pyspark.sql import functions as F

        from pdf_extractor_spark.functions.anchors import anchor_rows
        from pdf_extractor_spark.functions.linkgraph import (
            synth_outlink_edges)

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(120)
        parsed = (
            anchor_rows(docs)
            .select(
                F.expr("cast(doc_id % 101 as int)").alias("src"),
                F.regexp_extract(
                    "dst_host", r"site(\d+)\.example", 1
                ).cast("int").alias("dst"),
            )
            .groupBy("src", "dst")
            .agg(F.count("*").cast("bigint").alias("w"))
        )
        synth = synth_outlink_edges(docs)
        assert sorted(map(tuple, parsed.collect())) == \
            sorted(map(tuple, synth.collect()))

    def test_rollup_exchange_never_carries_page_bytes(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_anchor_text"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1
        for keys in re.findall(
            r"Exchange hashpartitioning\(([^)]*)\)", plan
        ):
            # the documents.text column is `text#N`; anchor_text is
            # the harvested (small) string and is fine to ship
            assert not re.search(r"\btext#", keys)
            assert "html" not in keys


class TestSkipSubtreeAnchors:
    def test_anchors_inside_inert_subtrees_not_harvested(self):
        # review regression: <a href> inside template/select/head was
        # recorded with empty text — phantom rows in the link graph
        from pdf_extractor_spark.operators.html_extract import (
            harvest_anchors,
        )

        html = (
            b"<html><head><a href='https://p.example/h'>x</a></head>"
            b"<body>"
            b"<template><a href='https://p.example/t'>tpl</a>"
            b"</template>"
            b"<select><a href='https://p.example/s'>sel</a></select>"
            b"<p>Real prose <a href='https://p.example/ok'>kept link"
            b"</a> continues.</p>"
            b"</body></html>"
        )
        anchors = harvest_anchors(html)
        hrefs = [h for h, _t in anchors]
        assert hrefs == ["https://p.example/ok"]
        assert anchors[0][1] == "kept link"
