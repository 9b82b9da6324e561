"""XML sitemap source: two-level index→urlset framing, entity
escaping, protocol defaults, depth-cap enforcement, and the Spark
roundtrip plan shape."""

from __future__ import annotations

import re

import pytest

from pdf_extractor_spark.sources.sitemaps import (
    DEFAULT_PRIORITY_X10,
    DOCS_PER_INDEX,
    NEW_CUTOFF,
    build_index,
    build_urlset,
    page_url,
    parse_index,
    parse_urlset,
    sitemap_roundtrip,
    w3c_datetime,
    _lastmod_offset,
)

IDS = list(range(64))


class TestFraming:
    def test_urlset_roundtrips_every_field(self):
        entries = parse_urlset(build_urlset(IDS))
        assert len(entries) == len(IDS)
        for doc_id, ent in zip(IDS, entries):
            assert ent["url"] == page_url(doc_id)
            assert ent["lastmod_offset"] == _lastmod_offset(doc_id)
            want_prio = (DEFAULT_PRIORITY_X10 if doc_id % 11 == 10
                         else doc_id % 11)
            assert ent["priority_x10"] == want_prio
            if doc_id % 7 == 6:
                assert ent["changefreq"] == "unset"

    def test_query_urls_escape_and_unescape(self):
        # doc_id % 5 == 0 urls carry '&' — must be &amp; on the wire
        xml = build_urlset([10])
        assert b"?ref=sm&amp;v=3" in xml
        assert b"&v=3</loc>" not in xml  # never raw on the wire
        assert parse_urlset(xml)[0]["url"].endswith("?ref=sm&v=3")

    def test_whitespace_padded_loc_is_stripped(self):
        # doc_id % 3 == 0 locs are newline-padded in the writer
        ent = parse_urlset(build_urlset([9]))[0]
        assert ent["url"] == page_url(9)

    def test_index_walks_children(self):
        index_xml, children = build_index(0, IDS[:DOCS_PER_INDEX])
        assert len(children) == 4  # 32 docs / 8 urls per map
        entries, violations = parse_index(index_xml, children)
        assert violations == 0
        assert [e["url"] for e in entries] == [
            page_url(i) for i in IDS[:DOCS_PER_INDEX]
        ]

    def test_nested_index_is_a_counted_violation(self):
        index_xml, children = build_index(0, IDS[:16])
        # replace one child with ANOTHER INDEX — protocol forbids
        # index → index; the parser must skip it, not recurse
        loc = next(iter(children))
        children[loc] = index_xml
        entries, violations = parse_index(index_xml, children)
        assert violations == 1
        assert len(entries) == 8  # only the surviving child's urls

    def test_missing_child_is_a_counted_violation(self):
        index_xml, children = build_index(0, IDS[:16])
        children.pop(next(iter(children)))
        _, violations = parse_index(index_xml, children)
        assert violations == 1

    def test_entry_without_loc_is_skipped(self):
        xml = build_urlset([1, 2]).replace(
            b"<loc>" + page_url(1).encode() + b"</loc>", b"", 1
        )
        entries = parse_urlset(xml)
        assert [e["url"] for e in entries] == [page_url(2)]

    def test_garbled_lastmod_is_loud(self):
        xml = build_urlset([1]).replace(
            w3c_datetime(_lastmod_offset(1)).encode(), b"yesterday"
        )
        assert parse_urlset(xml)[0]["lastmod_offset"] == -1


class TestSparkStage:
    def test_roundtrip_matches_closed_form(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(70)
        rows = {r.doc_id: r for r in sitemap_roundtrip(docs).collect()}
        for d in docs.select("doc_id").collect():
            r = rows[d.doc_id]
            assert r.url == page_url(d.doc_id)
            assert r.lastmod_offset == _lastmod_offset(d.doc_id)
            assert r.is_new == (r.lastmod_offset > NEW_CUTOFF)

    def test_plan_single_exchange_single_arrow_stage(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["extract_sitemap_roundtrip"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert plan.count("MapInPandas") == 1
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(
            c.split(":")[0] for c in m.group(1).split(",")
        ) == {"doc_id"}
