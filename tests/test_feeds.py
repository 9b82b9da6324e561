"""RSS 2.0 / Atom feed source: item framing, CDATA vs escaped
content recovery, date normalization, and the Spark roundtrip plan
shape."""

from __future__ import annotations

import re

import pytest

from pdf_extractor_spark.sources.feeds import (
    build_atom,
    build_rss,
    extract_items,
    feed_roundtrip,
    parse_feed,
    rfc822_date,
    rfc3339_date,
)

PAGES = [(i, f"Body text of document {i} with several words.")
         for i in range(16)]


class TestFraming:
    @pytest.mark.parametrize("build", [build_rss, build_atom])
    def test_multi_item_feed_roundtrips(self, build):
        rows = extract_items(build(PAGES))
        assert [r["doc_id"] for r in rows] == [p[0] for p in PAGES]
        for (doc_id, text), row in zip(PAGES, rows):
            assert row["extracted_text"] == text
            assert row["ts_offset"] == doc_id

    @pytest.mark.parametrize("build", [build_rss, build_atom])
    def test_cdata_split_convention_rejoins(self, build):
        # ']]>' inside a CDATA payload must be split per the XML spec
        # and rejoined losslessly on read (doc_id % 3 == 0 → CDATA)
        tricky = [
            (3, "A payload that contains ]]> inside normal prose."),
            (6, "Doc with the sequence ]]]]> twice ]]> to stress it."),
        ]
        rows = extract_items(build(tricky))
        for (doc_id, text), row in zip(tricky, rows):
            assert row["extracted_text"] == text

    @pytest.mark.parametrize("build", [build_rss, build_atom])
    def test_escaped_content_unescapes(self, build):
        # doc_id % 3 != 0 → entity-escaped payload; markup chars in
        # the body must survive escape → unescape → extract
        pages = [(1, "Inequalities like a < b & b > c survive here.")]
        rows = extract_items(build(pages))
        assert rows[0]["extracted_text"] == pages[0][1]

    def test_date_formats_normalize_to_one_offset(self):
        assert rfc822_date(0) == "Mon, 01 Jan 2024 00:00:00 GMT"
        assert rfc3339_date(61) == "2024-01-01T00:01:01Z"
        rss = extract_items(build_rss(PAGES[:4]))
        atom = extract_items(build_atom(PAGES[:4]))
        assert [r["ts_offset"] for r in rss] == [0, 1, 2, 3]
        assert [r["ts_offset"] for r in atom] == [0, 1, 2, 3]

    def test_items_missing_link_or_content_are_skipped(self):
        feed = build_rss(PAGES[:3]).replace(
            b"<link>https://feeds.example/doc/1</link>", b"", 1
        )
        rows = extract_items(feed)
        assert [r["doc_id"] for r in rows] == [0, 2]

    def test_foreign_link_shape_is_skipped(self):
        feed = build_rss(PAGES[:2]).replace(
            b"https://feeds.example/doc/0",
            b"https://feeds.example/about",
        )
        assert [r["doc_id"] for r in extract_items(feed)] == [1]

    def test_parse_feed_recovers_both_layouts(self):
        rss = parse_feed(build_rss(PAGES[:2]))
        atom = parse_feed(build_atom(PAGES[:2]))
        assert [i["url"] for i in rss] == [i["url"] for i in atom]
        assert rss[0]["html"] == atom[0]["html"]

    def test_unparseable_date_is_loud(self):
        feed = build_rss(PAGES[:1]).replace(
            rfc822_date(0).encode(), b"not a date"
        )
        assert extract_items(feed)[0]["ts_offset"] == -1


class TestSparkStage:
    def test_roundtrip_matches_documents_text(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(40)
        got = {r.doc_id: (r.ts_offset, r.extracted_text)
               for r in feed_roundtrip(docs).collect()}
        for row in docs.collect():
            ts, text = got[row.doc_id]
            assert text == row.text
            assert ts == row.doc_id

    def test_plan_single_exchange_single_arrow_stage(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["extract_feed_roundtrip"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert plan.count("MapInPandas") == 1
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(
            c.split(":")[0] for c in m.group(1).split(",")
        ) == {"doc_id", "text"}


class TestLocaleIndependence:
    def test_rfc822_parse_uses_module_tables_not_strptime(self):
        # review regression: strptime %a/%b is locale-dependent and
        # rejects English names under a non-English LC_TIME
        import locale

        from pdf_extractor_spark.sources.feeds import (
            _date_offset, rfc822_date)

        assert _date_offset(rfc822_date(3661)) == 3661
        for cand in ("de_DE.UTF-8", "fr_FR.UTF-8", "ja_JP.UTF-8"):
            try:
                old = locale.setlocale(locale.LC_TIME, cand)
            except locale.Error:
                continue
            try:
                assert _date_offset(rfc822_date(42)) == 42
            finally:
                locale.setlocale(locale.LC_TIME, "C")
            break

    def test_garbled_weekday_is_loud(self):
        from pdf_extractor_spark.sources.feeds import _date_offset

        assert _date_offset("Xxx, 01 Jan 2024 00:00:00 GMT") == -1
