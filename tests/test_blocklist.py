"""Tests for the URL blocklist operator (UT1-style domain/path
filtering): suffix semantics, label boundaries, segment-vs-substring
path matching, and the broadcast-equi-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.functions.blocklist import (
    BLOCKED_DOMAINS,
    host_suffixes,
    url_blocklist_report,
)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


class TestHostSuffixes:
    def test_suffix_expansion(self, spark):
        df = spark.createDataFrame([("a.b.c.com",)], "host string")
        out = df.select(
            host_suffixes(F.col("host")).alias("s")
        ).first().s
        assert out == ["a.b.c.com", "b.c.com", "c.com"]

    def test_single_label_host_is_empty(self, spark):
        # sequence(1,0) DESCENDS in Spark — the guard must yield []
        df = spark.createDataFrame([("localhost",)], "host string")
        assert df.select(
            host_suffixes(F.col("host")).alias("s")
        ).first().s == []


class TestBlocklistSemantics:
    def test_suffix_and_exact_domain_block(self, spark):
        rows = [
            (1, "https://ads.eu.badnet.com/a/1"),    # suffix match
            (2, "https://badnet.com/a/2"),           # exact match
            (3, "https://notbadnet.com/a/3"),        # label boundary: kept
            (4, "https://site1.example.org/a/4"),    # clean
        ]
        got = {
            r.doc_id: (r.block_domain, r.is_kept)
            for r in url_blocklist_report(_urls(spark, rows)).collect()
        }
        assert got[1] == ("badnet.com", 0)
        assert got[2] == ("badnet.com", 0)
        assert got[3] == ("", 1)
        assert got[4] == ("", 1)

    def test_path_segment_not_substring(self, spark):
        rows = [
            (1, "https://ok.example.org/casino/1"),         # segment: blocked
            (2, "https://ok.example.org/casino-reviews/2"),  # substring: kept
            (3, "https://ok.example.org/x/pills"),           # last seg: blocked
        ]
        got = {
            r.doc_id: (r.path_blocked, r.is_kept)
            for r in url_blocklist_report(_urls(spark, rows)).collect()
        }
        assert got[1] == (1, 0)
        assert got[2] == (0, 1)
        assert got[3] == (1, 0)

    def test_domain_and_path_both_reported(self, spark):
        rows = [(1, "https://x.badnet.com/casino/1")]
        r = url_blocklist_report(_urls(spark, rows)).first()
        assert (r.block_domain, r.path_blocked, r.is_kept) == (
            "badnet.com", 1, 0,
        )

    def test_casing_cannot_bypass_the_filter(self, spark):
        """DNS hosts and schemes are case-insensitive (RFC 3986
        §6.2.2.1) and keyword blocking is case-blind — mixed-case
        urls must still block."""
        rows = [
            (1, "https://Ads.BADNET.com/a/1"),
            (2, "HTTPS://ads.badnet.com/x"),
            (3, "https://clean.example.org/CASINO/7"),
            (4, "https://clean.example.org/fine/8"),
        ]
        kept = {
            r.doc_id: r.is_kept
            for r in url_blocklist_report(_urls(spark, rows)).collect()
        }
        assert kept == {1: 0, 2: 0, 3: 0, 4: 1}

    def test_every_shipped_domain_blocks_itself(self, spark):
        rows = [
            (i, f"https://{d}/a/{i}")
            for i, d in enumerate(BLOCKED_DOMAINS)
        ]
        out = url_blocklist_report(_urls(spark, rows)).collect()
        assert all(r.is_kept == 0 for r in out)
        assert {r.block_domain for r in out} == set(BLOCKED_DOMAINS)


class TestBlocklistPlan:
    def test_broadcast_equi_join_no_cartesian(self, spark):
        rows = [(i, f"https://s{i}.example.org/a/{i}") for i in range(8)]
        plan = (
            url_blocklist_report(_urls(spark, rows))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
