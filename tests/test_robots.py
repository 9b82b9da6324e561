"""RFC 9309 robots filtering: parser group semantics, precedence,
pattern translation, and the broadcast-join plan shape."""

from __future__ import annotations

import re

from pdf_extractor_spark.functions.robots import (
    ROBOTS_PROFILE_A,
    parse_robots,
    pattern_to_like,
    profile_rules,
    robots_filter_report,
    rule_priority,
)


class TestParser:
    def test_star_group_rules(self):
        rules = parse_robots(ROBOTS_PROFILE_A)
        assert ("/private/", False) in rules
        assert ("/private/published/", True) in rules
        assert ("/*.tmp$", False) in rules

    def test_specific_agent_group_wins_over_star(self):
        assert parse_robots(ROBOTS_PROFILE_A, agent="badbot") == [
            ("/", False)
        ]
        assert parse_robots(ROBOTS_PROFILE_A, agent="BadBot") == [
            ("/", False)
        ]

    def test_stacked_user_agent_lines_share_one_group(self):
        txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots(txt, agent="a") == [("/x", False)]
        assert parse_robots(txt, agent="b") == [("/x", False)]

    def test_rules_before_any_group_are_ignored(self):
        assert parse_robots("Disallow: /x\nUser-agent: *\nAllow: /\n") \
            == [("/", True)]

    def test_comments_and_unknown_directives_ignored(self):
        txt = ("User-agent: *  # everyone\nCrawl-delay: 3\n"
               "Disallow: /a  # note\n")
        assert parse_robots(txt) == [("/a", False)]

    def test_empty_pattern_dropped(self):
        assert parse_robots("User-agent: *\nDisallow:\n") == []


class TestPrecedence:
    def test_longest_match_wins(self):
        assert rule_priority("/private/published/", True) > \
            rule_priority("/private/", False)

    def test_allow_wins_ties(self):
        assert rule_priority("/a/", True) == \
            rule_priority("/a/", False) + 1

    def test_like_translation(self):
        assert pattern_to_like("/*.tmp$") == "/%.tmp"
        assert pattern_to_like("/private/") == "/private/%"
        assert pattern_to_like("/50%_off") == "/50\\%\\_off%"


class TestSparkStage:
    def test_verdicts_follow_rfc_semantics(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        got = {r.doc_id: r for r in
               robots_filter_report(docs).collect()}
        # profile A (doc_id//7 even): /private blocked, published
        # subtree re-allowed, *.tmp anchored block, index allowed
        assert not got[0].allowed          # /private/page0.html
        assert got[1].allowed              # /private/published/p1.html
        assert not got[2].allowed          # /files/f2.tmp
        assert got[4].allowed              # /index4.html
        # profile B (doc_id//7 odd): closed except /articles/
        assert not got[9].allowed          # /index9.html
        assert got[8].allowed              # /articles/a8.html
        kept = sum(1 for r in got.values() if r.allowed)
        assert 0 < kept < len(got)

    def test_rule_table_broadcasts_single_verdict_exchange(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_robots_filter"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "text" not in plan.split("ReadSchema:")[1].split(">")[0]
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

    def test_rule_table_is_small(self):
        assert len(profile_rules()) < 32


class TestCrawlDelay:
    def test_profile_fixtures_carry_their_delays(self):
        from pdf_extractor_spark.functions.robots import (
            ROBOTS_PROFILE_B,
            parse_crawl_delay,
            profile_delays,
        )

        assert parse_crawl_delay(ROBOTS_PROFILE_A) == 5
        assert parse_crawl_delay(ROBOTS_PROFILE_B) == 10
        # archiver shares profile B's stacked user-agent group
        assert parse_crawl_delay(ROBOTS_PROFILE_B, agent="archiver") == 10
        assert profile_delays() == {0: 5, 1: 10}

    def test_exact_agent_group_without_delay_returns_none(self):
        from pdf_extractor_spark.functions.robots import parse_crawl_delay

        # badbot's group exists but sets no delay — the * fallback
        # must NOT leak in once an exact-agent group matched
        assert parse_crawl_delay(ROBOTS_PROFILE_A, agent="badbot") is None

    def test_merged_groups_take_the_largest_delay(self):
        from pdf_extractor_spark.functions.robots import parse_crawl_delay

        text = (
            "User-agent: *\nCrawl-delay: 2\n\n"
            "User-agent: other\nCrawl-delay: 99\n\n"
            "User-agent: *\nCrawl-delay: 7\n"
        )
        assert parse_crawl_delay(text) == 7

    def test_value_parsing_edges(self):
        from pdf_extractor_spark.functions.robots import parse_crawl_delay

        assert parse_crawl_delay(
            "User-agent: *\nCrawl-delay: 2.5\n"
        ) == 2  # fractional seconds floor to int
        assert parse_crawl_delay(
            "User-agent: *\nCrawl-delay: soon\n"
        ) is None  # garbage value ignored
        assert parse_crawl_delay(
            "Crawl-delay: 9\nUser-agent: *\nDisallow: /a\n"
        ) is None  # delay before any group is ignored
        assert parse_crawl_delay(
            "User-agent: *\nCrawl-delay: -5\n"
        ) is None  # negative delay would corrupt fetch offsets

    def test_explicit_zero_delay_is_honored(self):
        # review regression: `or DEFAULT` coerced an explicit 0 to 1
        from pdf_extractor_spark.functions.robots import parse_crawl_delay

        text = "User-agent: *\nCrawl-delay: 0\n"
        assert parse_crawl_delay(text) == 0
        import pdf_extractor_spark.functions.robots as robots_mod
        from unittest import mock

        with mock.patch.object(
            robots_mod, "PROFILES", ((0, text),)
        ):
            assert robots_mod.profile_delays() == {0: 0}


class TestSitemapDirective:
    def test_position_independent_and_case_preserving(self):
        from pdf_extractor_spark.functions.robots import (
            ROBOTS_PROFILE_B,
            parse_sitemap_urls,
        )

        # profile A's directive precedes any group; profile B's sits
        # inside a group — both apply (the directive is group-free)
        assert parse_sitemap_urls(ROBOTS_PROFILE_A) == [
            "https://h.example/sitemap-index.xml"
        ]
        # URL case preserved (only the directive name is folded)
        assert parse_sitemap_urls(ROBOTS_PROFILE_B) == [
            "https://h.example/SiteMap-B.xml"
        ]

    def test_group_parsers_ignore_the_directive(self):
        from pdf_extractor_spark.functions.robots import (
            parse_crawl_delay,
        )

        text = ("Sitemap: https://a.example/s.xml\n"
                "User-agent: *\nDisallow: /x\n")
        assert parse_robots(text) == [("/x", False)]
        assert parse_crawl_delay(text) is None

    def test_comment_and_blank_values_dropped(self):
        from pdf_extractor_spark.functions.robots import (
            parse_sitemap_urls,
        )

        assert parse_sitemap_urls(
            "sitemap: https://a.example/s.xml  # primary\nSitemap:\n"
        ) == ["https://a.example/s.xml"]


class TestGroupCombining:
    def test_multiple_matching_groups_combine(self):
        # RFC 9309 §2.2.1 review regression: two `User-agent: *`
        # stanzas must merge — the second group's rules were ignored
        from pdf_extractor_spark.functions.robots import parse_robots

        text = (
            "User-agent: *\nDisallow: /a\n\n"
            "User-agent: other\nDisallow: /x\n\n"
            "User-agent: *\nDisallow: /b\n"
        )
        rules = parse_robots(text)
        assert ("/a", False) in rules and ("/b", False) in rules
        assert ("/x", False) not in rules

    def test_specific_agent_combines_only_its_groups(self):
        from pdf_extractor_spark.functions.robots import parse_robots

        text = (
            "User-agent: bot\nDisallow: /one\n\n"
            "User-agent: *\nDisallow: /star\n\n"
            "User-agent: bot\nAllow: /two\n"
        )
        rules = parse_robots(text, agent="bot")
        assert rules == [("/one", False), ("/two", True)]
