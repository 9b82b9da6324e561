"""Composed fetch batch: shared per-host politeness across the
discovery and refetch legs, delay scheduling, and plan hygiene."""

from __future__ import annotations

from pdf_extractor_spark.functions.fetchplan import (
    BATCH_K,
    fetch_batch_plan,
)
from pdf_extractor_spark.functions.robots import profile_delays

SF = "/root/testdata/sf0.001"


def _rows(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return fetch_batch_plan(docs).collect()


class TestSemantics:
    def test_combined_cap_binds_both_legs(self, spark):
        rows = _rows(spark)
        per_host: dict[str, int] = {}
        hosts_with_both: set[str] = set()
        host_srcs: dict[str, set] = {}
        for r in rows:
            host = r.url.split("/")[0]
            host_srcs.setdefault(host, set()).add(r.src)
            if r.selected:
                per_host[host] = per_host.get(host, 0) + 1
        assert per_host and max(per_host.values()) <= BATCH_K
        hosts_with_both = {h for h, s in host_srcs.items()
                          if len(s) == 2}
        assert hosts_with_both, "legs never compete for one host"
        # the cap must actually bind where both legs pile up
        assert any(per_host.get(h, 0) == BATCH_K
                   for h in hosts_with_both)

    def test_both_legs_win_slots(self, spark):
        rows = _rows(spark)
        srcs = {r.src for r in rows if r.selected}
        assert srcs == {"discover", "refetch"}

    def test_offsets_follow_shared_crawl_delay(self, spark):
        delays = profile_delays()
        rows = _rows(spark)
        for r in rows:
            if r.selected:
                assert r.fetch_offset_s == \
                    (r.rk - 1) * delays[(r.fetch_id // 7) % 2]
            else:
                assert r.fetch_offset_s == -1

    def test_urls_unique_refetch_wins_overlap(self, spark):
        # review regression: a URL surfacing in BOTH legs was selected
        # twice, burning two politeness slots on one target
        from pdf_extractor_spark.functions.frontier import (
            frontier_batch,
        )
        from pdf_extractor_spark.functions.recrawl import (
            recrawl_schedule,
        )
        from pdf_extractor_spark.functions.robots import (
            SPARK_HOST,
            SPARK_PATH,
        )
        from pyspark.sql import functions as F

        rows = _rows(spark)
        urls = [r.url for r in rows]
        assert len(urls) == len(set(urls)), "duplicate URL in plan"

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        discover_urls = {
            r.url for r in frontier_batch(docs).collect() if r.selected
        }
        refetch_urls = {
            r.u for r in recrawl_schedule(docs)
            .where("tier = 'hot'")
            .select(F.expr(
                f"concat({SPARK_HOST}, {SPARK_PATH})"
            ).alias("u")).collect()
        }
        overlap = discover_urls & refetch_urls
        assert overlap, "legs never collided — fixture degenerate"
        by_url = {r.url: r for r in rows}
        for u in overlap:
            assert by_url[u].src == "refetch", u

    def test_ranks_dense_per_host(self, spark):
        rows = _rows(spark)
        by_host: dict[str, list[int]] = {}
        for r in rows:
            by_host.setdefault(r.url.split("/")[0], []).append(r.rk)
        for host, rks in by_host.items():
            assert sorted(rks) == list(range(1, len(rks) + 1)), host


class TestPlan:
    def test_no_cartesian_no_text(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_fetch_batch"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        for schema in plan.split("ReadSchema: struct<")[1:]:
            assert "text" not in schema.split(">")[0]

    def test_legs_not_recomputed(self, spark):
        import re

        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_fetch_batch"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # frontier's two doc_id scans + recrawl's one — a composition
        # that re-derived a leg would add scans
        assert re.findall(r"ReadSchema: struct<([^>]*)>", plan) \
            == ["doc_id:bigint"] * 3
        assert plan.count("BroadcastHashJoin") == 2
        assert plan.count("SortMergeJoin") == 0
