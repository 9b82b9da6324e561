"""Crawl-frontier batch selection: admission semantics, politeness
cap, rank determinism, and the single-pass plan shape."""

from __future__ import annotations

import re

from pdf_extractor_spark.functions.frontier import (
    ID_SPACE,
    POLITENESS_K,
    PREV_MULT,
    frontier_batch,
)

SF = "/root/testdata/sf0.001"


def _rows(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return frontier_batch(docs).collect(), docs


class TestSemantics:
    def test_selected_rows_are_admitted_and_capped(self, spark):
        rows, _ = _rows(spark)
        per_host: dict[str, int] = {}
        for r in rows:
            if r.selected:
                assert not r.seen and r.allowed
                assert 1 <= r.rk <= POLITENESS_K
                host = r.url.split("/")[0]
                per_host[host] = per_host.get(host, 0) + 1
        assert per_host, "no rows selected — fixture degenerate"
        assert max(per_host.values()) <= POLITENESS_K

    def test_rejected_rows_carry_their_verdicts(self, spark):
        rows, _ = _rows(spark)
        assert any(r.seen for r in rows), "seen-set never fired"
        assert any(not r.allowed for r in rows), "robots never fired"
        for r in rows:
            if r.seen or not r.allowed:
                assert r.rk == -1 and not r.selected

    def test_admitted_ranks_are_dense_per_host(self, spark):
        rows, _ = _rows(spark)
        by_host: dict[str, list[int]] = {}
        for r in rows:
            if r.rk != -1:
                host = r.url.split("/")[0]
                by_host.setdefault(host, []).append(r.rk)
        for host, rks in by_host.items():
            assert sorted(rks) == list(range(1, len(rks) + 1)), host

    def test_seen_matches_prev_snapshot_arithmetic(self, spark):
        rows, docs = _rows(spark)
        prev = {
            (r.doc_id * PREV_MULT) % ID_SPACE
            for r in docs.select("doc_id").collect()
            if r.doc_id % 3 == 0
        }
        for r in rows:
            assert r.seen == (r.cand_id in prev)

    def test_ranking_prefers_higher_in_degree(self, spark):
        rows, _ = _rows(spark)
        by_host: dict[str, list] = {}
        for r in rows:
            if r.rk != -1:
                by_host.setdefault(r.url.split("/")[0], []).append(r)
        checked = 0
        for rs in by_host.values():
            rs.sort(key=lambda r: r.rk)
            for a, b in zip(rs, rs[1:]):
                assert (a.n_proposers, -a.cand_id) >= (
                    b.n_proposers, -b.cand_id
                )
                checked += 1
        assert checked > 0


class TestFetchSchedule:
    def test_offsets_follow_rank_times_crawl_delay(self, spark):
        from pdf_extractor_spark.functions.robots import profile_delays

        delays = profile_delays()
        rows, _ = _rows(spark)
        scheduled = 0
        for r in rows:
            if r.selected:
                delay = delays[(r.cand_id // 7) % 2]
                assert r.fetch_offset_s == (r.rk - 1) * delay
                scheduled += 1
            else:
                assert r.fetch_offset_s == -1
        assert scheduled > 0
        # non-vacuous: both profiles' delays must appear in the batch
        offs = {
            r.fetch_offset_s for r in rows if r.selected and r.rk == 2
        }
        assert offs == set(delays.values())


class TestSelectTopk:
    def test_group_limit_in_plan_and_exact_results(self, spark):
        """The frontier docstring's skew claim: a declared window +
        ``rk <= k`` filter gets Catalyst's WindowGroupLimit rewrite
        (map-side per-group prune) — pinned here so a Spark upgrade
        that drops the rewrite is caught."""
        from pyspark.sql import Window, functions as F

        cands = spark.range(500).select(
            F.col("id").alias("cand_id"),
            F.expr("concat('h', cast(pmod(id, 7) as string))")
            .alias("host"),
            F.expr("cast(pmod(id * 37, 100) as int)").alias("prio"),
        )
        w = Window.partitionBy("host").orderBy(
            F.col("prio").desc(), F.col("cand_id")
        )
        out = (cands.withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") <= 3))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Catalyst's rewrite: partial map-side group limit BEFORE the
        # exchange + final after — the skew-immune selection shape
        # (measured in scripts/frontier_skew_bench.py)
        assert plan.count("WindowGroupLimit") >= 2
        rows = out.collect()
        by_host: dict[str, list] = {}
        for r in cands.collect():
            by_host.setdefault(r.host, []).append(r)
        for host, rs in by_host.items():
            rs.sort(key=lambda r: (-r.prio, r.cand_id))
            expect = [(r.cand_id, i + 1) for i, r in enumerate(rs[:3])]
            got = sorted(
                (r.cand_id, r.rk) for r in rows if r.host == host
            )
            assert got == sorted(expect), host


class TestBloomVariant:
    def test_bloom_output_identical_to_exact(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        exact = sorted(map(tuple, frontier_batch(docs).collect()))
        bloom = sorted(map(tuple, frontier_batch(
            docs, seen_mode="bloom"
        ).collect()))
        # fixture fill factor ⇒ FP rate ~1e-11: the swap is drop-in
        assert bloom == exact

    def test_bloom_plan_has_no_seen_join(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_crawl_frontier_bloom"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the ONLY hash join left is the robots rule broadcast; the
        # seen verdict is a scan-local probe against the 1-row map
        assert plan.count("BroadcastHashJoin") == 1
        assert plan.count("SortMergeJoin") == 0
        assert plan.count("BroadcastNestedLoopJoin") == 1

    def test_unknown_mode_rejected(self, spark):
        import pytest

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        with pytest.raises(ValueError, match="seen_mode"):
            frontier_batch(docs, seen_mode="psychic")


class TestPlan:
    def test_single_pass_no_self_join(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_crawl_frontier"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # two doc_id-only corpus scans (candidates + prev snapshot),
        # both joins broadcast, no verdict-subplan recomputation
        assert len(re.findall(r"ReadSchema: struct<", plan)) == 2
        assert set(re.findall(r"ReadSchema: struct<([^>]*)>", plan)) \
            == {"doc_id:bigint"}
        assert plan.count("BroadcastHashJoin") == 2
        assert plan.count("SortMergeJoin") == 0
        assert plan.count("CartesianProduct") == 0
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 3
