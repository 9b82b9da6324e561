"""Crawl-trap detection: the cycle predicate on hand-built paths,
host verdicts on the fixture, and the no-path-shuffle plan."""

from __future__ import annotations

from pdf_extractor_spark.functions.traps import (
    synth_paths,
    trap_report,
)

SF = "/root/testdata/sf0.001"


class TestCyclePredicate:
    def test_hand_built_paths(self, spark):
        cases = [
            ("/cal/2020/cal/2020", True),          # two-segment unit
            ("/a/a/a/a", True),                    # one-segment via unit
            ("/cal/2020/cal/2021", False),         # values differ
            ("/p/3/v7", False),                    # too short
            ("/x/y/z/x/y/z", False),               # period-3, NOT adjacent-2
            ("/u/tag/x/tag/x", True),              # cycle mid-path
            ("/", False),                          # degenerate
        ]
        df = spark.createDataFrame(
            [(f"h{i}.example", p) for i, (p, _) in enumerate(cases)],
            ["host", "path"],
        )
        rows = {r.host: r for r in trap_report(df).collect()}
        for i, (path, want) in enumerate(cases):
            got = rows[f"h{i}.example"].cycle_pages == 1
            assert got == want, path


class TestHostVerdicts:
    def test_trap_hosts_flagged_stray_cycles_not(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = {r.host: r for r in
                trap_report(synth_paths(docs)).collect()}
        assert len(rows) == 20
        for host, r in rows.items():
            idx = int(host.removeprefix("site").removesuffix(
                ".example"))
            if idx % 7 == 3:   # calendar-trap hosts: 80% cyclic
                assert r.is_trap, host
                assert r.cycle_pages * 2 >= r.n_pages
                assert r.max_depth >= 4
            else:              # stray /tag/x/tag/x never flips a host
                assert not r.is_trap, host
                assert r.cycle_pages <= 1


class TestPlan:
    def test_path_strings_never_cross_an_exchange(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_crawl_traps"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        for seg in plan.split("Exchange hashpartitioning")[1:]:
            head = seg.split("\n")[0]
            for col in ("path#", "segs#"):
                assert col not in head, head
