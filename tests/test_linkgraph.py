"""Host-level PageRank (functions/linkgraph.py): engine equality,
fixed-point mass invariants, and the plan shape that makes the
iterative job scale (corpus read once, text never scanned, no
cartesian joins, lineage truncated per iteration)."""

from __future__ import annotations

import re

import duckdb
import pytest

from pdf_extractor_spark.functions.linkgraph import (
    N_HOSTS,
    TOTAL_FP,
    duck_pagerank_sql,
    host_pagerank,
    synth_outlink_edges,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestPagerankSemantics:
    def test_matches_duckdb_twin_bit_exact(self, spark, docs):
        got = {(r.host, r.rank_fp) for r in host_pagerank(docs).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'"
        )
        want = set(map(tuple, con.execute(duck_pagerank_sql()).fetchall()))
        assert got == want

    def test_mass_conserved_up_to_floor_losses(self, spark, docs):
        rows = host_pagerank(docs).collect()
        assert len(rows) == N_HOSTS
        tot = sum(r.rank_fp for r in rows)
        # every div floors, so mass only leaks downward, bounded by
        # one unit per division per iteration: one per edge
        # (contribution), one per node (teleport), one per node
        # (dangling share), plus the initial per-node seed division
        n_edges = synth_outlink_edges(docs).count()
        bound = N_HOSTS + 3 * (n_edges + 2 * N_HOSTS)
        assert tot <= TOTAL_FP
        assert tot >= TOTAL_FP - bound
        assert all(r.rank_fp > 0 for r in rows)

    def test_no_self_edges_by_construction(self, spark, docs):
        edges = synth_outlink_edges(docs)
        assert edges.where("src = dst").count() == 0

    def test_dangling_mass_redistributed_and_engines_agree(self, spark):
        """Every fixture SF has ≥ N_HOSTS docs, so the dangling path
        never fires on real data — exercise it with a 30-doc frame
        (hosts 30..100 receive links but have no outlinks). Dangling
        mass must be redistributed (total conserved up to floor
        losses), and the DuckDB twin must still agree bit-exactly."""
        docs = spark.createDataFrame(
            [(i,) for i in range(30)], "doc_id long"
        )
        edges = synth_outlink_edges(docs)
        srcs = {r.src for r in edges.select("src").distinct().collect()}
        assert srcs != set(range(N_HOSTS))  # dangling hosts exist
        rows = host_pagerank(docs).collect()
        tot = sum(r.rank_fp for r in rows)
        assert TOTAL_FP - 10_000 <= tot <= TOTAL_FP
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            "SELECT unnest(range(30)) AS doc_id"
        )
        want = set(map(tuple, con.execute(duck_pagerank_sql()).fetchall()))
        assert {(r.host, r.rank_fp) for r in rows} == want


class TestPagerankPlan:
    def test_corpus_scan_reads_only_doc_id(self, spark, docs):
        # checkpoint=False exposes the FULL tree — with truncation on,
        # everything interesting hides behind the final LogicalRDD
        # and these assertions could never fire
        plan = (
            host_pagerank(docs, checkpoint=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        m = re.search(r"ReadSchema: ([^\n]*)", plan)
        assert m and "doc_id" in m.group(1) and "text" not in m.group(1)
        assert "CartesianProduct" not in plan

    def test_corpus_scanned_exactly_once(self, spark):
        # the module contract: ONE corpus pass, everything after runs
        # on the host-level aggregate. Count source evaluations with
        # an accumulator bumped per partition per pass.
        acc = spark.sparkContext.accumulator(0)
        base = spark.createDataFrame(
            [(i,) for i in range(300)], "doc_id long"
        )

        def bump(it):
            acc.add(1)
            return it

        probed = base.rdd.mapPartitions(bump).toDF(base.schema)
        n_parts = probed.rdd.getNumPartitions()
        host_pagerank(probed).collect()
        assert acc.value == n_parts, (acc.value, n_parts)

    def test_iterative_lineage_is_truncated(self, spark, docs):
        # each iteration's output is localCheckpointed, so the FINAL
        # frame's analyzed plan must bottom out at a checkpoint
        # boundary (LogicalRDD) with no parquet relation above it —
        # i.e. the corpus scan and earlier iterations are not
        # re-derived per iteration of a long production run
        lp = (
            host_pagerank(docs)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert "LogicalRDD" in lp
        assert "parquet" not in lp
