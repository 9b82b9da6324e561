"""Tests for the Z-order write-layout keys (functions/zorder.py):
the Morton interleave itself (against a bit-twiddling reference),
the locality guarantee the shard report claims, and the plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd

from pdf_extractor_spark.functions.zorder import (
    DUCK_SHIFT,
    SPARK_SHIFT,
    _morton_expr,
    duck_zorder_shard_sql,
    zorder_shard_report,
)


def _morton_ref(x: int, y: int) -> int:
    """Bit-by-bit reference interleave (x at even positions)."""
    z = 0
    for i in range(31):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


class TestMortonExpr:
    def test_matches_reference_in_duckdb(self):
        con = duckdb.connect()
        expr = _morton_expr("x", "y", DUCK_SHIFT)
        cases = [
            (0, 0), (1, 0), (0, 1), (2**31 - 1, 0), (0, 2**31 - 1),
            (0x55555555 & 0x7FFFFFFF, 0x2AAAAAAA),
            (123456789, 987654321 & 0x7FFFFFFF),
        ]
        for x, y in cases:
            got = con.execute(
                f"SELECT {expr} FROM (SELECT {x}::BIGINT x, "
                f"{y}::BIGINT y)"
            ).fetchone()[0]
            assert got == _morton_ref(x, y), (x, y)

    def test_matches_reference_in_spark(self, spark):
        expr = _morton_expr("x", "y", SPARK_SHIFT)
        df = spark.createDataFrame(
            [(123456789, 456789123), (2**31 - 1, 1)], "x long, y long"
        )
        rows = df.selectExpr(f"x", "y", f"{expr} as z").collect()
        for r in rows:
            assert r.z == _morton_ref(r.x, r.y)

    def test_key_is_nonnegative(self):
        # 62-bit key: sign bit can never be set
        assert _morton_ref(2**31 - 1, 2**31 - 1) < 2**62


class TestShardReport:
    def test_both_dimensions_bounded(self, spark):
        # 64 hosts x 256 sequence steps; with 16 Z-shards each shard
        # must cover ~1/4 of hosts and ~1/4 of the sequence range —
        # the locality a single-column sort cannot give
        rows = [
            (h * 256 + s, "en", f"src{h:02d}")
            for h in range(64)
            for s in range(256)
            if (h * 256 + s) % 17 == 0
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, source string"
        )
        rep = zorder_shard_report(docs).collect()
        assert len(rep) == 16
        total_docs = sum(r.n_docs for r in rep)
        assert total_docs == len(rows)
        max_id = max(r[0] for r in rows)
        for r in rep:
            # bounded span in BOTH dimensions (generous 1/2 bound;
            # ideal is 1/4 + hash-split slack on the host side)
            assert r.seq_span <= max_id // 2 + 1
        # the host dimension: no shard may contain ALL hosts
        n_hosts_total = 64
        assert all(r.n_hosts < n_hosts_total for r in rep)

    def test_oracle_matches(self, spark):
        docs = spark.createDataFrame(
            [(i * 7, "en", f"s{i % 9}") for i in range(300)],
            "doc_id long, lang string, source string",
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        got = con.execute(duck_zorder_shard_sql()).fetchdf()
        want = zorder_shard_report(docs).toPandas()
        pd.testing.assert_frame_equal(
            want, got.astype(want.dtypes.to_dict())
        )

    def test_plan_is_codegen_map_plus_aggregate(self, spark):
        docs = spark.createDataFrame(
            [(i, "en", "s") for i in range(50)],
            "doc_id long, lang string, source string",
        )
        plan = (
            zorder_shard_report(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
        assert "HashAggregate" in plan
        # the morton math must never fall out of codegen into python
        assert "BatchEvalPython" not in plan
        assert "mapInPandas" not in plan.lower()
