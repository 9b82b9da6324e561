"""Bloom-filter URL seen-set: no-false-negative guarantee, scan-local
probe plan, and filter sizing."""

from __future__ import annotations

import re

from pdf_extractor_spark.functions.bloom import (
    K_HASHES,
    M_BITS,
    N_WORDS,
    bloom_seen_report,
)


class TestSemantics:
    def test_no_false_negatives_and_fixture_exact(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = bloom_seen_report(docs).collect()
        assert len(rows) == docs.count()
        # every previous-snapshot URL must hit (Bloom guarantee)
        assert all(r.seen for r in rows if r.in_old)
        # at the fixture fill factor (~375*5/129024 ≈ 1.5%) the FP
        # chance per fresh URL is ~1e-9 — assert exactness here,
        # while the operator's contract allows false positives
        assert all(not r.seen for r in rows if not r.in_old)

    def test_deterministic_across_runs(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        a = sorted(map(tuple, bloom_seen_report(docs).collect()))
        b = sorted(map(tuple, bloom_seen_report(docs).collect()))
        assert a == b

    def test_sizing(self):
        assert M_BITS == N_WORDS * 63
        assert K_HASHES == 5


class TestPlanShape:
    def test_probe_side_shuffles_nothing(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_bloom_seen"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # build side: one bounded bit_or aggregate (word-keyed) plus
        # the single-row map fold; probe side: broadcast + forall —
        # the ONLY hash exchanges allowed are the ≤N_WORDS-group
        # build aggregate and the 1-row map collect
        keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert len(keys) <= 1, keys           # the bit_or aggregate
        assert "BroadcastExchange" in plan
        assert "SinglePartition" in plan      # the 1-row map fold
