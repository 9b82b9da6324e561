"""DSIR importance weighting: frozen-target scoring semantics and the
100 TB plan shape."""

from __future__ import annotations

import re

import pytest

from pdf_extractor_spark.functions.dsir import (
    KEEP_AT_LEAST,
    NUM_BUCKETS,
    TARGET_BUCKETS,
    _bucket,
    dsir_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestScoring:
    def test_target_dense_doc_outranks_target_free_doc(self, spark):
        rows = [
            (1, "vector query stream batch vector query hash join"),
            (2, "the of and to in a is for on that with as by at"),
        ]
        got = {r.doc_id: r for r in dsir_weights(
            _docs(spark, rows)).collect()}
        # KEEP_AT_LEAST is calibrated to the fixture corpus's bucket
        # occupancy and doesn't transfer to a 2-doc corpus — assert
        # the ordering here, the keep split on the real table below.
        assert got[1].avg_w > got[2].avg_w

    def test_keep_splits_fixture_corpus_nonvacuously(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = dsir_weights(docs).collect()
        kept = sum(1 for r in rows if r.keep)
        assert 0 < kept < len(rows)
        lo = min(r.avg_w for r in rows if r.keep)
        hi = max(r.avg_w for r in rows if not r.keep)
        assert lo >= KEEP_AT_LEAST > hi

    def test_empty_doc_scores_zero_and_drops(self, spark):
        rows = [(1, ""), (2, "vector query vector query vector")]
        got = {r.doc_id: r for r in dsir_weights(
            _docs(spark, rows)).collect()}
        # "" splits to [''] — one feature, never a target bucket
        assert got[1].avg_w < got[2].avg_w and not got[1].keep

    def test_bucket_freeze_matches_duckdb_md5(self):
        import duckdb

        con = duckdb.connect()
        for gram in ("vector", "hash join", "window agg"):
            duck = con.execute(
                "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)"
                f" % {NUM_BUCKETS}", [gram]
            ).fetchone()[0]
            assert _bucket(gram) == duck

    def test_target_buckets_fold_collisions(self):
        assert len(TARGET_BUCKETS) <= 16
        assert all(c > 0 for _, c in TARGET_BUCKETS)
        assert KEEP_AT_LEAST > 0


class TestPlanShape:
    def test_text_never_shuffles_and_bucket_table_broadcasts(
        self, spark
    ):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_dsir_weights"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        for keys in re.findall(
            r"Exchange hashpartitioning\(([^)]*)\)", plan
        ):
            assert "text" not in keys
        assert plan.count("BroadcastExchange") >= 2  # target + w probe
