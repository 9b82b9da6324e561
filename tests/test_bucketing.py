"""Bucketed co-located joins: the pre-shuffled storage layout must
produce a zero-Exchange join plan (the 100 TB repeated-join story)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = docs.select(
        "doc_id", F.length("text").alias("n_chars_computed")
    )
    write_bucketed(docs, "tb_docs", "doc_id", n_buckets=8)
    write_bucketed(stats, "tb_stats", "doc_id", n_buckets=8)
    yield "tb_docs", "tb_stats"
    spark.sql("DROP TABLE IF EXISTS tb_docs")
    spark.sql("DROP TABLE IF EXISTS tb_stats")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "doc_id")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: no shuffle


def test_bucketed_join_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "doc_id")
    rows = joined.select("doc_id", "n_chars", "n_chars_computed").collect()
    assert len(rows) == spark.table(left).count()
    assert all(r.n_chars == r.n_chars_computed for r in rows)


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join without bucketing shuffles both sides."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = docs.select(
        "doc_id", F.length("text").alias("n_chars_computed")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = docs.join(stats, "doc_id")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" in plan
