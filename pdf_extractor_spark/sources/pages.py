"""Pages-table sources + checkpoint-resume sink (SURVEY.md §2.1).

The production design targets an Iceberg table (``MERGE INTO ... WHEN
NOT MATCHED THEN INSERT`` keyed on url — S5); this sandbox has no
Iceberg runtime jars, so the sink is a parquet directory with the SAME
merge semantics realized as **anti-join before compute + append after**
(documented fallback, SURVEY.md §7.2 stage 5). The resume contract is
identical: a re-run processes only urls absent from the output, so
re-runs are idempotent — no duplicates, no loss.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA_DDL)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Iceberg stand-in: ``spark.read.format("iceberg").load(tbl)`` in
    production; parquet directory here. Partition/file pruning and
    column pruning are native either way."""
    return spark.read.parquet(path)


def write_pages(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def _output_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        name.endswith(".parquet") for name in os.listdir(path)
    )


def resume_filter(
    pages: DataFrame, spark: SparkSession, out_path: str
) -> DataFrame:
    """S5/S6 checkpoint resume: anti-join the work list against already-
    extracted urls. Equivalent to Iceberg MERGE's NOT MATCHED branch.

    The completed-url side projects a single string column before the
    join; at 10^12 rows this is a shuffled left-anti hash join on the
    url key — never a broadcast of the big side.
    """
    if not _output_exists(out_path):
        return pages
    done = spark.read.parquet(out_path).select("url")
    return pages.join(done, "url", "left_anti")


def read_pages_binary(
    spark: SparkSession, dir_path: str, glob: str = "*.{pdf,html}"
) -> DataFrame:
    """S1's loose-file mapping (reference ``processor.py:63-71``
    recursive ``*.pdf`` scan): read a directory of raw documents with
    the native binaryFile source and present them in the pages schema
    (``url`` = file path, ``warc_ts`` = modificationTime, ``text`` and
    ``lang`` null — the extractor derives them).

    ``recursiveFileLookup`` mirrors the reference's ``rglob``; listing
    and file pruning stay on the driver/JVM side, payloads are read by
    executors (never collected)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(dir_path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def append_extracted(extracted: DataFrame, out_path: str) -> None:
    """Append new results (the INSERT branch of the MERGE)."""
    extracted.write.mode("append").parquet(out_path)


def upsert_extracted(
    spark: SparkSession, batch: DataFrame, out_path: str
) -> None:
    """The MERGE ``WHEN MATCHED`` branch for RE-CRAWLED pages: a new
    extraction of an existing url replaces the stored row iff its
    ``warc_ts`` is strictly newer; otherwise the stored row wins.
    (``run_extraction_job``'s anti-join covers only the NOT MATCHED
    insert path — first-crawl semantics.)

    Iceberg would express this as ``MERGE INTO extracted USING batch
    ON url WHEN MATCHED AND batch.warc_ts > extracted.warc_ts THEN
    UPDATE WHEN NOT MATCHED THEN INSERT``; the parquet stand-in
    resolves per-url winners with one window over the union (over the
    batch alone on first write — a batch carrying several crawls of
    one url still keeps exactly the newest) and swaps directories via
    two renames, so the merged data always exists on disk: a crash
    between the renames leaves it in ``<out>.__merge_old__`` /
    ``.__merge_tmp__`` rather than lost. Deterministic tie-break:
    newer warc_ts wins, then the incoming row."""
    import shutil

    from pyspark.sql.window import Window

    incoming = batch.withColumn("_src", F.lit(1))
    if _output_exists(out_path):
        existing = spark.read.parquet(out_path).withColumn(
            "_src", F.lit(0)
        )
        union = existing.unionByName(incoming)
    else:
        union = incoming
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc("_src")
    )
    merged = (
        union.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .drop("_rn", "_src")
    )
    tmp = out_path.rstrip("/") + ".__merge_tmp__"
    old = out_path.rstrip("/") + ".__merge_old__"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(out_path):
        os.rename(out_path, old)
    os.rename(tmp, out_path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def write_report_csv(extracted: DataFrame, path: str) -> None:
    """S8 CSV report sink (reference ``batch_processor.py:320-362``:
    per-document comparison report ordered by quality desc — O7).
    Scalar projection of the extraction record; a single CSV directory
    written by executors (never collected to the driver)."""
    report = extracted.select(
        "url",
        "branch",
        "ok",
        F.col("quality.score").alias("score"),
        F.col("quality.grade").alias("grade"),
        F.col("quality.status").alias("status"),
        "n_pages",
        "bytes_in",
        "chars_out",
        F.size("errors").alias("n_errors"),
    ).orderBy(F.desc("score"), F.asc("url"))
    report.write.mode("overwrite").option("header", "true").csv(path)


def write_report_html(
    extracted: DataFrame, path: str, top_n: int = 100
) -> None:
    """S8 HTML report sink (reference ``batch_processor.py:339-362``:
    human-readable run summary). Unlike the row-level CSV report this
    is a SUMMARY artifact: one aggregate row plus the ``top_n``
    best/worst documents — the only part of a 10^12-row run a human
    reads, so collecting it to the driver is correct (bounded by
    ``top_n``, never by corpus size). The input is persisted around
    the two driver actions so the (expensive) upstream extraction
    plan executes once, not twice."""
    from html import escape

    extracted = extracted.persist()
    try:
        agg = extracted.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
            F.round(F.avg("quality.score"), 2).alias("avg_score"),
            F.sum("chars_out").alias("chars_out"),
        ).collect()[0]
        rows = (
            extracted.select(
                "url", "branch", F.col("quality.score").alias("score"),
                F.col("quality.grade").alias("grade"),
            )
            .orderBy(F.desc("score"), F.asc("url"))
            .limit(top_n)
            .collect()
        )
    finally:
        extracted.unpersist()

    def esc(s: object) -> str:
        return escape(str(s), quote=False)

    body = "\n".join(
        f"<tr><td>{esc(r.url)}</td><td>{esc(r.branch)}</td>"
        f"<td>{r.score:.1f}</td><td>{esc(r.grade)}</td></tr>"
        for r in rows
    )
    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>extraction report</title></head><body>"
        f"<h1>Extraction report</h1>"
        f"<p>docs: {agg.n_docs} ok: {agg.n_ok} "
        f"avg score: {agg.avg_score} chars out: {agg.chars_out}</p>"
        "<table border='1'><tr><th>url</th><th>branch</th>"
        f"<th>score</th><th>grade</th></tr>{body}</table>"
        "</body></html>"
    )
    import pathlib as _pl

    p = _pl.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(html, encoding="utf-8")


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    metrics_path: str | None = None,
    num_partitions: int = 32,
) -> None:
    """End-to-end job: resume-filter → extract → append + metrics.

    This is the body that ``spark-submit --py-files`` runs on a cluster
    (``scripts/submit_job.py``).
    """
    from ..plans.pipeline import extract_pages, metrics_from_extracted

    todo = resume_filter(pages, spark, out_path)
    extracted = extract_pages(todo, num_partitions=num_partitions)
    append_extracted(extracted, out_path)
    if metrics_path:
        metrics = metrics_from_extracted(spark.read.parquet(out_path))
        metrics.write.mode("overwrite").parquet(metrics_path)
