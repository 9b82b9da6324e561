"""100k-document end-to-end extraction scale point (VERDICT r4 #6).

The scaling gate runs at 40k docs and the LSH bench at 100k rows;
this script anchors the 100 TB projection one more order up on the
EXTRACTION path itself: the sf0.1 ``documents`` table replicated
10x under distinct doc ids (100k docs), driven through BOTH branches
(HTML and PDF: payload synthesis → parse → layout → serialize =
200k extracted documents), recording

  * docs/sec end to end,
  * the per-partition ROW and OUTPUT-BYTE histogram of the
    extraction stage — the direct evidence that url-hash
    repartitioning keeps partition sizes level (no partition may
    carry a straggler-making multiple of the mean; the north rule's
    skew clause),

into ``BENCH_EXTRACT_100K.json`` at the repo root.

Run:  python scripts/extract_100k_bench.py  (env: SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SCALE_REPL", "10"))


def main() -> None:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.session import build_session
    from pdf_extractor_spark.sources.docwrap import (
        html_roundtrip,
        pdf_roundtrip,
    )

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app="extract100k", cores=cores,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(REPL - 1)))
        )
        .select(
            (F.col("doc_id") * REPL + F.col("rep")).alias("doc_id"),
            "text",
        )
        .repartition(cores * 2, F.col("doc_id"))
        .cache()
    )
    n_base = docs.count()
    n_docs = n_base * 2  # both branches

    # warm the JVM + Python worker pool on a slice
    html_roundtrip(docs.limit(cores * 4), num_partitions=cores).count()
    pdf_roundtrip(docs.limit(cores * 4), num_partitions=cores).count()

    parts = cores * 2
    t0 = time.perf_counter()
    both = html_roundtrip(docs, num_partitions=parts).unionByName(
        pdf_roundtrip(docs, num_partitions=parts)
    )
    both.select(
        "doc_id", F.length("extracted_text").alias("n")
    ).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    # partition histogram of the extraction stage: rows and output
    # bytes per physical partition (ONE extra pass, bounded result —
    # 2*parts rows collected, never documents)
    hist = (
        html_roundtrip(docs, num_partitions=parts)
        .unionByName(pdf_roundtrip(docs, num_partitions=parts))
        .select(
            F.spark_partition_id().alias("pid"),
            F.length("extracted_text").alias("n"),
        )
        .groupBy("pid")
        .agg(
            F.count("*").alias("rows"),
            F.sum("n").alias("out_bytes"),
        )
        .collect()
    )
    rows = sorted(r["rows"] for r in hist)
    bts = sorted(r["out_bytes"] for r in hist)
    summary = {
        "job": f"end-to-end extraction (html+pdf), {SF_DIR} x{REPL}",
        "n_docs_extracted": n_docs,
        "cores": cores,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2),
        "n_partitions": len(rows),
        "partition_rows": {
            "min": rows[0], "p50": rows[len(rows) // 2],
            "max": rows[-1],
            "max_over_mean": round(
                rows[-1] / statistics.mean(rows), 3
            ),
        },
        "partition_out_bytes": {
            "min": bts[0], "p50": bts[len(bts) // 2], "max": bts[-1],
            "max_over_mean": round(
                bts[-1] / statistics.mean(bts), 3
            ),
        },
    }
    out_name = f"BENCH_EXTRACT_{n_docs // 1000}K.json"
    (ROOT / out_name).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
