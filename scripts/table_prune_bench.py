"""Measured evidence for the snapshot table's pruning claim: a
point/range lookup on a range-clustered 10M-row table must cost a
FRACTION of the full scan proportional to the files planned, because
the manifest eliminates files before Spark opens them.

Two regimes, measured honestly:

- FEW LARGE FILES (20 x 500k): Spark's native row-group skipping
  already handles the range via pushed filters, so manifest pruning
  adds ~nothing — recorded as the negative control, because claiming
  a win here would be false.
- MANY SMALL FILES (200 x 50k — the shape per-batch streaming
  commits accrete before compaction): a manifest-less range read
  must OPEN every file to learn it can skip it (footer read + task
  per file), while the manifest plans the 2-3 relevant files without
  touching the rest. This is where the layer pays, and exactly the
  problem `compact()` exists to bound.

Writes one JSON line to BENCH_TABLE.json.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from pdf_extractor_spark.plans.session import build_session  # noqa: E402
from pdf_extractor_spark.sources import icetable as it  # noqa: E402

REGIMES = ((20, 500_000), (200, 50_000))


def best_of(fn, n=3):
    times = []
    for _ in range(n):
        t = time.time()
        out = fn()
        times.append(time.time() - t)
    return min(times), out


def run_regime(spark, n_files: int, rows_per_file: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="table_bench_")
    path = f"{tmp}/t"
    # build all files in ONE Spark write (range-clustered), then
    # commit them as a table — 200 sequential appends would measure
    # commit overhead, not scan pruning
    total = n_files * rows_per_file
    df = spark.range(total).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("host_bucket"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    clustered = df.repartitionByRange(n_files, "doc_id")
    it.create_table(clustered, path, ["doc_id"])

    lo = int(total * 0.40) + 1
    hi = int(total * 0.49) - 1
    pred = ("doc_id", "between", (lo, hi))
    n_planned = len(it.plan_files(path, pred))

    pruned_s, pruned_rows = best_of(
        lambda: it.read_table(spark, path, pred)
        .where(F.col("doc_id").between(lo, hi))
        .agg(F.count("*").alias("c"), F.sum("host_bucket"))
        .collect()[0][0]
    )
    unpruned_s, unpruned_rows = best_of(
        lambda: it.read_table(spark, path)
        .where(F.col("doc_id").between(lo, hi))
        .agg(F.count("*").alias("c"), F.sum("host_bucket"))
        .collect()[0][0]
    )
    assert pruned_rows == unpruned_rows
    out = {
        "n_files": n_files,
        "files_planned_for_range": n_planned,
        "range_via_manifest_s": round(pruned_s, 3),
        "range_via_full_scan_s": round(unpruned_s, 3),
        "rows_in_range": pruned_rows,
        "speedup_vs_unpruned": round(unpruned_s / pruned_s, 2),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    spark = build_session(
        cores=8, extra={"spark.ui.showConsoleProgress": "false"}
    )
    out = {
        "metric": "table_stats_pruning",
        "n_rows": REGIMES[0][0] * REGIMES[0][1],
        "regimes": [run_regime(spark, n, r) for n, r in REGIMES],
    }
    print(json.dumps(out))
    pathlib.Path("BENCH_TABLE.json").write_text(
        json.dumps(out) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
