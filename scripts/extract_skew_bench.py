"""Extraction-stage skew evidence: salted size-routing vs crawl-order
layout.

BASELINE.md claims the single-exchange salted routing key
(`plans/pipeline.py::_routing_key`) defuses the oversized-document
straggler that AQE cannot fix (AQE splits shuffle partitions, not a
running map task). This script MEASURES it:

- corpus: ``N_NORMAL`` ordinary fixture-grammar PDFs plus
  ``N_OVERSIZED`` parse-heavy multi-page ones, in CRAWL ORDER — the
  oversized batch contiguous at the tail, exactly how one host's big
  PDFs arrive in a WARC segment;
- variant A (``crawl_order``): tasks are contiguous crawl-position
  ranges (``repartitionByRange`` on the position column — the layout
  a no-shuffle scan of segment files inherits), so one task owns the
  whole oversized batch;
- variant B (``routed``): the production ``extract_pages`` exchange
  on the size-salted key.

The oversized threshold is scaled to the bench corpus via
``dataclasses.replace`` (production default 8 MiB; the ROUTING
behavior, not the byte constant, is what's under test). Per-partition
wall times come from the pipeline's own lineage columns
(``metrics_from_extracted``) — the same instrumentation the
production job ships. Straggler factor = max / median wall across
tasks.

Writes BENCH_EXTRACT_SKEW.json (override with SKEW_OUT).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib
import statistics
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pandas as pd  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parents[1]
N_NORMAL = int(os.environ.get("SKEW_NORMAL", "2000"))
N_OVERSIZED = int(os.environ.get("SKEW_OVERSIZED", "12"))
PARTS = int(os.environ.get("SKEW_PARTS", "16"))
OUT = os.environ.get("SKEW_OUT", str(ROOT / "BENCH_EXTRACT_SKEW.json"))


def build_corpus() -> pd.DataFrame:
    import datetime as dt

    from pdf_extractor_spark.operators.pdf_generator import (
        PageSpec,
        build_pdf,
    )

    def normal_doc(i: int) -> bytes:
        p = PageSpec()
        for row in range(8):
            p.put_words(
                72, 90 + 28 * row, 12,
                [f"d{i}r{row}w{w}" for w in range(9)],
            )
        return build_pdf([p], compress=True)

    def oversized_doc(i: int) -> bytes:
        # ~60 pages x dense rows -> a parse-time outlier whose BYTES
        # also clear the (bench-scaled) oversized threshold
        pages = []
        for pno in range(60):
            p = PageSpec()
            for row in range(22):
                p.put_words(
                    60, 60 + 30 * row, 11,
                    [f"big{i}p{pno}r{row}w{w}" for w in range(10)],
                )
            pages.append(p)
        return build_pdf(pages)  # uncompressed: bytes reflect weight

    ts = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(N_NORMAL):
        rows.append(
            {"seq": i, "url": f"https://host{i % 97}.test/doc{i}",
             "warc_ts": ts, "html": normal_doc(i), "text": "",
             "lang": "en"}
        )
    # crawl order: the oversized batch arrives contiguously at the end
    for i in range(N_OVERSIZED):
        rows.append(
            {"seq": N_NORMAL + i,
             "url": f"https://bighost.test/report{i}", "warc_ts": ts,
             "html": oversized_doc(i), "text": "", "lang": "en"}
        )
    return pd.DataFrame(rows)


def summarize(metrics_df) -> dict:
    walls = [r["wall_ms"] for r in metrics_df.collect()]
    med = statistics.median(walls) or 1
    return {
        "n_tasks": len(walls),
        "max_wall_ms": max(walls),
        "median_wall_ms": med,
        "straggler_factor": round(max(walls) / med, 2),
        "total_wall_ms": sum(walls),
    }


def main() -> None:
    from pdf_extractor_spark.config import DEFAULT_CONFIG
    from pdf_extractor_spark.plans.pipeline import (
        OUTPUT_SCHEMA,
        _make_extract_iter,
        extract_pages,
        metrics_from_extracted,
    )
    from pdf_extractor_spark.plans.session import build_session

    spark = build_session(
        cores=PARTS,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    pdf = build_corpus()
    sizes = pdf.html.str.len()
    # bench-scaled threshold: between the normal and oversized sizes
    threshold = int(sizes[: N_NORMAL].max()) * 4
    cfg = dataclasses.replace(DEFAULT_CONFIG, oversize_bytes=threshold)
    n_over = int((sizes > threshold).sum())
    assert n_over == N_OVERSIZED, (n_over, threshold)
    # schema = pages table + the crawl-position column the range
    # variant partitions on (a real scan gets this layout for free)
    pages = spark.createDataFrame(pdf).persist()
    pages.count()

    results = {
        "n_docs": len(pdf), "n_oversized": N_OVERSIZED, "parts": PARTS,
        "oversize_threshold_bytes": threshold,
        "oversized_doc_bytes": int(sizes[N_NORMAL:].median()),
    }

    fn = _make_extract_iter(cfg)
    crawl = (
        pages.repartitionByRange(PARTS, "seq")
        .select("url", "warc_ts", "html")
        .mapInPandas(fn, OUTPUT_SCHEMA)
    )
    results["crawl_order"] = summarize(metrics_from_extracted(crawl))
    print("crawl_order:", results["crawl_order"])

    routed = extract_pages(pages, num_partitions=PARTS, cfg=cfg)
    results["routed"] = summarize(metrics_from_extracted(routed))
    print("routed:     ", results["routed"])

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
