"""The extraction pipeline: pages table → extracted + metrics tables.

Physical plan (SURVEY.md §3.4):

    read pages (column-pruned: url, warc_ts, html)
      → anti-join vs existing output          (checkpoint resume, S5/S6)
      → size-routed repartition by url-hash   (skew defusal, SURVEY §4.2)
      → mapInPandas(extract_batch)            (ONE fused Arrow stage)
      → append extracted; metrics = groupBy(part_id) rollup

Skew handling: AQE cannot split a straggler *map* task, so layout is
explicit — documents larger than ``cfg.oversize_bytes`` are routed to
their own repartition pass (few rows per partition) while the long tail
hashes uniformly by ``xxhash64(url)``. At 100 TB the same layout holds:
the oversized stream is a tiny fraction of rows and gets dedicated
tasks instead of hiding inside hash buckets.

Lineage: every output row carries (part_id, batch_id, batch_ms,
attempt, host, extracted_at); per-partition metrics rows are an
aggregation over those columns (north_rule "per-partition lineage +
extraction metrics rows").
"""

from __future__ import annotations

import datetime as dt
import socket
import time
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..operators.document import extract_document

SPAN_TYPE = T.StructType(
    [
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("page", T.IntegerType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("branch", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField(
            "tables",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("page", T.IntegerType()),
                        T.StructField("rows", T.IntegerType()),
                        T.StructField("cols", T.IntegerType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("confidence", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "footnotes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("marker", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("page", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "quality",
            T.StructType(
                [
                    T.StructField("score", T.DoubleType()),
                    T.StructField("grade", T.StringType()),
                    T.StructField("coverage", T.DoubleType()),
                    T.StructField("status", T.StringType()),
                    # A6 per-dimension sub-scores (quality_scorer.py
                    # five-dim battery)
                    T.StructField(
                        "dims", T.MapType(T.StringType(), T.DoubleType())
                    ),
                ]
            ),
        ),
        # C7/F11 sidebar textboxes
        T.StructField(
            "textboxes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("page", T.IntegerType()),
                        T.StructField("box_type", T.StringType()),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        ),
        # A3 element inventory — fixed key set (operators/inventory.py)
        T.StructField(
            "inventory", T.MapType(T.StringType(), T.LongType())
        ),
        # A5 footnote completeness
        T.StructField(
            "footnote_stats",
            T.StructType(
                [
                    T.StructField("n_markers", T.IntegerType()),
                    T.StructField("n_definitions", T.IntegerType()),
                    T.StructField("n_matched", T.IntegerType()),
                    T.StructField("match_rate", T.DoubleType()),
                    T.StructField("status", T.StringType()),
                    # D4 unmatched sets (reference
                    # footnote_extractor.py:418-422) — the review-queue
                    # payload, not just counts
                    T.StructField(
                        "unmatched_markers", T.ArrayType(T.StringType())
                    ),
                    T.StructField(
                        "unmatched_definitions",
                        T.ArrayType(T.StringType()),
                    ),
                ]
            ),
        ),
        T.StructField(
            "errors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("severity", T.StringType()),
                        T.StructField("page", T.IntegerType()),
                        T.StructField("message", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("chars_out", T.LongType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("batch_id", T.IntegerType()),
        T.StructField("batch_ms", T.LongType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("host", T.StringType()),
        T.StructField("extracted_at", T.TimestampType()),
    ]
)

METRICS_SCHEMA_COLS = [
    "part_id", "n_docs", "n_ok", "n_failed", "bytes_in", "chars_out",
    "wall_ms", "host", "attempt",
]

_FAIL_SEVERITIES = {"error", "critical"}


def _make_extract_iter(cfg: ExtractConfig):
    """Returns the mapInPandas function: Iterator[pdf] → Iterator[pdf].

    Per Arrow batch: vectorize the per-document kernel over rows, stamp
    lineage columns. All heavy work happens on payload bytes already in
    the Python worker (one JVM↔Python hop per batch, SURVEY.md §3.4).
    """

    def extract_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        part_id = tc.partitionId() if tc else -1
        attempt = tc.attemptNumber() if tc else 0
        host = socket.gethostname()
        for batch_id, pdf in enumerate(batches):
            t0 = time.perf_counter()
            recs = [extract_document(payload, cfg) for payload in pdf["html"]]
            batch_ms = int((time.perf_counter() - t0) * 1000)
            now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            out = pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "warc_ts": pdf["warc_ts"].to_numpy(),
                    "branch": [r["branch"] for r in recs],
                    "extracted_text": [r["extracted_text"] for r in recs],
                    "spans": [
                        [
                            {"start": s[0], "end": s[1], "kind": s[2],
                             "page": s[3]}
                            for s in r["spans"]
                        ]
                        for r in recs
                    ],
                    "tables": [r["tables"] for r in recs],
                    "footnotes": [r["footnotes"] for r in recs],
                    "textboxes": [r["textboxes"] for r in recs],
                    "quality": [r["quality"] for r in recs],
                    "inventory": [r["inventory"] for r in recs],
                    "footnote_stats": [r["footnote_stats"] for r in recs],
                    "errors": [r["errors"] for r in recs],
                    "ok": [
                        not any(
                            e["severity"] in _FAIL_SEVERITIES
                            for e in r["errors"]
                        )
                        for r in recs
                    ],
                    "n_pages": [r["n_pages"] for r in recs],
                    "bytes_in": [len(p) for p in pdf["html"]],
                    "chars_out": [len(r["extracted_text"]) for r in recs],
                    "part_id": part_id,
                    "batch_id": batch_id,
                    "batch_ms": batch_ms,
                    "attempt": attempt,
                    "host": host,
                    "extracted_at": now,
                }
            )
            yield out

    return extract_iter


def partition_pages(
    pages: DataFrame,
    num_partitions: int,
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> tuple[DataFrame, DataFrame]:
    """Size classifier — returns the (normal, oversized) split used by
    the routing key. Kept as an inspectable API; the execution path is
    :func:`extract_pages`'s single-scan composite key, NOT a physical
    two-branch plan (which would scan the 100 TB pages table twice)."""
    size = F.length(F.col("html"))
    normal = pages.where(size <= cfg.oversize_bytes)
    oversized = pages.where(size > cfg.oversize_bytes)
    return normal, oversized


def _routing_key(num_partitions: int, cfg: ExtractConfig):
    """Skew-defusing shuffle key, evaluated in ONE scan, at FULL hash
    cardinality.

    Normal docs key on ``xxhash64(url)``; oversized docs key on an
    independently-salted ``xxhash64(url, 1)``, so a multi-hundred-MB
    payload's placement is decorrelated from its url's normal bucket
    (SURVEY.md §4.2 — AQE cannot split a straggler map task, so the
    layout must spread the heavy tail up front).

    Both sides keep the full 64-bit value range: an earlier variant
    pre-modded each side down to ~P distinct strings, which
    ``repartition`` then re-hashed mod P — balls-in-bins collisions
    left ~1/3 of partitions empty and stacked 2-3 bucket-groups (or an
    oversized bucket on top of a full normal bucket) into others.
    Full-cardinality keys restore uniform balance; the salt still
    guarantees oversized rows spread independently (~Poisson(1) per
    partition when oversized ≪ P) rather than pinning to their url's
    bucket."""
    size = F.length(F.col("html"))
    return F.when(
        size > cfg.oversize_bytes, F.xxhash64("url", F.lit(1))
    ).otherwise(F.xxhash64("url"))


def extract_pages(
    pages: DataFrame,
    num_partitions: int = 32,
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """pages(url, warc_ts, html, ...) → extracted DataFrame.

    Column-prunes to exactly (url, warc_ts, html) before the exchange so
    the shuffle and the Arrow transfer never carry unused columns. ONE
    scan, ONE exchange: size routing happens inside the shuffle key
    (:func:`_routing_key`), not as separate filtered branches — a
    two-branch plan would read the full pages table twice (binary
    length has no parquet stats, so neither filter prunes row groups).
    """
    pruned = pages.select("url", "warc_ts", "html")
    routed = pruned.repartition(
        num_partitions, _routing_key(num_partitions, cfg)
    )
    fn = _make_extract_iter(cfg)
    return routed.mapInPandas(fn, OUTPUT_SCHEMA)


def metrics_from_extracted(extracted: DataFrame) -> DataFrame:
    """Per-partition metrics rollup (FIXTURES.md §6 shape).

    ``batch_ms`` is constant within a (part_id, batch_id) group, so wall
    time per partition = Σ over distinct batches — a two-level partial
    aggregation, all map-side combinable.
    """
    per_batch = extracted.groupBy("part_id", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("ok").cast("long")).alias("n_ok"),
        F.sum((~F.col("ok")).cast("long")).alias("n_failed"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("chars_out").alias("chars_out"),
        F.first("batch_ms").alias("batch_ms"),
        F.first("host").alias("host"),
        F.max("attempt").alias("attempt"),
    )
    return per_batch.groupBy("part_id").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_ok").alias("n_ok"),
        F.sum("n_failed").alias("n_failed"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("chars_out").alias("chars_out"),
        F.sum("batch_ms").alias("wall_ms"),
        F.first("host").alias("host"),
        F.max("attempt").alias("attempt"),
    )


def eta_from_metrics(metrics: DataFrame, n_remaining: int) -> float:
    """F12 ETA (reference ``large_doc_extractor.py:302-314``: mean
    batch time × remaining batches): estimate seconds to finish
    ``n_remaining`` documents from the completed partitions' metrics.

    Throughput model: partitions run concurrently, so effective
    docs/sec = Σ n_docs ÷ (Σ wall_ms / n_partitions / 1000). The
    metrics frame is one row per partition — the aggregate is a single
    tiny driver scalar, not a data-path collect."""
    row = metrics.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("wall_ms").alias("wall_ms"),
        F.count("*").alias("parts"),
    ).first()
    if not row or not row["docs"] or not row["wall_ms"]:
        return 0.0
    wall_sec = row["wall_ms"] / row["parts"] / 1000.0
    docs_per_sec = row["docs"] / wall_sec if wall_sec > 0 else 0.0
    return n_remaining / docs_per_sec if docs_per_sec > 0 else 0.0


def format_eta(eta_seconds: float) -> str:
    """Reference ETA formatting thresholds (``:309-314``)."""
    if eta_seconds <= 0:
        return ""
    if eta_seconds < 60:
        return f"(ETA: {eta_seconds:.0f}s)"
    if eta_seconds < 3600:
        return f"(ETA: {eta_seconds / 60:.1f}m)"
    return f"(ETA: {eta_seconds / 3600:.1f}h)"
