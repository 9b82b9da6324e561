"""Structured-Streaming incremental extraction tests (SURVEY.md §2.11).

Scenario: pages files land in a directory in two waves; each
``stream_extract`` run drains what is available (availableNow) and
stops. Asserts: (1) wave 1 extracted; (2) wave 2 run picks up ONLY new
urls — no duplicates, no loss; (3) a third run with nothing new is a
no-op; (4) streaming output matches the batch pipeline byte-for-byte.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.fixtures.corpus import build_pages_frame
from pdf_extractor_spark.sources.pages import pages_from_pandas
from pdf_extractor_spark.streaming.incremental import stream_extract


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "pages": str(tmp_path / "pages"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    (tmp_path / "pages").mkdir()
    return d


def _drain(spark, dirs):
    q = stream_extract(
        spark, dirs["pages"], dirs["out"], dirs["ckpt"], num_partitions=2
    )
    q.awaitTermination()


def test_incremental_two_waves_no_dup_no_loss(spark, dirs):
    frame = build_pages_frame()
    wave1, wave2 = frame.iloc[:10], frame.iloc[10:]

    pages_from_pandas(spark, wave1).write.mode("append").parquet(
        dirs["pages"]
    )
    _drain(spark, dirs)
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == len(wave1)

    pages_from_pandas(spark, wave2).write.mode("append").parquet(
        dirs["pages"]
    )
    _drain(spark, dirs)
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == len(frame)
    assert out2.select("url").distinct().count() == len(frame)

    # wave-1 rows were not re-extracted (attempt/extraction identity is
    # irrelevant; count per url == 1 is the MERGE guarantee)
    _drain(spark, dirs)  # third run: nothing new
    out3 = spark.read.parquet(dirs["out"])
    assert out3.count() == len(frame)


def test_streaming_matches_batch_pipeline(spark, dirs, tmp_path):
    from pdf_extractor_spark.plans.pipeline import extract_pages

    frame = build_pages_frame()
    pages_from_pandas(spark, frame).write.mode("append").parquet(
        dirs["pages"]
    )
    _drain(spark, dirs)
    streamed = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(dirs["out"])
        .select("url", "extracted_text")
        .collect()
    }
    batch = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(
            pages_from_pandas(spark, frame), num_partitions=2
        )
        .select("url", "extracted_text")
        .collect()
    }
    assert streamed == batch
