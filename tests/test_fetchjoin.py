"""Tests for the stream-stream fetch-latency interval join
(streaming/fetchjoin.py): matched latencies, cross-wave matching via
checkpointed join state, and watermark-gated timeout emission."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.streaming.fetchjoin import stream_fetch_latency

T0 = pd.Timestamp("2026-02-01 00:00:00")
TIMEOUT = 60  # seconds (test-sized)


def _req(rows):
    return pd.DataFrame(
        {
            "url": [u for u, _ in rows],
            "req_ts": [T0 + pd.Timedelta(seconds=s) for _, s in rows],
        }
    )


def _resp(rows):
    return pd.DataFrame(
        {
            "url": [u for u, _, _ in rows],
            "resp_ts": [
                T0 + pd.Timedelta(seconds=s) for _, s, _ in rows
            ],
            "status": [st for _, _, st in rows],
        }
    )


@pytest.fixture()
def dirs(tmp_path):
    for d in ("req", "resp"):
        (tmp_path / d).mkdir()
    return {
        "req": str(tmp_path / "req"),
        "resp": str(tmp_path / "resp"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drain(spark, dirs):
    q = stream_fetch_latency(
        spark,
        dirs["req"],
        dirs["resp"],
        dirs["out"],
        dirs["ckpt"],
        timeout_s=TIMEOUT,
    )
    q.awaitTermination()


def _rows(spark, dirs):
    try:
        return sorted(
            spark.read.parquet(dirs["out"]).collect(),
            key=lambda r: (r.url, str(r.req_ts)),
        )
    except Exception:
        return []


def _write(spark, pdf, path, schema):
    spark.createDataFrame(pdf, schema).write.mode("append").parquet(path)


REQ_DDL = "url string, req_ts timestamp"
RESP_DDL = "url string, resp_ts timestamp, status int"


class TestFetchJoin:
    def test_latency_and_timeout(self, spark, dirs):
        _write(
            spark,
            _req([("a/1", 0), ("a/2", 5), ("a/3", 10)]),
            dirs["req"],
            REQ_DDL,
        )
        _write(
            spark,
            _resp([("a/1", 3, 200), ("a/2", 40, 404)]),
            dirs["resp"],
            RESP_DDL,
        )
        _drain(spark, dirs)
        # a/3 unmatched but not yet evictable: watermark too young
        got = {r.url: r for r in _rows(spark, dirs) if not r.timed_out}
        assert got["a/1"].latency_s == 3 and got["a/1"].status == 200
        assert got["a/2"].latency_s == 35 and got["a/2"].status == 404

        # a late wave far in the future advances BOTH watermarks past
        # req_ts(a/3) + timeout -> the timeout row must surface
        _write(spark, _req([("z/9", 10_000)]), dirs["req"], REQ_DDL)
        _write(
            spark,
            _resp([("z/9", 10_001, 200)]),
            dirs["resp"],
            RESP_DDL,
        )
        _drain(spark, dirs)
        timeouts = [r for r in _rows(spark, dirs) if r.timed_out]
        assert [r.url for r in timeouts] == ["a/3"]
        assert timeouts[0].resp_ts is None
        assert timeouts[0].latency_s is None

    def test_response_in_later_wave_claims_request(self, spark, dirs):
        _write(spark, _req([("b/1", 0)]), dirs["req"], REQ_DDL)
        _drain(spark, dirs)
        assert _rows(spark, dirs) == []
        # the response arrives in a separate run: the checkpointed
        # join state must still hold the request
        _write(
            spark, _resp([("b/1", 20, 200)]), dirs["resp"], RESP_DDL
        )
        _drain(spark, dirs)
        got = _rows(spark, dirs)
        assert len(got) == 1
        assert got[0].latency_s == 20 and not got[0].timed_out

    def test_out_of_window_response_does_not_match(self, spark, dirs):
        _write(spark, _req([("c/1", 0)]), dirs["req"], REQ_DDL)
        _write(
            spark,
            # arrives after the 60 s interval: not a match
            _resp([("c/1", TIMEOUT + 30, 200)]),
            dirs["resp"],
            RESP_DDL,
        )
        _drain(spark, dirs)
        matched = [r for r in _rows(spark, dirs) if not r.timed_out]
        assert matched == []
