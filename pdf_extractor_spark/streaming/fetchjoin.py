"""Stream-stream interval join: fetch-request ↔ fetch-response
correlation with timeout detection.

The crawl loop's operational telemetry: the scheduler emits a
request event when a url is dispatched, the fetcher emits a response
event when bytes land; latency is their difference and a request
with no response inside the timeout window is a fetch loss the
frontier must re-queue. Correlating the two UNBOUNDED streams is the
canonical stream-stream join: without bounds either side would have
to buffer forever, so BOTH sides carry watermarks and the join
condition carries the interval (response within ``timeout_s`` of its
request) — Spark derives the state retention from exactly these two
constraints and evicts buffered rows as the watermarks pass.

The LEFT OUTER variant is the timeout detector: an unmatched request
row is emitted (response columns null) only once the response-side
watermark proves no match can still arrive — late data inside the
allowed lateness window can still claim it, which is why emission
waits for the watermark rather than the wall clock.

Scale shape: state is bounded by (event rate × window), not history;
the join keys shuffle (url, ts) pairs only. The politeness window in
``functions/fetchplan.py`` bounds per-host in-flight requests, so
the per-key state here is small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

REQUESTS_SCHEMA_DDL = "url string, req_ts timestamp"
RESPONSES_SCHEMA_DDL = "url string, resp_ts timestamp, status int"

FETCH_TIMEOUT_S = 300
WATERMARK = "10 seconds"


def fetch_latency_stream(
    requests: DataFrame,
    responses: DataFrame,
    timeout_s: int = FETCH_TIMEOUT_S,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Left-outer interval join of watermarked request/response
    streams: ``(url, req_ts, resp_ts, status, latency_s, timed_out)``.
    ``timed_out`` rows surface only after the response watermark
    passes ``req_ts + timeout_s``."""
    req = requests.withWatermark("req_ts", watermark)
    resp = responses.withWatermark("resp_ts", watermark)
    cond = (
        (req["url"] == resp["url"])
        & (resp["resp_ts"] >= req["req_ts"])
        & (
            resp["resp_ts"]
            <= req["req_ts"] + F.expr(f"interval {timeout_s} seconds")
        )
    )
    joined = req.join(resp, cond, "leftOuter")
    return joined.select(
        req["url"].alias("url"),
        "req_ts",
        "resp_ts",
        "status",
        F.when(
            resp["resp_ts"].isNotNull(),
            F.unix_timestamp(resp["resp_ts"])
            - F.unix_timestamp(req["req_ts"]),
        ).alias("latency_s"),
        resp["resp_ts"].isNull().alias("timed_out"),
    )


def stream_fetch_latency(
    spark: SparkSession,
    requests_path: str,
    responses_path: str,
    out_path: str,
    checkpoint_path: str,
    timeout_s: int = FETCH_TIMEOUT_S,
    watermark: str = WATERMARK,
) -> StreamingQuery:
    """availableNow run appending correlated fetch rows under
    ``out_path``; buffered join state survives restarts via the
    checkpoint, so a response landing in a later wave still claims
    its request (and a request never matches twice)."""
    req = spark.readStream.schema(REQUESTS_SCHEMA_DDL).parquet(
        requests_path
    )
    resp = spark.readStream.schema(RESPONSES_SCHEMA_DDL).parquet(
        responses_path
    )
    out = fetch_latency_stream(
        req, resp, timeout_s=timeout_s, watermark=watermark
    )
    return (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
