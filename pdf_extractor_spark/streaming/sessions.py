"""Custom stateful streaming operator: per-host crawl sessionization
via ``applyInPandasWithState``.

The built-in streaming toolbox covers windowed aggregates (see
``incremental.py``'s watermarked ingest stats); what it cannot
express is GAP-based sessions — "a burst of fetches from one host
separated from the next burst by more than ``gap`` seconds" — because
the window boundary depends on the DATA, not the clock grid. That is
exactly the custom-stateful-operator case: per-key state (the open
session) carried across micro-batches, rows emitted when the data
closes a session.

Semantics (deterministic, event-time only — no wall-clock timeouts,
so replays and test runs produce identical output):

- events of one host are processed in ``warc_ts`` order within each
  micro-batch;
- an event within ``gap`` seconds of the open session's last event
  extends the session;
- an event beyond the gap CLOSES the open session (one output row:
  host, session_start, session_end, n_docs) and opens a new one;
- a late event older than the session's last timestamp joins the
  open session without moving its end (counted, clamped — the
  bounded-state trade every streaming dedup makes);
- open sessions live in the state store and survive restarts via the
  checkpoint: a later run closes them only when newer data arrives.
  Nothing is ever emitted twice.

Scale shape: state is one (start, last, n) triple per host — bytes
per key, bounded by the host universe, not the event volume; each
micro-batch shuffles only (host, ts) pairs to co-locate keys. At
10^12 documents the state store holds ~10^8 hosts x 24 bytes — a few
GB across executors, the same order as the shuffle that any per-host
aggregate already pays.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.pages import PAGES_SCHEMA_DDL

SESSION_GAP_S = 1800  # 30 min — the classic web-session gap

_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_docs", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _close_sessions(gap_s: int):
    """Build the applyInPandasWithState body for a given gap."""

    def body(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple[str, int, int, int]] = []
        ts_all = [pdf["ts"] for pdf in pdfs if len(pdf)]
        if not ts_all:  # timeout-only invocations carry no data
            return
        for ts in sorted(pd.concat(ts_all).astype("int64").tolist()):
            if start is None:
                start, last, n = ts, ts, 1
            elif ts <= last:
                n += 1  # late event: joins the open session, clamped
            elif ts - last <= gap_s:
                last, n = ts, n + 1
            else:
                closed.append((host, start, last, n))
                start, last, n = ts, ts, 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["host", "session_start", "session_end", "n_docs"],
            )

    return body


def host_sessions_stream(
    pages: DataFrame, gap_s: int = SESSION_GAP_S
) -> DataFrame:
    """Transform a streaming pages frame into closed per-host crawl
    sessions. ``warc_ts`` is reduced to epoch seconds BEFORE the
    stateful stage so state and output stay integer-exact."""
    events = pages.select(
        F.regexp_extract("url", "^https?://([^/]+)/", 1).alias("host"),
        F.unix_timestamp("warc_ts").alias("ts"),
    )
    return events.groupBy("host").applyInPandasWithState(
        _close_sessions(gap_s),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_host_sessions(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    checkpoint_path: str,
    gap_s: int = SESSION_GAP_S,
) -> StreamingQuery:
    """Start an availableNow run that appends closed sessions under
    ``out_path``. Open sessions persist in the checkpointed state
    store; re-running after new files land continues them exactly."""
    stream = spark.readStream.schema(PAGES_SCHEMA_DDL).parquet(
        pages_path
    )
    sessions = host_sessions_stream(stream, gap_s=gap_s)
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
