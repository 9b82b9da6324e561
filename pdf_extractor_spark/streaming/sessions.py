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


# ------------------------------------------- oracle-gated batch entry
#
# Gap sessionization has an EXACT relational form (gaps-and-islands:
# lag → new-session flag → cumulative sum → per-island aggregate), so
# unlike most streaming operators this one can be driver-gated
# against a SQL oracle: the catalog entry below materializes a
# deterministic event stream from the documents table, runs the REAL
# applyInPandasWithState job (two waves, two separate availableNow
# runs — restart continuity is inside the gate, not just the unit
# tests), and the DuckDB twin states the same sessions relationally.
# Only CLOSED sessions are emitted (each host's last island stays
# open in state), which the oracle mirrors by dropping every host's
# final island.

CATALOG_GAP_S = 600

# deterministic event synthesis: each doc is one fetch event on its
# source host; the timestamp pattern plants multi-session bursts
#   ts_s = (doc_id % 20) * 60 + (doc_id div 20) * 3600
# — within one host (one `source` stripe, doc_id % 20 fixed) events
# sit 3600 s apart, far beyond the 600 s gap … that would close a
# session per event. Use a burst shape instead:
#   ts_s = (doc_id div 20) * 90 + (doc_id div 200) * 7200
# within a host: consecutive docs (doc_id += 20) are 90 s apart
# (same session) until the doc_id div 200 boundary jumps 7200 s
# (closes the session). Engine-identical integer arithmetic.
_TS_EXPR = "(doc_id div 20) * 90 + (doc_id div 200) * 7200"
_TS_DUCK = "(doc_id // 20) * 90 + (doc_id // 200) * 7200"


def host_sessions_catalog(spark, sf_dir: str):
    """Catalog body: synthesize the event stream, run the stateful
    streaming job in TWO availableNow waves, return the closed
    sessions. The split is TIME-ORDERED (first burst block, then the
    rest): an interleaved split would deliver wave-2 events OLDER
    than already-processed state, and the late-clamp path—correct
    for streaming—diverges from the global-sort relational oracle.
    The second wave closes sessions the first left open, so restart
    continuity is inside the driver gate itself."""
    import tempfile

    from pyspark.sql import functions as F

    from ..functions.sampling import synth_url

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = docs.select(
        synth_url().alias("url"),
        F.expr(
            f"timestamp_seconds(1700000000 + {_TS_EXPR})"
        ).alias("warc_ts"),
        F.lit(b"").alias("html"),
        F.lit("").alias("text"),
        F.col("lang"),
        F.expr("doc_id div 200").alias("wave_key"),
    )
    tmp = tempfile.mkdtemp(prefix="sess_catalog_")
    pages, out, ckpt = f"{tmp}/pages", f"{tmp}/out", f"{tmp}/ckpt"
    waves = [
        events.where(F.col("wave_key") == 0),
        events.where(F.col("wave_key") >= 1),
    ]
    for wave in waves:
        wave.drop("wave_key").write.mode("append").parquet(pages)
        q = stream_host_sessions(
            spark, pages, out, ckpt, gap_s=CATALOG_GAP_S
        )
        q.awaitTermination()
    # materialize the (host-bounded, ~40-row) session report so the
    # temp dirs can be deleted — a lazily-read frame would dangle on
    # them. The collect is bounded by the host universe, not events.
    import shutil

    result = (
        spark.read.parquet(out)
        .select("host", "session_start", "session_end", "n_docs")
        .orderBy("host", "session_start")
        .toPandas()
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        result,
        "host string, session_start long, session_end long, "
        "n_docs long",
    )


def duck_host_sessions_sql(source: str = "documents") -> str:
    """Gaps-and-islands twin over the same synthetic events; every
    host's LAST island is dropped (still open in streaming state)."""
    from ..functions.sampling import DUCK_SYNTH_URL, HOST_REGEX

    return f"""
WITH events AS (
  SELECT regexp_extract({DUCK_SYNTH_URL}, '{HOST_REGEX}', 1) AS host,
         1700000000 + {_TS_DUCK} AS ts
  FROM {source}
), ordered AS (
  SELECT host, ts,
         lag(ts) OVER (PARTITION BY host ORDER BY ts) AS prev_ts
  FROM events
), flagged AS (
  SELECT host, ts,
         CASE WHEN prev_ts IS NULL
                OR ts - prev_ts > {CATALOG_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
), islands AS (
  SELECT host, ts,
         sum(new_session) OVER (
           PARTITION BY host ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), sessions AS (
  SELECT host, island,
         min(ts) AS session_start,
         max(ts) AS session_end,
         count(*) AS n_docs,
         max(island) OVER (PARTITION BY host) AS last_island
  FROM islands GROUP BY host, island
)
SELECT host,
       CAST(session_start AS BIGINT) AS session_start,
       CAST(session_end AS BIGINT)   AS session_end,
       CAST(n_docs AS BIGINT)        AS n_docs
FROM sessions
WHERE island < last_island
ORDER BY host, session_start
"""
