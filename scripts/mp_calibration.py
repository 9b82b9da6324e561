"""Hardware-ceiling calibration: pure-multiprocessing scaling of the
extraction kernel — no Spark, no shuffle, no IPC beyond a result queue.

This measures the PHYSICAL upper bound any engine can scale to on this
box: K pinned processes each running the per-document kernel on its own
in-memory payload list. Any efficiency Spark loses BELOW these numbers
is the engine's (shuffle layout, Arrow transfer, scheduling, sink
commit); the gap between these numbers and 1.0 is the machine's shared
memory system (one DRAM controller across all "executors" — which a
real multi-node cluster does not share; each node brings its own).

Used to pick the N vs 4N pair for ``scaling_bench.py``: the pair must
sit within the bandwidth envelope (≈1.0 here) or the Spark measurement
reads hardware saturation as engine inefficiency.

Usage: ``python scripts/mp_calibration.py`` — prints docs/s per K and
the 2→8 / 4→16 pure-multiprocessing efficiencies.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time
from multiprocessing import Process, Queue

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
LONG = 16   # same ~4 KB payload synthesis as scaling_bench.py


def worker(payloads: list[bytes], q: Queue) -> None:
    from pdf_extractor_spark.operators.document import extract_document

    for p in payloads[:10]:          # warm caches + imports
        extract_document(p)
    t0 = time.perf_counter()
    for p in payloads:
        extract_document(p)
    q.put((len(payloads), time.perf_counter() - t0))


REPS = 3    # median-of-3: a sub-second single window is scheduler-
            # jitter-prone; each timed window here is several seconds


def _one_rep(k: int, mix: list[bytes]) -> float:
    q: Queue = Queue()
    procs = [Process(target=worker, args=(mix, q)) for _ in range(k)]
    for i, pr in enumerate(procs):
        pr.start()
        os.sched_setaffinity(pr.pid, {i})   # one core per "executor"
    res = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    total_docs = sum(n for n, _t in res)
    wall = max(t for _n, t in res)
    return total_docs / wall


def measure(k: int, html_payloads: list[bytes],
            pdf_payloads: list[bytes]) -> float:
    # 1:1 html:pdf by doc count — the same per-doc workload as
    # scaling_bench.py, which runs EVERY doc through BOTH branches
    per = 400
    mix = (html_payloads * 2)[:per] + (pdf_payloads * 2)[:per]
    import statistics

    return statistics.median(
        _one_rep(k, mix) for _ in range(REPS)
    )


def main() -> None:
    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet') "
        "LIMIT 200"
    ).fetchall()
    texts = [(r[0] + " ") * LONG for r in rows]

    from pdf_extractor_spark.sources.docwrap import wrap_html, wrap_pdf

    html_payloads = [wrap_html(t) for t in texts]
    pdf_payloads = [wrap_pdf(t) for t in texts]
    results: dict[int, float] = {}
    for k in (2, 4, 8, 16):
        results[k] = measure(k, html_payloads, pdf_payloads)
        print(f"{k:3d} procs: {results[k]:8.1f} docs/s  "
              f"per-proc {results[k] / k:7.1f}")
    print(f"2->8  efficiency: {(results[8] / results[2]) / 4:.3f}")
    print(f"4->16 efficiency: {(results[16] / results[4]) / 4:.3f}")


if __name__ == "__main__":
    main()
