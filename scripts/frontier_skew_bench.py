"""Frontier politeness-window skew bench (discovery-layer analog of
the extraction/LSH skew benches).

Scenario: per-host top-k over a candidate set where one mega-host
owns 70% of the rows (link farm / URL-parameter explosion) — the
layout that would turn a naive ``PARTITION BY host`` window into one
straggler task sorting the whole pile.

What this measures (and the lesson it records):

- **selection** (``frontier.select_topk`` — the production fetch
  loop): the declared single window + ``rk <= K`` filter.  Spark ≥
  3.5 rewrites that into **WindowGroupLimit** — a partial map-side
  per-group limit BEFORE the exchange — so the mega-host is pruned
  to K rows per input partition before it converges on one task.
  The bench asserts the node is actually in the executed plan.
- **salted two-stage** (per-(host, salt) top-K then exact top-K):
  the classic hand-rolled mitigation.  It measures SLOWER than the
  declared form here, because Catalyst's map-side limit already did
  the same pruning with one less shuffle stage.  Lesson recorded:
  declare the plan, let the optimizer pick the physical strategy.
- **audit frame** (rank EVERY candidate, the catalog query's
  contract): no filter → no group limit → the full per-host sort.
  This is the price of the auditable full-verdict output, paid
  knowingly; the production loop never needs it.

Outputs are asserted equal between selection and two-stage before
timing.  Usage: ``python scripts/frontier_skew_bench.py`` (writes
``BENCH_FRONTIER_SKEW.json``).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import Window, functions as F  # noqa: E402

from pdf_extractor_spark.plans.session import build_session  # noqa: E402

N_ROWS = 20_000_000
MEGA_FRAC_NUM, MEGA_FRAC_DEN = 7, 10   # 70% of rows on the mega-host
N_SMALL_HOSTS = 10_000
K = 3
N_SALTS = 64
REPS = 3
OUT = "BENCH_FRONTIER_SKEW.json"
ROOT = pathlib.Path(__file__).resolve().parents[1]


def build_cands(spark):
    return (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("cand_id"),
            F.expr(
                f"CASE WHEN pmod(id, {MEGA_FRAC_DEN}) <"
                f" {MEGA_FRAC_NUM} THEN 'mega.example' ELSE"
                f" concat('h', cast(pmod(id, {N_SMALL_HOSTS}) as"
                " string), '.example') END"
            ).alias("host"),
            F.expr("cast(pmod(id * 2654435761, 1000) as int)")
            .alias("prio"),
        )
    )


def select_topk(cands, k):
    """The production selection shape: declared window + rk <= k —
    Spark >= 3.5 rewrites the filter into WindowGroupLimit (asserted
    below), which is the whole lesson this bench records."""
    w = Window.partitionBy("host").orderBy(
        F.col("prio").desc(), F.col("cand_id")
    )
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def salted_two_stage(cands):
    stage1 = Window.partitionBy(
        "host", F.expr(f"pmod(cand_id, {N_SALTS})")
    ).orderBy(F.col("prio").desc(), F.col("cand_id"))
    stage2 = Window.partitionBy("host").orderBy(
        F.col("prio").desc(), F.col("cand_id")
    )
    return (
        cands.withColumn("_srk", F.row_number().over(stage1))
        .where(F.col("_srk") <= K)
        .drop("_srk")
        .withColumn("rk", F.row_number().over(stage2))
        .where(F.col("rk") <= K)
    )


def audit_frame(cands):
    w = Window.partitionBy("host").orderBy(
        F.col("prio").desc(), F.col("cand_id")
    )
    return cands.withColumn("rk", F.row_number().over(w))


def main() -> None:
    spark = build_session(
        cores=32, extra={"spark.ui.showConsoleProgress": "false"}
    )
    cands = build_cands(spark).localCheckpoint(eager=True)

    sel = select_topk(cands, K)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, \
        "map-side group limit missing from the selection plan"

    a = sorted(map(tuple, sel.collect()))
    b = sorted(map(tuple, salted_two_stage(cands).collect()))
    assert a == b, "salted two-stage diverged from the declared form"

    timings: dict[str, list[float]] = {
        "selection_declared": [], "salted_two_stage": [],
        "audit_full_rank": [],
    }
    # aggregate over rk so column pruning cannot elide the window
    # (a bare count() drops rk and Catalyst removes the sort wholesale)
    def run(df):
        t0 = time.monotonic()
        df.agg(F.sum("rk")).collect()
        return round(time.monotonic() - t0, 3)

    for _ in range(REPS):
        timings["selection_declared"].append(run(select_topk(cands, K)))
        timings["salted_two_stage"].append(run(salted_two_stage(cands)))
        timings["audit_full_rank"].append(run(audit_frame(cands)))

    med = {k: sorted(v)[len(v) // 2] for k, v in timings.items()}
    summary = {
        "job": "per-host top-k, planted 70% mega-host",
        "n_rows": N_ROWS,
        "mega_host_rows": N_ROWS * MEGA_FRAC_NUM // MEGA_FRAC_DEN,
        "k": K,
        "n_selected": len(a),
        "outputs_equal": True,
        "window_group_limit_in_plan": True,
        "wall_sec_median": med,
        "audit_vs_selection": round(
            med["audit_full_rank"] / med["selection_declared"], 2
        ),
        "all_runs": timings,
    }
    (ROOT / OUT).write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "all_runs"}, indent=1))


if __name__ == "__main__":
    main()
