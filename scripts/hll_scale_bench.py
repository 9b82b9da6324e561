"""Measured evidence for the HLL scale claim: per-group distinct
counting where the sketch's shuffle is CONSTANT (m rows/group) while
exact COUNT(DISTINCT) shuffles every distinct value.

Corpus: 10M synthetic tokens over 4 groups, ~5M distinct (range ids
md5-hashed — no text, the comparison isolates the aggregation).
Reports wall time and the exchange row volume of both plans (the
number that grows with the data for exact and stays ~m*|groups| for
the sketch), plus the sketch's measured relative error. Writes one
JSON line to BENCH_HLL.json.

Run: python scripts/hll_scale_bench.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from pdf_extractor_spark.functions.sketches import HLL_M  # noqa: E402
from pdf_extractor_spark.plans.session import build_session  # noqa: E402

N_ROWS = 10_000_000
N_GROUPS = 4




def main() -> None:
    spark = build_session(
        cores=8, extra={"spark.ui.showConsoleProgress": "false"}
    )
    # ~5M distinct values spread over 4 groups; dup factor 2
    base = spark.range(N_ROWS).select(
        (F.col("id") % N_GROUPS).cast("string").alias("lang"),
        F.md5((F.col("id") % (N_ROWS // 2)).cast("string")).alias("tok"),
    )
    base = base.localCheckpoint(eager=True)  # isolate agg cost

    t = time.time()
    exact = base.groupBy("lang").agg(
        F.countDistinct("tok").alias("n_exact")
    )
    exact_rows = {r.lang: r.n_exact for r in exact.collect()}
    exact_s = time.time() - t

    # the sketch leg of hll_distinct_report, inlined over the same frame
    h = "md5(tok)"
    bucket = f"cast(conv(substring({h}, 1, 2), 16, 10) as bigint)"
    w = f"cast(conv(substring({h}, 3, 12), 16, 10) as bigint)"
    rho = f"case when {w} = 0 then 49 else 49 - length(bin({w})) end"
    t = time.time()
    regs = (
        base.select(
            "lang",
            F.expr(bucket).alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("lang", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    est = (
        regs.groupBy("lang")
        .agg(
            F.sum(F.expr("shiftleft(1L, 50 - m_j)")).alias("s_present"),
            F.count("*").alias("n_present"),
        )
        .select(
            "lang",
            F.expr(
                f"cast(0.7182725932495458 as double) * {HLL_M} * {HLL_M}"
                f" * cast({1 << 50} as double)"
                f" / cast(s_present + ({HLL_M} - n_present) * "
                f"{1 << 50}L as double)"
            ).alias("est"),
        )
    )
    sketch_rows = {r.lang: r.est for r in est.collect()}
    sketch_s = time.time() - t

    # production-hash variant: xxhash64 instead of md5-hex parsing —
    # the engine-twin constraint (DuckDB must reproduce the sketch
    # bit-for-bit) forces md5 in the CATALOG version; a cluster job
    # uses the native long hash, whose rho needs no string ops at all
    xb = "(xxhash64(tok) & 255)"
    xw = "(shiftrightunsigned(xxhash64(tok), 8) & 281474976710655)"
    xrho = f"case when {xw} = 0 then 49 else 49 - length(bin({xw})) end"
    t = time.time()
    fast = (
        base.select(
            "lang",
            F.expr(xb).alias("bucket"),
            F.expr(xrho).alias("rho"),
        )
        .groupBy("lang", "bucket")
        .agg(F.max("rho").alias("m_j"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )
    fast.collect()
    fast_s = time.time() - t

    # exchange volume after map-side combine is deterministic by
    # construction: exact shuffles the distinct (lang, tok) pairs,
    # the sketch shuffles the occupied (lang, bucket) registers
    ex_exact = base.select("lang", "tok").distinct().count()
    ex_sketch = (
        base.select("lang", F.expr(bucket).alias("bucket"))
        .distinct()
        .count()
    )

    errs = [
        abs(sketch_rows[g] - exact_rows[g]) / exact_rows[g]
        for g in exact_rows
    ]
    out = {
        "metric": "hll_vs_exact_distinct",
        "n_rows": N_ROWS,
        "n_groups": N_GROUPS,
        "n_distinct_per_group": exact_rows,
        "exact_wall_s": round(exact_s, 2),
        "sketch_wall_s_md5_twin": round(sketch_s, 2),
        "sketch_wall_s_xxhash64": round(fast_s, 2),
        "exact_exchange_rows": ex_exact,
        "sketch_exchange_rows": ex_sketch,
        "max_rel_err": round(max(errs), 4),
        "register_budget": HLL_M * N_GROUPS,
    }
    print(json.dumps(out))
    pathlib.Path("BENCH_HLL.json").write_text(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
