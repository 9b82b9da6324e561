"""Local replica of the driver's correctness gate: run every catalog
query on Spark AND its oracle on DuckDB, compare row count + sorted
values. Usage: python scripts/crosscheck.py [sf_dir] [q1,q2,...]"""

from __future__ import annotations

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from pdf_extractor_spark.functions.query_catalog import CATALOG  # noqa: E402
from pdf_extractor_spark.plans.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """Sort columns by name, rows by values — order-insensitive form."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def values_equal(a, b) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for x, y in zip(av, bv):
            if isinstance(x, float) or isinstance(y, float):
                if x is None and y is None:
                    continue
                if not math.isclose(float(x), float(y),
                                    rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif x != y:
                return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(
        cores=8, extra={"spark.ui.showConsoleProgress": "false"}
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if only is not None:
        unknown = only - set(CATALOG)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
    failures = []
    for name, qd in CATALOG.items():
        if only is not None and name not in only:
            continue
        try:
            sdf = qd.spark(spark, sf_dir).toPandas()
            if qd.oracle is None:
                print(f"{name:32s} rows-only: {len(sdf)} rows")
                continue
            odf = con.sql(qd.oracle).df()
            ns, no = normalize(sdf), normalize(odf)
            ok_rows = len(ns) == len(no)
            ok_cols = list(ns.columns) == list(no.columns)
            ok_vals = ok_rows and ok_cols and values_equal(ns, no)
            # a 0 = 0 match proves nothing about the query body
            # (VERDICT r3 "What's wrong" #3) — vacuous passes FAIL here
            if ok_vals and len(no) == 0:
                ok_vals = False
                print(f"{name:32s} VACUOUS  oracle returned 0 rows")
            status = "OK" if ok_vals else "MISMATCH"
            print(f"{name:32s} {status}  spark={len(ns)} duck={len(no)} "
                  f"cols_ok={ok_cols}")
            if not ok_vals:
                failures.append(name)
                print("  spark cols:", list(ns.columns))
                print("  duck  cols:", list(no.columns))
                if ok_cols and ok_rows:
                    for col in ns.columns:
                        if not values_equal(ns[[col]], no[[col]]):
                            print(f"  first diff col={col}")
                            merged = ns[[col]].compare(no[[col]])
                            print(merged.head(4))
                            break
        except Exception as exc:
            failures.append(name)
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()
    print("\nFAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
