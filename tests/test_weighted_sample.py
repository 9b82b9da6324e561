"""Weighted priority sampling: selection correctness and the
no-global-sort plan shape."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractor_spark.functions.sampling import (
    duck_weighted_sample_sql,
    weighted_priority_sample,
)


@pytest.fixture(scope="module")
def docs_pdf():
    rng = np.random.RandomState(17)
    n = 400
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [
            " ".join(["w"] * rng.randint(5, 120)) for _ in range(n)
        ],
    })


def test_selected_priorities_dominate_excluded(docs_pdf):
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    top = con.execute(duck_weighted_sample_sql(k=30)).df()
    allrows = con.execute(
        duck_weighted_sample_sql(k=10**9)
    ).df()
    assert len(top) == 30
    excluded = allrows[~allrows["doc_id"].isin(top["doc_id"])]
    assert top["priority_r6"].min() >= excluded["priority_r6"].max()


def test_partitioning_and_row_order_invariant(spark, docs_pdf):
    base = spark.createDataFrame(docs_pdf)
    a = weighted_priority_sample(base, k=25).toPandas()
    b = weighted_priority_sample(
        base.orderBy(F_desc := base["doc_id"].desc()).repartition(13),
        k=25,
    ).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_plan_is_take_ordered_not_global_sort(spark, docs_pdf):
    plan = weighted_priority_sample(
        spark.createDataFrame(docs_pdf), k=25
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_heavier_weight_wins_ties_in_expectation(docs_pdf):
    """Doubling every weight shifts each priority ln(u)/w toward 0
    monotonically — the k-th threshold logic stays consistent: the
    same hash draw with uniformly doubled weights selects the SAME
    set (rank is invariant to a common positive factor on w)."""
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    a = con.execute(duck_weighted_sample_sql(k=25)).df()
    doubled = docs_pdf.copy()
    doubled["text"] = doubled["text"] + " " + doubled["text"] + " x"
    # not exactly double (2w+1) — recompute directly instead:
    con2 = duckdb.connect()
    con2.register("documents", docs_pdf)
    b = con2.execute(
        duck_weighted_sample_sql(k=25).replace(
            "/ len(string_split(text, ' '))",
            "/ (2 * len(string_split(text, ' ')))",
        )
    ).df()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
