"""J6/A9 consensus — kernel fidelity + Spark operator semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.functions.consensus import (
    consensus_kernel,
    consensus_pick,
)


def test_kernel_all_engines_failed():
    out = consensus_kernel([None, None, None])
    assert out["final_text"] == "" and out["picked"] is None
    assert out["consensus_score"] == 0.0
    assert out["flags"][0]["type"] == "error"


def test_kernel_single_engine_scores_one_with_warning():
    out = consensus_kernel([None, "only result", None])
    assert out["final_text"] == "only result" and out["picked"] == 1
    assert out["consensus_score"] == 1.0
    assert out["flags"][0]["type"] == "warning"


def test_kernel_longest_wins_first_on_ties():
    # engines 0 and 2 tie on length -> Python max picks the first
    out = consensus_kernel(["aaaa", "bb", "cccc"])
    assert out["picked"] == 0 and out["final_text"] == "aaaa"


def test_kernel_low_consensus_flag():
    base = "the quick brown fox jumps over the lazy dog " * 5
    agree = consensus_kernel([base, base + " tail", base])
    assert agree["flags"] == []
    disagree = consensus_kernel([base, "entirely different text", base[:20]])
    assert any(f["type"] == "low_consensus" for f in disagree["flags"])
    assert disagree["consensus_score"] < 0.7


def test_spark_operator_matches_kernel_picks(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [
        # (e1, e2, e3) -> expected pick by longest-first-wins
        (base, base + " extra tail", base[:30]),        # e2
        (base, base, base),                             # e1 (3-way tie)
        (base[:40], base, base + "x"),                  # e3
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": i, "e1": a, "e2": b, "e3": c}
                for i, (a, b, c) in enumerate(rows)
            ]
        )
    )
    got = {
        r["doc_id"]: r
        for r in consensus_pick(df, ["e1", "e2", "e3"]).collect()
    }
    assert [got[i]["picked_engine"] for i in range(3)] == ["e2", "e1", "e3"]
    for i, (a, b, c) in enumerate(rows):
        expected = {"e1": a, "e2": b, "e3": c}[got[i]["picked_engine"]]
        assert got[i]["final_text"] == expected
    # identical engines -> perfect score, no flag
    assert got[1]["consensus_score"] == pytest.approx(1.0)
    assert not got[1]["low_consensus"]
    # heavily truncated third engine in row 0 drags the mean down
    assert got[0]["consensus_score"] < 1.0


def test_spark_operator_low_consensus_and_probe(spark):
    base = "one two three four five six seven eight nine ten " * 10
    df = spark.createDataFrame(
        pd.DataFrame(
            [{"doc_id": 0, "e1": base, "e2": "zzz", "e3": base[:25]}]
        )
    )
    r = consensus_pick(df, ["e1", "e2", "e3"]).collect()[0]
    assert r["low_consensus"] and r["consensus_score"] < 0.7
    # prefix probe caps comparison cost but keeps full-text pick: the
    # picked text is the FULL e1, not its probe prefix
    r2 = consensus_pick(df, ["e1", "e2", "e3"], probe_chars=16).collect()[0]
    assert r2["picked_engine"] == "e1" and r2["final_text"] == base


def test_spark_operator_single_engine(spark):
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 0, "e1": "solo output"}])
    )
    r = consensus_pick(df, ["e1"]).collect()[0]
    assert r["picked_engine"] == "e1"
    assert r["consensus_score"] == pytest.approx(1.0)
    assert not r["low_consensus"]


def test_spark_operator_rejects_empty_engine_list(spark):
    with pytest.raises(ValueError):
        consensus_pick(spark.range(1), [])


def test_spark_operator_null_engine_flags_not_nulls(spark):
    """A failed engine (NULL text) must drag the score down and flag
    low consensus — never propagate NULL through score/flag — and can
    only win the pick when every engine failed (code-review r2)."""
    base = "seven eight nine ten eleven twelve thirteen fourteen " * 5
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 0, "e1": base, "e2": None, "e3": base},
                {"doc_id": 1, "e1": None, "e2": None, "e3": None},
            ]
        )
    )
    rows = {
        r["doc_id"]: r
        for r in consensus_pick(df, ["e1", "e2", "e3"]).collect()
    }
    r0 = rows[0]
    assert r0["consensus_score"] is not None
    assert r0["low_consensus"] is True      # empty engine vs real text
    assert r0["picked_engine"] == "e1" and r0["final_text"] == base
    r1 = rows[1]
    assert r1["final_text"] == "" and r1["consensus_score"] is not None
