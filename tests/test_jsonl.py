"""JSONL ingestion: JVM-native parse semantics and the
zero-Python/zero-exchange plan contract."""

from __future__ import annotations

import duckdb
import pandas as pd


def test_escape_corrupt_and_plain_rotations(spark):
    from pdf_extractor_spark.functions.jsonl import (
        duck_jsonl_sql,
        jsonl_parse_report,
    )

    pdf = pd.DataFrame({
        "doc_id": list(range(60)),
        "text": [f"hello doc {i} & <tag>" for i in range(60)],
    })
    out = (
        jsonl_parse_report(spark.createDataFrame(pdf))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(duck_jsonl_sql())
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    for c in ["ok", "text_match", "lang", "bucket"]:
        assert [str(x) for x in out[c]] == [
            str(y) for y in want[c]
        ], c
    # the escaped fifth really decodes to the same text
    assert bool(out.loc[4, "text_match"]) and bool(out.loc[4, "ok"])
    # the corrupt eleventh really rejects
    assert not bool(out.loc[10, "ok"])


def test_plan_is_pure_codegen(spark):
    from pdf_extractor_spark.functions.jsonl import (
        jsonl_parse_report,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    plan = (
        jsonl_parse_report(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "MapInPandas" not in plan


def test_astral_codepoints_escape_as_surrogate_pairs(spark):
    # doc_id 4 takes the \uXXXX-escaped branch; a non-BMP char must
    # emit a surrogate pair (bare 5-hex escapes are not legal JSON)
    # and decode back to the identical text.
    import pandas as pd

    from pdf_extractor_spark.functions.jsonl import (
        jsonl_parse_report,
    )

    pdf = pd.DataFrame({
        "doc_id": [4, 9],
        "text": ["emoji \U0001F600 ok", "astral \U00010348 too"],
    })
    out = (
        jsonl_parse_report(spark.createDataFrame(pdf))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert bool(out.loc[0, "ok"]) and bool(out.loc[0, "text_match"])
    assert bool(out.loc[1, "ok"]) and bool(out.loc[1, "text_match"])
