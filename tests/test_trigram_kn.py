"""Interpolated Kneser-Ney trigram scoring: the continuation-count
property, short-doc degradation, and engine-twin agreement on a
planted corpus."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pdf_extractor_spark.functions.textstats import (
    duck_trigram_kn_sql,
    trigram_kn_costs,
)


def _duck(rows):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(rows)), "text": list(rows)}
        ),
    )
    return (
        con.execute(duck_trigram_kn_sql())
        .df()
        .set_index("doc_id")
        .sort_index()
    )


def test_kneser_ney_continuation_beats_raw_frequency():
    """Plant the classic case: 'francisco' is FREQUENT but only
    ever follows 'san' — raw-frequency backoff would love a novel
    'the francisco' continuation; KN's continuation count must not.
    'city' appears the same number of times but after many
    different words, so a novel trigram ending in 'city' must
    outscore one ending in 'francisco'."""
    corpus = []
    # 'francisco' frequent, single left context
    corpus += ["we visit san francisco often ."] * 10
    # 'city' equally frequent, many left contexts
    for w in ("big", "old", "new", "far", "hot",
              "icy", "wet", "dry", "dim", "raw"):
        corpus.append(f"a {w} city stands here .")
    # probes: identical unseen context 'in the ___'
    corpus.append("in the francisco")
    corpus.append("in the city")
    out = _duck(corpus)
    probe_fran = out.loc[len(corpus) - 2, "avg_bp"]
    probe_city = out.loc[len(corpus) - 1, "avg_bp"]
    assert probe_city > probe_fran


def test_short_docs_score_zero_and_drop():
    out = _duck(["one", "two words", "now three tokens here"])
    assert out.loc[0, "n_trigrams"] == 0
    assert out.loc[1, "n_trigrams"] == 0
    assert not out.loc[0, "keep"] and not out.loc[1, "keep"]
    assert out.loc[2, "n_trigrams"] == 2


def test_repeated_fluent_text_outscores_shuffled():
    fluent = "the quick brown fox jumps over the lazy dog again"
    shuffled = "dog the over quick again brown lazy jumps fox the"
    corpus = [fluent] * 8 + [fluent, shuffled]
    out = _duck(corpus)
    assert out.loc[8, "avg_bp"] > out.loc[9, "avg_bp"]


@pytest.mark.usefixtures("spark")
def test_spark_matches_duck_twin(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)
    got = (
        trigram_kn_costs(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = (
        con.execute(duck_trigram_kn_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ["n_trigrams", "sum_bp", "avg_bp"]:
        assert (
            got[c].astype("int64") == want[c].astype("int64")
        ).all(), c
    assert (got["keep"] == want["keep"]).all()
