"""Tests for the link-spam signals (linkgraph.link_spam_report) and
character entropy (textstats.char_entropy)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pdf_extractor_spark.functions.linkgraph import (
    N_HOSTS,
    link_spam_report,
)
from pdf_extractor_spark.functions.textstats import (
    char_entropy,
    duck_char_entropy_sql,
)


class TestLinkSpam:
    def test_signals_integer_exact_and_bounded(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(400)], "doc_id long"
        )
        rows = link_spam_report(docs).collect()
        assert 0 < len(rows) <= N_HOSTS
        for r in rows:
            assert 0 <= r.reciprocal_bp <= 10000
            assert 0 < r.top_frac_bp <= 10000
            assert r.out_deg <= r.out_w
            # top target's share can never be below 1/out_deg
            assert r.top_frac_bp >= 10000 // r.out_deg

    def test_reciprocity_definition(self, spark):
        # tiny corpus: recompute reciprocity by brute force
        from pdf_extractor_spark.functions.linkgraph import (
            synth_outlink_edges,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(60)], "doc_id long"
        )
        edges = {
            (r.src, r.dst): r.w
            for r in synth_outlink_edges(docs).collect()
        }
        want = {}
        for (s, d), w in edges.items():
            out = want.setdefault(s, [0, 0])
            out[0] += w
            if (d, s) in edges:
                out[1] += w
        got = {r.host: r for r in link_spam_report(docs).collect()}
        assert set(got) == set(want)
        for h, (out_w, recip_w) in want.items():
            assert got[h].out_w == out_w
            assert got[h].reciprocal_bp == recip_w * 10000 // out_w


class TestCharEntropy:
    def test_known_values(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "aaaa"),                  # entropy 0
                (2, "abab"),                  # ln 2
                (3, "abcd"),                  # ln 4
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in char_entropy(docs).collect()}
        assert got[1].entropy == 0.0
        assert got[1].n_chars == 4
        assert got[2].entropy == round(math.log(2), 4)
        assert got[3].entropy == round(math.log(4), 4)

    def test_spam_below_prose_below_random(self, spark):
        prose = (
            "the committee reviewed the annual budget and approved "
            "several new projects for next year"
        )
        spam = "buy now " * 12
        rand = "".join(
            chr(33 + (i * 37) % 90) for i in range(100)
        )
        docs = spark.createDataFrame(
            [(1, spam), (2, prose), (3, rand)],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.entropy for r in char_entropy(docs).collect()}
        assert got[1] < got[2] < got[3]

    def test_oracle_matches(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text sample {i} with varied characters {i*i}")
             for i in range(30)],
            "doc_id long, text string",
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        got = con.execute(duck_char_entropy_sql()).fetchdf()
        want = char_entropy(docs).toPandas()
        pd.testing.assert_frame_equal(
            want, got.astype(want.dtypes.to_dict()), rtol=1e-9
        )
