"""Tests for mirror-host detection (functions/mirrors.py)."""

from __future__ import annotations

import duckdb
import pandas as pd

from pdf_extractor_spark.functions.mirrors import (
    duck_mirror_sql,
    mirror_host_pairs,
)


def _docs(spark, rows):
    # rows: (doc_id, source, text); synth_url builds the host from
    # source + lang
    return spark.createDataFrame(
        [(d, "en", s, t) for d, s, t in rows],
        "doc_id long, lang string, source string, text string",
    )


class TestMirrors:
    def test_full_mirror_detected(self, spark):
        pages = [f"page body {i}" for i in range(6)]
        rows = (
            [(i, "alpha", pages[i]) for i in range(6)]
            + [(10 + i, "beta", pages[i]) for i in range(6)]
            + [(20 + i, "gamma", f"unique text {i}") for i in range(6)]
        )
        got = mirror_host_pairs(_docs(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert ("alpha" in r.host_a) and ("beta" in r.host_b)
        assert (r.shared, r.n_a, r.n_b, r.jaccard_bp) == (6, 6, 6, 10000)

    def test_partial_overlap_thresholded(self, spark):
        # 2 of 8 pages shared -> jaccard 2/14 = 1428 bp < 3000: no pair
        rows = (
            [(i, "a", f"common {i}" if i < 2 else f"a-only {i}")
             for i in range(8)]
            + [(10 + i, "b", f"common {i}" if i < 2 else f"b-only {i}")
               for i in range(8)]
        )
        assert mirror_host_pairs(_docs(spark, rows)).count() == 0
        # ...but visible at a lower threshold
        low = mirror_host_pairs(
            _docs(spark, rows), min_jaccard_bp=1000
        ).collect()
        assert len(low) == 1 and low[0].shared == 2

    def test_boilerplate_cap_drops_hot_fingerprint(self, spark):
        # one page served by every host must not connect them all
        rows = []
        for h in range(6):
            rows.append((h * 10, f"s{h}", "cookie banner page"))
            rows.append((h * 10 + 1, f"s{h}", f"unique {h}"))
        got = mirror_host_pairs(
            _docs(spark, rows), max_hosts_per_fp=4
        ).collect()
        assert got == []

    def test_duplicate_serving_collapses(self, spark):
        # a host serving the same page 5x contributes ONE fingerprint
        rows = (
            [(i, "a", "the page") for i in range(5)]
            + [(10, "b", "the page")]
        )
        got = mirror_host_pairs(_docs(spark, rows)).collect()
        assert len(got) == 1
        assert (got[0].n_a, got[0].n_b, got[0].shared) == (1, 1, 1)

    def test_oracle_matches(self, spark):
        rows = (
            [(i, "a", f"p{i % 4}") for i in range(8)]
            + [(10 + i, "b", f"p{i % 4}") for i in range(8)]
            + [(30 + i, "c", f"solo {i}") for i in range(4)]
        )
        docs = _docs(spark, rows)
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        got = con.execute(duck_mirror_sql()).fetchdf()
        want = mirror_host_pairs(docs).toPandas()
        pd.testing.assert_frame_equal(
            want, got.astype(want.dtypes.to_dict())
        )

    def test_text_never_in_join_keys(self, spark):
        rows = [(i, "a", f"p{i}") for i in range(4)] + [
            (10, "b", "p0")
        ]
        plan = (
            mirror_host_pairs(_docs(spark, rows))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every exchange carries fingerprints/hosts, never text
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text#" not in line, line
