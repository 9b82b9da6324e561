"""Tests for incremental (snapshot-over-snapshot) dedup: cascade
semantics on hand-built corpora, synthetic-batch class rotation, and
the text-never-shuffles plan pin."""

from __future__ import annotations

import re

from pdf_extractor_spark.functions.snapshot import (
    NEW_OFFSET,
    incremental_dedup_report,
    synth_new_batch,
)

# ~40 tokens: mutating one token keeps Jaccard well above 0.7
LONG = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four "
    "five six seven eight nine ten eleven twelve thirteen fourteen"
)
OTHER = (
    "red orange yellow green blue indigo violet cyan magenta teal "
    "maroon olive navy coral amber jade ruby pearl onyx quartz "
    "slate ivory ebony bronze copper silver golden plum rose mint"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCascade:
    def test_exact_near_and_novel(self, spark):
        old = _docs(spark, [(1, LONG), (2, OTHER)])
        near = LONG.replace("delta", "CHANGED")
        new = _docs(
            spark,
            [
                (101, LONG),                         # exact dup
                (102, near),                         # near dup
                (103, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg "
                      "hh jj kk ll zz xx cc vv bb nn mm q1 w2 e3 r4"),
            ],
        )
        got = {
            r.doc_id: (r.dropped_exact, r.dropped_near, r.is_kept)
            for r in incremental_dedup_report(old, new).collect()
        }
        assert got[101] == (1, 0, 0)
        assert got[102] == (0, 1, 0)
        assert got[103] == (0, 0, 1)

    def test_exact_dup_skips_near_stage(self, spark):
        # cascade: an exact dup reports n_candidates = 0 even though
        # its bands would trivially match the old copy
        old = _docs(spark, [(1, LONG)])
        new = _docs(spark, [(101, LONG)])
        r = incremental_dedup_report(old, new).first()
        assert (r.dropped_exact, r.n_candidates) == (1, 0)

    def test_new_vs_new_dups_not_flagged(self, spark):
        # incremental semantics: within-batch duplicates are NOT this
        # operator's job (document dedup handles them)
        old = _docs(spark, [(1, OTHER)])
        new = _docs(spark, [(101, LONG), (102, LONG)])
        out = incremental_dedup_report(old, new).collect()
        assert all(r.is_kept == 1 for r in out)


class TestSynthBatch:
    def test_class_rotation(self, spark):
        docs = _docs(
            spark, [(i, LONG) for i in (0, 3, 6)] + [(1, OTHER)]
        )
        got = {r.doc_id: r.text for r in synth_new_batch(docs).collect()}
        assert set(got) == {NEW_OFFSET, NEW_OFFSET + 3, NEW_OFFSET + 6}
        assert got[NEW_OFFSET] == LONG                    # exact copy
        assert got[NEW_OFFSET + 3] != LONG                # mutant
        assert got[NEW_OFFSET + 3].split()[:3] == LONG.split()[:3]
        assert got[NEW_OFFSET + 6].split() == LONG.split()[::-1]


class TestPlanShape:
    def test_text_never_shuffles_no_cartesian(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = (
            incremental_dedup_report(docs, synth_new_batch(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        for m in re.findall(r"Exchange [^\n]*", plan):
            assert "text" not in m, m
