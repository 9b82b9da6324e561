"""A6 five-dimension quality battery tests (reference
quality_scorer.py:164-357 deduction rules)."""

from __future__ import annotations

from pdf_extractor_spark.config import DEFAULT_CONFIG
from pdf_extractor_spark.operators.quality import (
    score_accuracy,
    score_completeness,
    score_footnotes,
    score_quality,
    score_readability,
    score_structure,
)


class TestDimensions:
    def test_completeness(self):
        assert score_completeness("body text", 1.0) == 100.0
        assert score_completeness("body text", 0.6) == 60.0
        assert score_completeness("x [EXTRACTION ERROR] y", 1.0) == 90.0
        assert score_completeness("", 0.0) == 0.0

    def test_structure(self):
        # "page" present, no penalties
        assert score_structure("see page 3", 0, 1) == 100.0
        # no "page" → −10
        assert score_structure("plain body", 0, 1) == 90.0
        # >3 pages without section numbers → −10 more
        assert score_structure("plain body", 0, 4) == 80.0
        assert score_structure("plain 1.2 body", 0, 4) == 90.0
        # >5 pages without tables → −5
        assert score_structure("page 1.2 text", 0, 6) == 95.0
        # tables formatted → +5 (clamped at 100)
        assert score_structure("page | cell | [TABLE", 1, 1) == 100.0
        # excessive blank runs → −5
        assert score_structure("page a" + "\n" * 5 + "b", 0, 1) == 95.0

    def test_accuracy(self):
        assert score_accuracy("clean text") == 100.0
        noisy = " ".join(f"a{d}b" for d in range(6))   # 6 digit-in-word
        assert score_accuracy(noisy) == 90.0
        # separate runs — a single long run is ONE greedy match
        assert score_accuracy("x ??? y " * 6) == 90.0
        assert score_accuracy("x" + "?" * 18) == 100.0
        assert score_accuracy("bad" + "�" * 7) == 93.0  # −min(20, 7)
        assert score_accuracy("bad" + "�" * 50) == 80.0  # capped at −20

    def test_footnotes(self):
        assert score_footnotes(0, 1.0) == 100.0
        assert score_footnotes(4, 0.75) == 75.0
        assert score_footnotes(2, 0.0) == 0.0

    def test_readability(self):
        assert score_readability("a reasonable single line of text") == 100.0
        assert score_readability("short") == 90.0          # avg < 20
        assert score_readability("x" * 250) == 95.0        # long line
        # 400 repeated chars: −15 repeats AND −5 long line
        assert score_readability("abcde12345" * 40) == 80.0
        assert (
            score_readability("[DOCUMENT FILENAME: x] plus body text")
            == 100.0  # +5 clamped
        )

    def test_weighted_total_and_grade(self):
        q = score_quality(
            "body mentions page 1.2 here",
            coverage=1.0, n_pages=1, n_tables=0, n_markers=0,
            match_rate=1.0, cfg=DEFAULT_CONFIG,
        )
        assert q["score"] == 100.0 and q["grade"] == "A"
        assert set(q["dims"]) == {
            "completeness", "structure", "accuracy", "footnotes",
            "readability",
        }
        q2 = score_quality(
            "no mention of that word",
            coverage=0.5, n_pages=1, n_tables=0, n_markers=2,
            match_rate=0.0, cfg=DEFAULT_CONFIG,
        )
        # .3*50 + .25*90 + .2*100 + .15*0 + .1*100 = 67.5 → D
        assert q2["score"] == 67.5 and q2["grade"] == "D"
        assert q2["status"] == "POOR"
