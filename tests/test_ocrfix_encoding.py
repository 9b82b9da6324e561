"""F7 OCR-fix chain + P11 encoding scrub + A11 error rollup tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.config import DEFAULT_CONFIG, ExtractConfig
from pdf_extractor_spark.operators.encoding import (
    count_bad_chars,
    fix_encoding_text,
)
from pdf_extractor_spark.operators.ocrfix import (
    ocr_fix_col,
    ocr_fix_text,
    ocr_issue_flags,
)

SF = "/root/testdata/sf0.001"


class TestOcrFixChain:
    def test_digit_letter_confusions(self):
        assert ocr_fix_text("Th1s mis5ing c0nnect") == "This missing connect"
        # overlapping chain needs the second pass
        assert ocr_fix_text("a1b1c1d") == "aibicid"
        # uppercase context untouched (reference safe patterns: MP3, A4)
        assert ocr_fix_text("MP3 and A4 and CO2") == "MP3 and A4 and CO2"

    def test_affix_joins(self):
        assert ocr_fix_text("process ing then dis connect") == (
            "processing then disconnect"
        )
        # standalone English words must NOT be joined by a global chain
        assert ocr_fix_text("jumps over the dog") == "jumps over the dog"
        assert ocr_fix_text("he was able to go") == "he was able to go"
        # suffix boundary: "ing" inside a longer word is not a suffix tok
        assert ocr_fix_text("mess ingest") == "mess ingest"

    def test_spaces_and_jp_punct(self):
        assert ocr_fix_text("spaced     out") == "spaced  out"
        assert ocr_fix_text("done。。。 next、、") == "done。 next、"

    def test_flag_only_patterns_unfixed(self):
        s = "rnany Il1 O0 stay"
        assert ocr_fix_text(s) == s

    def test_kernel_twin_matches_spark_chain(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
        noisy = F.concat(
            F.lit("Th1s mis5ing process ing dis connect a   b。。 "),
            F.col("text"),
        )
        got = {
            r["doc_id"]: r["fixed"]
            for r in docs.select(
                "doc_id", ocr_fix_col(noisy).alias("fixed")
            ).collect()
        }
        want = {
            r["doc_id"]: ocr_fix_text(
                "Th1s mis5ing process ing dis connect a   b。。 " + r["text"]
            )
            for r in docs.select("doc_id", "text").collect()
        }
        assert got == want

    def test_issue_flags(self, spark):
        df = spark.createDataFrame(
            [(1, "w0rd with Il1 and rnany   spaces。。")],
            "doc_id long, text string",
        )
        row = df.select(*ocr_issue_flags(F.col("text"))).collect()[0]
        assert row["has_digit_in_word"]
        assert row["has_ambiguous_il1"]
        assert row["has_rn_as_m"]
        assert row["has_excess_spaces"]
        assert row["has_duplicate_punct"]

    def test_extraction_hook_off_by_default_on_when_enabled(self):
        from pdf_extractor_spark.fixtures.corpus import fixture_cases
        from pdf_extractor_spark.operators.document import extract_document

        payload = {c[0]: c[3] for c in fixture_cases()}[
            "pdf-ocr-confusions"
        ]
        off = extract_document(payload, DEFAULT_CONFIG)
        assert "Th1s mis5ing c0nnect" in off["extracted_text"]
        on = extract_document(
            payload, ExtractConfig(ocr_fix_enabled=True)
        )
        assert "This missing connect needs fixing badly" in on["extracted_text"]
        assert "processing then disconnect cleanly" in on["extracted_text"]
        # flag-only confusions survive both ways
        assert "rnany Il1 O0 stay flagged unfixed" in on["extracted_text"]


class TestEncodingScrub:
    def test_kernel(self):
        assert fix_encoding_text("a�b\x00c") == "abc"
        assert fix_encoding_text(r"caf\xe9 bar") == "caf\xe9 bar".replace(
            r"\xe9", "\xe9"
        )
        assert count_bad_chars("x�y\x00z�") == 3

    def test_html_damage_flagged_and_scrubbed(self):
        from pdf_extractor_spark.fixtures.corpus import fixture_cases
        from pdf_extractor_spark.operators.document import extract_document

        payload = {c[0]: c[3] for c in fixture_cases()}[
            "html-encoding-damage"
        ]
        rec = extract_document(payload, DEFAULT_CONFIG)
        t = rec["extracted_text"]
        assert "damaged text with enough length" in t
        assert "�" not in t
        kinds = {(e["type"], e["severity"]) for e in rec["errors"]}
        assert ("encoding", "warning") in kinds
        # scrubbed damage is recoverable: no error/critical severities
        assert not any(
            e["severity"] in ("error", "critical") for e in rec["errors"]
        )
        # spans index the CLEANED text
        for s in rec["spans"]:
            assert t[s[0]:s[1]].strip()

    def test_scrub_disabled_keeps_damage(self):
        from pdf_extractor_spark.fixtures.corpus import fixture_cases
        from pdf_extractor_spark.operators.document import extract_document

        payload = {c[0]: c[3] for c in fixture_cases()}[
            "html-encoding-damage"
        ]
        rec = extract_document(
            payload, ExtractConfig(encoding_scrub_enabled=False)
        )
        assert "�" in rec["extracted_text"]


class TestErrorRollup:
    def test_planted_taxonomy_counts(self, spark):
        from pdf_extractor_spark.sources.docwrap import error_rollup

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = {
            (r["error_type"], r["severity"]): (
                r["n_occurrences"], r["n_docs"]
            )
            for r in error_rollup(docs).collect()
        }
        n3 = docs.where("doc_id % 10 = 3").count()
        n7 = docs.where("doc_id % 10 = 7").count()
        assert rows[("empty_page", "error")] == (n3, n3)
        assert rows[("encoding", "error")] == (n7, n7)
        assert set(rows) == {("empty_page", "error"), ("encoding", "error")}


class TestIssueOverlapResolution:
    """W7 (reference llm_verifier.py:265-282): overlapping detected
    issues resolve to the higher-confidence one."""

    def test_spans_detected_in_order(self):
        from pdf_extractor_spark.operators.ocrfix import (
            detect_issue_spans,
        )

        text = "word w1th   spaces and rnore"
        spans = detect_issue_spans(text)
        types = [s["type"] for s in spans]
        assert "digit_in_word" in types
        assert "excess_spaces" in types
        assert "rn_as_m" in types
        starts = [s["start"] for s in spans]
        assert starts == sorted(starts)

    def test_overlap_keeps_higher_confidence(self):
        from pdf_extractor_spark.operators.ocrfix import (
            resolve_issue_overlaps,
        )

        issues = [
            {"start": 0, "end": 5, "type": "rn_as_m", "confidence": 0.5},
            {"start": 3, "end": 8, "type": "digit_in_word",
             "confidence": 0.8},
        ]
        kept = resolve_issue_overlaps(issues)
        assert len(kept) == 1
        assert kept[0]["type"] == "digit_in_word"

    def test_non_overlapping_all_kept_in_doc_order(self):
        from pdf_extractor_spark.operators.ocrfix import (
            resolve_issue_overlaps,
        )

        issues = [
            {"start": 10, "end": 15, "type": "rn_as_m",
             "confidence": 0.5},
            {"start": 0, "end": 5, "type": "digit_in_word",
             "confidence": 0.8},
        ]
        kept = resolve_issue_overlaps(issues)
        assert [k["start"] for k in kept] == [0, 10]

    def test_chain_overlap_greedy_by_confidence(self):
        from pdf_extractor_spark.operators.ocrfix import (
            resolve_issue_overlaps,
        )

        # A overlaps B, B overlaps C, A and C disjoint: B (highest)
        # wins, then A and C are both rejected? No — only spans that
        # overlap an ACCEPTED span are rejected: B accepted first,
        # A and C each overlap B, so only B survives.
        issues = [
            {"start": 0, "end": 6, "type": "ambiguous_il1",
             "confidence": 0.65},
            {"start": 4, "end": 10, "type": "excess_spaces",
             "confidence": 0.9},
            {"start": 8, "end": 14, "type": "rn_as_m",
             "confidence": 0.5},
        ]
        kept = resolve_issue_overlaps(issues)
        assert [k["type"] for k in kept] == ["excess_spaces"]

    def test_deterministic_tie_break(self):
        from pdf_extractor_spark.operators.ocrfix import (
            resolve_issue_overlaps,
        )

        issues = [
            {"start": 0, "end": 4, "type": "ambiguous_o0",
             "confidence": 0.7},
            {"start": 2, "end": 6, "type": "ambiguous_o0",
             "confidence": 0.7},
        ]
        kept = resolve_issue_overlaps(issues)
        assert len(kept) == 1
        assert kept[0]["start"] == 0  # earlier span wins the tie

    def test_adjacent_distinct_issues_are_disjoint(self):
        # span patterns use lookarounds, not consumed boundary chars:
        # 'O0 Il1' is TWO disjoint issues, both kept after resolution
        from pdf_extractor_spark.operators.ocrfix import (
            detect_issue_spans,
            resolve_issue_overlaps,
        )

        spans = detect_issue_spans("O0 Il1")
        assert [(s["start"], s["end"]) for s in spans] == [(0, 2), (3, 6)]
        assert len(resolve_issue_overlaps(spans)) == 2

    def test_adjacent_repeats_all_detected(self):
        from pdf_extractor_spark.operators.ocrfix import (
            detect_issue_spans,
        )

        spans = detect_issue_spans("ll ll ll")
        assert len(spans) == 3  # boundary chars not consumed

    def test_span_and_flag_patterns_agree_on_detection(self):
        import re

        from pdf_extractor_spark.operators.ocrfix import (
            OCR_ISSUE_PATTERNS,
            OCR_ISSUE_SPAN_PATTERNS,
        )

        flag = dict(OCR_ISSUE_PATTERNS)
        span = dict(OCR_ISSUE_SPAN_PATTERNS)
        assert set(flag) == set(span)
        samples = [
            "O0 Il1", "ll ll ll", "w1th", "rnore problems", "a   b",
            "。。done", "clean text here", "x Il1x", "O0", "5O0 5",
        ]
        for text in samples:
            for name in flag:
                got_flag = bool(re.search(flag[name], text))
                got_span = bool(re.search(span[name], text))
                assert got_flag == got_span, (name, text)
