"""Mojibake repair: the guarded inverse on hand-built cases, the
generated twin grammars, the fixture report vs DuckDB, and the plan
(one narrow map — no exchange, no UDF)."""

from __future__ import annotations

import re

import duckdb

from pdf_extractor_spark.functions.mojibake import (
    JAVA_SIG,
    JAVA_VALID_UTF8,
    RE2_SIG,
    RE2_VALID_UTF8,
    TAIL_CLEAN,
    TAIL_MOJI,
    duck_mojibake_sql,
    mojibake_report,
    synth_encoding_classes,
)

SF = "/root/testdata/sf0.001"


def _moji(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


class TestGrammars:
    def test_tails_are_inverses(self):
        assert TAIL_MOJI.encode("latin-1").decode("utf-8") == TAIL_CLEAN
        assert TAIL_MOJI != TAIL_CLEAN

    def test_validity_grammar_matches_python_decoder(self):
        """The generated RFC 3629 regex agrees with Python's strict
        UTF-8 decoder on a byte-pattern battery (read as Latin-1)."""
        rx = re.compile(JAVA_VALID_UTF8.replace("\\u00", "\\x"))
        cases = [
            b"plain ascii",
            "café".encode("utf-8"),
            "—…“”".encode("utf-8"),
            "🎉".encode("utf-8"),
            b"caf\xe9",            # bare latin-1 e-acute: invalid
            b"\xc3",               # truncated 2-byte seq
            b"\xe2\x80",           # truncated 3-byte seq
            b"\xc0\xaf",           # overlong
            b"\xed\xa0\x80",       # surrogate
            b"\xf4\x90\x80\x80",   # above U+10FFFF
            b"\x80abc",            # stray continuation
        ]
        for bs in cases:
            want = True
            try:
                bs.decode("utf-8")
            except UnicodeDecodeError:
                want = False
            got = bool(rx.fullmatch(bs.decode("latin-1")))
            assert got == want, bs

    def test_re2_forms_agree_with_java_forms(self):
        """Both engines' generated regexes classify the same strings
        the same way (DuckDB evaluates the RE2 form)."""
        con = duckdb.connect()
        probes = [
            "clean ascii",
            TAIL_CLEAN,
            TAIL_MOJI,
            _moji("émoji —"),
            "Ã stray lead, no continuation",
        ]
        jsig = re.compile(JAVA_SIG.replace("\\u00", "\\x"))
        jval = re.compile(JAVA_VALID_UTF8.replace("\\u00", "\\x"))
        for s in probes:
            r = con.execute(
                f"SELECT regexp_matches(?, '{RE2_SIG}'),"
                f" regexp_matches(?, '{RE2_VALID_UTF8}')",
                [s, s],
            ).fetchone()
            assert r[0] == bool(jsig.search(s)), s
            assert r[1] == bool(jval.fullmatch(s)), s


class TestRepairCases:
    def test_hand_built_rows(self, spark):
        cases = [
            # (text, want_detected, want_repaired, want_out)
            ("plain", False, False, "plain"),
            ("café naïve", False, False, "café naïve"),       # clean stays
            (_moji("café"), True, True, "café"),              # 2-byte fixed
            (_moji("a—b…c"), True, True, "a—b…c"),            # 3-byte fixed
            (_moji("🎉 party"), True, True, "🎉 party"),      # 4-byte fixed
            # signature present but emoji makes it non-Latin-1 — the
            # gate must refuse rather than corrupt
            (_moji("café") + "🎉", True, False, _moji("café") + "🎉"),
            # stray lead byte with no continuation: not even detected
            ("Ã then ascii", False, False, "Ã then ascii"),
        ]
        df = spark.createDataFrame(
            [(i, t) for i, (t, *_) in enumerate(cases)],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in mojibake_report(df).collect()}
        import hashlib

        for i, (t, det, rep, out) in enumerate(cases):
            r = rows[i]
            assert r.moji_detected == det, (i, t)
            assert r.repaired == rep, (i, t)
            assert r.out_md5 == hashlib.md5(out.encode()).hexdigest(), (
                i, t,
            )
            assert r.n_after == len(out)


class TestOracleMatch:
    def test_fixture_report_matches_duckdb(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = [
            tuple(r)
            for r in mojibake_report(synth_encoding_classes(docs)).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'"
        )
        want = [tuple(r) for r in con.execute(duck_mojibake_sql()).fetchall()]
        assert got == want
        # class structure: exactly the doc_id % 3 == 2 docs repaired
        n_class2 = sum(1 for r in got if r[0] % 3 == 2)
        reps = [r for r in got if r[2]]
        assert len(reps) == n_class2 > 100
        assert sum(1 for r in got if r[1]) == n_class2  # detected == class 2
        for r in reps:
            assert r[4] < r[3]  # repair shrinks the char count


class TestPlan:
    def test_single_narrow_map(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["text_mojibake_repair"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan
