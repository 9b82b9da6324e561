"""MIME sniffing: grammar on hand-built byte payloads, the exact
fixture confusion matrix vs a pure-Python oracle, and the plan."""

from __future__ import annotations

from collections import Counter

from pdf_extractor_spark.functions.mimesniff import (
    FAMILY_BYTES,
    FAMILY_DECLARED,
    sniff_report,
    synth_payloads,
)

SF = "/root/testdata/sf0.001"


def _py_sniff(bs: bytes) -> str:
    """Reference implementation of the WHATWG-subset grammar."""
    s = bs.decode("latin-1")
    if s[:3] == "\xef\xbb\xbf":
        return "text/plain"
    t = s.lstrip(" \t\r\n\f").lower()
    if t.startswith("<!doctype html") or t.startswith("<html"):
        return "text/html"
    if s[:5] == "%PDF-":
        return "application/pdf"
    if s[:8] == "\x89PNG\r\n\x1a\n":
        return "image/png"
    if s[:6] in ("GIF87a", "GIF89a"):
        return "image/gif"
    if s[:2] == "\x1f\x8b":
        return "application/x-gzip"
    return "application/octet-stream"


class TestGrammar:
    def test_hand_built_payloads(self, spark):
        cases = [
            (b"%PDF-1.4 junk", "application/pdf"),
            (b"\x89PNG\r\n\x1a\ndata", "image/png"),
            (b"\x89PNG\r\n\x1a", "application/octet-stream"),  # cut
            (b"GIF87apixels", "image/gif"),
            (b"\x1f\x8b\x08rest", "application/x-gzip"),
            (b"  \t\r\n<HtMl><p>", "text/html"),
            (b"\f<!DoCtYpE hTmL>", "text/html"),
            # BOM preempts the tag patterns — spec step order
            (b"\xef\xbb\xbf<html>", "text/plain"),
            (b"\x00\x01\x02", "application/octet-stream"),
            (b"almost <html>", "application/octet-stream"),
        ]
        df = spark.createDataFrame(
            [(bs, f"c{i}") for i, (bs, _) in enumerate(cases)],
            "payload binary, declared string",
        )
        got = {r.declared: r.sniffed
               for r in sniff_report(df).collect()}
        for i, (bs, want) in enumerate(cases):
            assert got[f"c{i}"] == want, bs
            assert _py_sniff(bs) == want, bs  # oracle agrees


class TestFixtureMatrix:
    def test_exact_confusion_matrix(self, spark):
        """The Spark matrix must equal the pure-Python closed form
        over the same doc_id range."""
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        ids = [r.doc_id for r in docs.select("doc_id").collect()]
        expect: Counter = Counter()
        for d in ids:
            fam = d % 6
            payload = FAMILY_BYTES[fam] + bytes([32 + d % 200])
            declared = FAMILY_DECLARED[
                (fam + 1) % 6 if d % 7 == 0 else fam
            ]
            expect[(declared, _py_sniff(payload))] += 1
        rows = sniff_report(synth_payloads(docs)).collect()
        got = {(r.declared, r.sniffed): r.n_docs for r in rows}
        assert got == dict(expect)
        for r in rows:
            assert r.mismatch == (r.declared != r.sniffed)
        # the BOM family is a mismatch even when declared honestly
        assert ("text/html", "text/plain") in got


class TestPlan:
    def test_payload_bytes_never_cross_an_exchange(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_mime_sniff"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        for seg in plan.split("Exchange hashpartitioning")[1:]:
            assert "payload#" not in seg.split("\n")[0]
