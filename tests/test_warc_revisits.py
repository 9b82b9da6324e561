"""WARC revisit records (WARC 1.1 §6.7.2, identical-payload-digest
profile): writer emits digest-stamped responses, earlier mirror
captures and body-less revisit records; the reader surfaces typed
capture rows; resolution is a corpus-wide digest join with
earliest-capture-wins and a loud 'unresolved' trap."""

from __future__ import annotations

from pdf_extractor_spark.sources.warc import (
    _MIRROR_CAPTURE_OFFSET,
    build_crawl_archive,
    duck_revisits_sql,
    extract_captures,
    extract_responses,
    resolve_revisits,
)

SF = "/root/testdata/sf0.001"


def _capture_rows(ids):
    pages = [(i, f"unique body text {i} with some words") for i in ids]
    return extract_captures(build_crawl_archive(pages))


class TestWriterReader:
    def test_revisit_schedule(self):
        rows = _capture_rows(range(0, 24))
        revisits = [r for r in rows if r["kind"] == "revisit"]
        assert sorted(r["doc_id"] for r in revisits) == [
            i for i in range(24) if i % 4 == 1
        ]
        # revisit records carry NO body text — only the digest
        assert all(r["extracted_text"] is None for r in revisits)
        assert all(r["digest"].startswith("md5:") for r in revisits)

    def test_mirror_captures_earlier_same_digest(self):
        rows = _capture_rows(range(0, 24))
        resp = [r for r in rows if r["kind"] == "response"]
        mirrors = {r["doc_id"]: r for r in resp
                   if r["capture_id"] >= _MIRROR_CAPTURE_OFFSET}
        primaries = {r["doc_id"]: r for r in resp
                     if r["capture_id"] < _MIRROR_CAPTURE_OFFSET}
        assert sorted(mirrors) == [i for i in range(24) if i % 6 == 3]
        for did, m in mirrors.items():
            p = primaries[did]
            assert m["digest"] == p["digest"]
            assert m["warc_ts"] < p["warc_ts"]
            assert m["extracted_text"] == p["extracted_text"]

    def test_alien_digest_matches_no_response(self):
        rows = _capture_rows(range(0, 40))
        resp_digests = {r["digest"] for r in rows
                        if r["kind"] == "response"}
        aliens = [r for r in rows if r["kind"] == "revisit"
                  and r["doc_id"] % 20 == 13]
        assert aliens and all(
            r["digest"] not in resp_digests for r in aliens
        )

    def test_roundtrip_reader_unaffected(self):
        # the frozen roundtrip contract: extract_responses never sees
        # mirror URLs or revisit records from the classic builder, and
        # on the crawl builder it must not duplicate doc rows
        pages = [(i, f"body {i}") for i in range(12)]
        rows = extract_responses(build_crawl_archive(pages))
        ids = [r["doc_id"] for r in rows]
        # mirrors ARE responses at another URL — the classic reader
        # keys rows off the primary-URL pattern only
        assert sorted(ids) == sorted(
            [i for i in range(12)] + [i for i in range(12) if i % 6 == 3]
        ) or sorted(set(ids)) == list(range(12))


class TestSparkResolution:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = resolve_revisits(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_revisits_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()

    def test_mirror_wins_and_trap_surfaces(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = resolve_revisits(docs).toPandas().set_index("doc_id")
        # doc 9: %4==1 revisit, %6==3 mirror → earliest capture is
        # the mirror
        assert got.loc[9, "src_capture"] == 9 + _MIRROR_CAPTURE_OFFSET
        assert got.loc[9, "status"] == "resolved"
        # doc 13: alien digest → loudly unresolved, sentinel values
        assert got.loc[13, "status"] == "unresolved"
        assert got.loc[13, "src_capture"] == -1
        assert got.loc[13, "extracted_text"] == ""
        # doc 1: plain self-resolution
        assert got.loc[1, "src_capture"] == 1

    def test_resolved_text_is_source_text(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = resolve_revisits(docs).toPandas()
        texts = {
            r["doc_id"]: r["text"]
            for r in docs.select("doc_id", "text").collect()
        }
        for _i, row in got[got["status"] == "resolved"].iterrows():
            assert row["extracted_text"] == texts[row["doc_id"]]

    def test_plan_no_cartesian(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_warc_revisits"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
