"""HTTP revalidation (conditional fetch): 304 Not Modified captures
carry prior text forward through a doc_id state join; 200s extract
fresh; orphan 304s surface loudly.  The pre-fetch twin of revisit
resolution."""

from __future__ import annotations

from pdf_extractor_spark.sources.warc import (
    _ORPHAN_URL_OFFSET,
    build_recrawl_archive,
    duck_recrawl_sql,
    extract_recrawl,
    process_recrawl,
)

SF = "/root/testdata/sf0.001"

_TEXT = ("the quick brown fox jumps over the lazy dog while the "
         "engine keeps bytes stable across runs doc {}")


def _rows(ids):
    pages = [(i, _TEXT.format(i)) for i in ids]
    return extract_recrawl(build_recrawl_archive(pages))


class TestWriterReader:
    def test_schedule_and_statuses(self):
        rows = _rows(range(0, 24))
        by_status = {200: [], 304: []}
        for r in rows:
            by_status[r["http_status"]].append(r)
        assert sorted(r["doc_id"] % _ORPHAN_URL_OFFSET
                      for r in by_status[304]) == [
            i for i in range(24) if i % 3 == 0
        ]
        # 304s are body-less; 200s extracted the updated body
        assert all(r["new_text"] is None for r in by_status[304])
        assert all(
            r["new_text"] == _TEXT.format(r["doc_id"]) + " updated"
            for r in by_status[200]
        )

    def test_etag_header_parses(self):
        rows = _rows(range(0, 9))
        assert all(
            r["etag"].startswith('"') and r["etag"].endswith('"')
            for r in rows
        )

    def test_orphan_url_shift(self):
        rows = _rows(range(0, 30))
        orphans = [r for r in rows
                   if r["doc_id"] >= _ORPHAN_URL_OFFSET]
        assert sorted(r["doc_id"] - _ORPHAN_URL_OFFSET
                      for r in orphans) == [6, 27]
        assert all(r["http_status"] == 304 for r in orphans)

    def test_dates_two_days_later(self):
        rows = _rows(range(0, 4))
        assert all(r["warc_ts"].startswith("2024-01-03") for r in rows)


class TestSparkMerge:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = process_recrawl(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_recrawl_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()

    def test_origins(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = process_recrawl(docs).toPandas().set_index("doc_id")
        assert got.loc[3, "origin"] == "revalidated"
        assert got.loc[1, "origin"] == "refetched"
        orphan = got.loc[6 + _ORPHAN_URL_OFFSET]
        assert orphan["origin"] == "orphan"
        assert orphan["extracted_text"] == ""
        # revalidated text == prior corpus text, untouched
        texts = {
            r["doc_id"]: r["text"]
            for r in docs.select("doc_id", "text").collect()
        }
        assert got.loc[3, "extracted_text"] == texts[3]

    def test_plan_no_cartesian_one_state_join(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_conditional_fetch"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # the 200 leg must not touch the state table: exactly one
        # join in the whole plan (the 304 state attach)
        assert plan.count("Join") == 1
