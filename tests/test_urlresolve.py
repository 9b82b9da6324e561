"""RFC 3986 reference resolution: the spec's §5.4 vector battery,
<base href> semantics (first wins, template inert), fragment-only
exclusion, and the resolved-link harvest vs its oracle."""

from __future__ import annotations

import pytest

from pdf_extractor_spark.functions.urlresolve import (
    remove_dot_segments,
    resolve_ref,
    resolved_links,
    wrap_html_rel_links,
)

SF = "/root/testdata/sf0.001"

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 normal + §5.4.2 abnormal examples, verbatim
VECTORS = {
    "g:h": "g:h", "g": "http://a/b/c/g", "./g": "http://a/b/c/g",
    "g/": "http://a/b/c/g/", "/g": "http://a/g", "//g": "http://g",
    "?y": "http://a/b/c/d;p?y", "g?y": "http://a/b/c/g?y",
    "#s": "http://a/b/c/d;p?q#s", "g#s": "http://a/b/c/g#s",
    "g?y#s": "http://a/b/c/g?y#s", ";x": "http://a/b/c/;x",
    "g;x": "http://a/b/c/g;x", "g;x?y#s": "http://a/b/c/g;x?y#s",
    "": "http://a/b/c/d;p?q", ".": "http://a/b/c/",
    "./": "http://a/b/c/", "..": "http://a/b/", "../": "http://a/b/",
    "../g": "http://a/b/g", "../..": "http://a/",
    "../../": "http://a/", "../../g": "http://a/g",
    "../../../g": "http://a/g", "../../../../g": "http://a/g",
    "/./g": "http://a/g", "/../g": "http://a/g",
    "g.": "http://a/b/c/g.", ".g": "http://a/b/c/.g",
    "g..": "http://a/b/c/g..", "..g": "http://a/b/c/..g",
    "./../g": "http://a/b/g", "./g/.": "http://a/b/c/g/",
    "g/./h": "http://a/b/c/g/h", "g/../h": "http://a/b/c/h",
    "g;x=1/./y": "http://a/b/c/g;x=1/y",
    "g;x=1/../y": "http://a/b/c/y",
    "g?y/./x": "http://a/b/c/g?y/./x",
    "g?y/../x": "http://a/b/c/g?y/../x",
    "g#s/./x": "http://a/b/c/g#s/./x",
    "g#s/../x": "http://a/b/c/g#s/../x",
}


class TestResolveRef:
    @pytest.mark.parametrize("ref,want", sorted(VECTORS.items()))
    def test_rfc3986_54_vectors(self, ref, want):
        assert resolve_ref(BASE, ref) == want

    def test_dot_segments(self):
        assert remove_dot_segments("/a/b/../c/./d") == "/a/c/d"
        assert remove_dot_segments("mid/content=5/../6") == "mid/6"


class TestBaseHarvest:
    def test_first_base_wins_template_inert(self):
        from pdf_extractor_spark.operators.html_extract import (
            harvest_directives,
        )

        # doc 7: %3==1 declares the cdn base AND a second (ignored)
        # base; doc 2 buries one in <template>
        out = harvest_directives(wrap_html_rel_links("t", 7))
        bases = [v for k, v in out if k == "base"]
        assert bases == ["https://cdn0.example/a/b/"]
        out2 = harvest_directives(wrap_html_rel_links("t", 2))
        assert [v for k, v in out2 if k == "base"] == []


class TestSparkStage:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.urlresolve import (
            duck_resolved_links_sql,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = resolved_links(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_resolved_links_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()

    def test_fragment_only_never_an_edge(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = resolved_links(docs).toPandas()
        # exactly five edges per doc — the #frag anchor vanished
        assert (got.groupby("doc_id").size() == 5).all()
        assert not got["url"].str.contains("#").any()
