"""Content-license harvest: the three declaration surfaces, the rel
token-list semantics, template inertness, CC URL normalization with
the conservative unknown default, and the DuckDB twin."""

from __future__ import annotations

from pdf_extractor_spark.functions.license import (
    ldjson_license_urls,
    normalize_license,
    wrap_html_license,
)
from pdf_extractor_spark.operators.html_extract import harvest_license

SF = "/root/testdata/sf0.001"


class TestNormalize:
    def test_cc_families(self):
        assert normalize_license(
            "https://creativecommons.org/licenses/by/4.0/"
        ) == ("by", "4.0", True, True)
        assert normalize_license(
            "http://creativecommons.org/licenses/by-nc-sa/3.0/deed.ja"
        ) == ("by-nc-sa", "3.0", False, True)
        assert normalize_license(
            "https://creativecommons.org/licenses/by-nd/2.5/"
        ) == ("by-nd", "2.5", True, False)

    def test_public_domain(self):
        assert normalize_license(
            "https://creativecommons.org/publicdomain/zero/1.0/"
        ) == ("cc0", "1.0", True, True)
        assert normalize_license(
            "https://creativecommons.org/publicdomain/mark/1.0/"
        ) == ("publicdomain-mark", "1.0", True, True)

    def test_unknown_is_conservative(self):
        # an unparseable license is NOT a permissive one
        assert normalize_license("https://example.com/terms") == (
            "unknown", "", False, False
        )
        # 'nc' must be a dash-token, not a substring
        fam, _v, com, _d = normalize_license(
            "https://creativecommons.org/licenses/by-sa/4.0/"
        )
        assert fam == "by-sa" and com is True


class TestHarvest:
    def test_link_badge_and_jsonld_surfaces(self):
        html = (
            b'<html><head>'
            b'<link rel="license" href="https://c/l1">'
            b'<script type="application/ld+json">'
            b'{"license": {"@id": "https://c/l3"}}</script>'
            b'</head><body>'
            b'<a rel="nofollow license" href="https://c/l2">badge</a>'
            b"</body></html>"
        )
        decls, islands = harvest_license(html)
        assert decls == [("link", "https://c/l1"), ("a", "https://c/l2")]
        assert [u for raw in islands
                for u in ldjson_license_urls(raw)] == ["https://c/l3"]

    def test_traps_declare_nothing(self):
        html = (
            b"<html><head><template>"
            b'<link rel="license" href="https://c/inert">'
            b"</template></head><body>"
            b'<a rel="license">no target</a>'
            b'<a rel="licenses" href="https://c/x">wrong token</a>'
            b"</body></html>"
        )
        decls, islands = harvest_license(html)
        assert decls == []

    def test_wrapper_schedule(self):
        got = {}
        for d in range(6):
            decls, islands = harvest_license(wrap_html_license("t", d))
            urls = list(decls) + [
                ("jsonld", u) for raw in islands
                for u in ldjson_license_urls(raw)
            ]
            got[d] = urls
        assert got[0] == []
        assert got[1] == [
            ("link", "https://creativecommons.org/licenses/by/4.0/")
        ]
        assert got[2][0][0] == "a"
        assert got[3] == [
            ("jsonld",
             "https://creativecommons.org/publicdomain/zero/1.0/")
        ]
        assert len(got[4]) == 2  # the conflict surfaces BOTH
        assert got[5][0][1].startswith("https://example.test/terms-")
        # the @id node form decodes identically to the string form
        _d9, i9 = harvest_license(wrap_html_license("t", 9))
        assert ldjson_license_urls(i9[0]) == [
            "https://creativecommons.org/publicdomain/zero/1.0/"
        ]


class TestSparkOracle:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.license import (
            duck_license_sql, license_signals,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = license_signals(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_license_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()
