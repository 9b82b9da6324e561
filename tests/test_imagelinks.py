"""(image URL, alt text) harvesting: img/src, lazy data-src, srcset
candidates, picture/source, decorative alt, template inertness, and
RFC 3986 resolution of every reference."""

from __future__ import annotations

from pdf_extractor_spark.functions.imagelinks import (
    _srcset_urls,
    image_links,
    wrap_html_images,
)
from pdf_extractor_spark.operators.html_extract import harvest_images

SF = "/root/testdata/sf0.001"


class TestHarvest:
    def test_plain_img_with_alt(self):
        out = harvest_images(
            b"<html><body><img src='/a.jpg' alt='pic'></body></html>"
        )
        assert out == [("img", "/a.jpg", "", "pic")]

    def test_lazy_data_src_replaces_stub(self):
        out = harvest_images(
            b"<html><body><img src='data:image/gif;base64,R0' "
            b"data-src='/real.jpg' alt='z'></body></html>"
        )
        assert out == [("img", "/real.jpg", "", "z")]

    def test_template_images_inert(self):
        out = harvest_images(
            b"<html><body><template><img src='/evil.jpg'>"
            b"</template><img src='/ok.jpg'></body></html>"
        )
        assert [u for _t, u, _s, _a in out] == ["/ok.jpg"]

    def test_srcset_candidates(self):
        assert _srcset_urls("/a-1x.jpg 1x, /a-2x.jpg 2x") == [
            "/a-1x.jpg", "/a-2x.jpg"
        ]
        assert _srcset_urls("/w.jpg 640w,/v.jpg") == [
            "/w.jpg", "/v.jpg"
        ]

    def test_picture_source_and_fallback(self):
        out = harvest_images(
            b"<html><body><picture>"
            b"<source srcset='/p.webp'><img src='/p.jpg' alt='art'>"
            b"</picture></body></html>"
        )
        assert ("source", "", "/p.webp", "") in out
        assert ("img", "/p.jpg", "", "art") in out


class TestSparkStage:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.imagelinks import (
            duck_image_links_sql,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = image_links(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_image_links_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()

    def test_urls_fully_resolved(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = image_links(docs).toPandas()
        assert got["url"].str.startswith("https://gal").all()
        assert not got["url"].str.contains("data:").any()


class TestNoscriptFallback:
    def test_noscript_images_harvested_text_still_skipped(self):
        from pdf_extractor_spark.config import DEFAULT_CONFIG
        from pdf_extractor_spark.operators.html_extract import (
            extract_html,
        )

        html = (
            b"<html><body><p>the real page content stays here with "
            b"plenty of words to keep the block</p>"
            b"<noscript><img src='/ns/9.jpg' alt='fb'>"
            b"<p>enable javascript please</p></noscript></body></html>"
        )
        out = harvest_images(html)
        assert ("img", "/ns/9.jpg", "", "fb") in out
        text = extract_html(html, DEFAULT_CONFIG)[0]
        assert "enable javascript" not in text  # text stays skipped

    def test_template_still_inert_for_images(self):
        out = harvest_images(
            b"<html><body><template><img src='/evil.jpg'>"
            b"</template></body></html>"
        )
        assert out == []


class TestCaptionFilter:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.imagelinks import (
            caption_filter_report, duck_caption_filter_sql,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = caption_filter_report(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_caption_filter_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values("doc_id").reset_index(drop=True)
        ws = want[cols].sort_values("doc_id").reset_index(drop=True)
        assert (gs.to_numpy() == ws.to_numpy()).all()

    def test_placeholders_and_empties_drop(self, spark):
        from pdf_extractor_spark.functions.imagelinks import (
            caption_filter_report,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = caption_filter_report(docs).toPandas()
        # every doc keeps its 'photo t' caption; single-word alts
        # (lazy/art/fallback), empties and placeholders never pass
        assert (got["n_kept"] >= 1).all()
        assert (got["n_kept"] <= 3).all()
        assert (got["n_kept"] < got["n_candidates"]).any()
