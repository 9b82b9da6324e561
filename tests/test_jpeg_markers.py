"""JPEG marker grammar: dimension sniff via length-field walk,
the Exif thumbnail trap, truncation, and the DuckDB twin."""

from __future__ import annotations

from pdf_extractor_spark.operators.jpeg_markers import (
    build_jpeg_header,
    jpeg_dimensions,
)

SF = "/root/testdata/sf0.001"


class TestMarkers:
    def test_baseline_and_progressive(self):
        assert jpeg_dimensions(build_jpeg_header(472, 234, 3)) == (
            472, 234, 3, False, True)
        assert jpeg_dimensions(
            build_jpeg_header(160, 90, 1, progressive=True)
        ) == (160, 90, 1, True, True)

    def test_exif_thumbnail_trap(self):
        # the APP1 payload embeds a fake 16x16 SOF; a byte-pattern
        # scan finds it FIRST — the length-field walk must not
        d = build_jpeg_header(640, 480, 3, exif_trap=True)
        fake = d.find(b"\xff\xc0")
        real_dims = jpeg_dimensions(d)
        assert fake >= 0 and fake < d.find(b"\xff\xc0", fake + 1)
        assert real_dims == (640, 480, 3, False, True)

    def test_truncated_and_garbage_fail_closed(self):
        t = build_jpeg_header(100, 100, truncate=True)
        assert jpeg_dimensions(t) == (-1, -1, -1, False, False)
        for bad in (b"", b"GIF89a", b"\xff\xd8", b"\xff\xd8\xff"):
            assert jpeg_dimensions(bad)[4] is False

    def test_fill_bytes_and_restart_markers_skipped(self):
        # padding FF fill bytes before a marker are legal (§B.1.1.2)
        d = build_jpeg_header(320, 240, 3, exif_trap=False)
        padded = d[:2] + b"\xff" + d[2:]
        assert jpeg_dimensions(padded) == (320, 240, 3, False, True)


class TestSparkOracle:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.multimodal import (
            duck_jpeg_dims_sql, jpeg_dims,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = jpeg_dims(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_jpeg_dims_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()
        # truncated docs exist and fail closed
        assert (~got[got.doc_id % 9 == 8].readable).all()


class TestImageSniff:
    def test_format_routing_and_dims(self):
        import numpy as np

        from pdf_extractor_spark.operators.image_sniff import (
            build_gif_header, build_webp_header, sniff_image,
        )
        from pdf_extractor_spark.operators.png_codec import png_encode

        assert sniff_image(build_gif_header(320, 200)) == (
            "gif", 320, 200)
        px = np.zeros((7, 9, 3), dtype=np.uint8)
        assert sniff_image(png_encode(px)) == ("png", 9, 7)
        for kind in ("vp8", "vp8l", "vp8x"):
            assert sniff_image(build_webp_header(641, 479, kind)) == (
                "webp", 641, 479), kind
        assert sniff_image(build_jpeg_header(200, 100)) == (
            "jpeg", 200, 100)

    def test_unknown_and_truncated_fail_closed(self):
        from pdf_extractor_spark.operators.image_sniff import (
            build_gif_header, build_webp_header, sniff_image,
        )

        assert sniff_image(b"BM\x00bitmapish") == ("unknown", -1, -1)
        assert sniff_image(b"") == ("unknown", -1, -1)
        assert sniff_image(build_gif_header(10, 10)[:7]) == (
            "gif", -1, -1)
        # a VP8 stream without its start code is corrupt, not 0x0
        bad = bytearray(build_webp_header(100, 100, "vp8"))
        bad[23] = 0x00
        assert sniff_image(bytes(bad)) == ("webp", -1, -1)

    def test_sniff_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.multimodal import (
            duck_image_sniff_sql, image_sniff,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = image_sniff(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_image_sniff_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert (gs.to_numpy() == ws.to_numpy()).all()
        assert set(got.format.unique()) == {
            "jpeg", "png", "gif", "webp", "unknown"}
