"""Image perceptual-hash dedup: the aHash kernel on decoded pixels,
invariance of the planted near-dup structure, the banded join vs the
DuckDB oracle, and the plan (pixels never cross an exchange)."""

from __future__ import annotations

import duckdb
import numpy as np

from pdf_extractor_spark.functions.imagehash import (
    FLIP_MASKS,
    ahash64,
    duck_phash_sql,
    fixture_phash_image,
    phash_near_dup_pairs,
    phash_signatures,
    target_bits,
)
from pdf_extractor_spark.operators.png_codec import png_decode

SF = "/root/testdata/sf0.001"


class TestKernel:
    def test_decoded_hash_equals_target_bits(self):
        """Round trip through the real codec: every member shape
        (both channel counts, many sizes/brightnesses/filters) hashes
        back to the pattern it was painted from."""
        for d in list(range(16)) + [101, 997, 4999]:
            px = png_decode(fixture_phash_image(d))
            assert ahash64(px) == target_bits(d), d

    def test_brightness_and_resolution_invariance(self):
        """Members 0 and 1 of a group differ in size, channel count
        and brightness but by exactly ONE pattern bit — the aHash
        distance through the real codec is 1."""
        for g in (0, 3, 11):
            h0 = ahash64(png_decode(fixture_phash_image(4 * g)))
            h1 = ahash64(png_decode(fixture_phash_image(4 * g + 1)))
            h2 = ahash64(png_decode(fixture_phash_image(4 * g + 2)))
            h3 = ahash64(png_decode(fixture_phash_image(4 * g + 3)))
            assert bin(h0 ^ h1).count("1") == 1
            assert bin(h0 ^ h2).count("1") == 3
            assert bin(h0 ^ h3).count("1") == 29

    def test_ahash_generic_on_synthetic_array(self):
        """The kernel is a real area-mean hash, not a fixture reader:
        a hand-built half-bright image hashes to the half-set mask."""
        img = np.full((32, 40, 3), 50, dtype=np.uint8)
        img[:, 20:, :] = 200  # right half bright => bits bx >= 4
        got = ahash64(img)
        want = sum(
            1 << (by * 8 + bx) for by in range(8) for bx in range(4, 8)
        )
        want -= 1 << 64  # bit 63 set -> two's-complement signed long
        assert got == want

    def test_pins_keep_hash_positive_and_mixed(self):
        for d in range(64):
            t = target_bits(d)
            assert t >> 63 == 0  # signed-bigint safe
            assert (t >> 60) & 1 and (t >> 62) & 1  # bright pins
            assert not ((t >> 61) & 1) and not ((t >> 63) & 1)


class TestOracleMatch:
    def test_pairs_match_duckdb(self, spark):
        got = [
            (r.left_id, r.right_id, r.hamming)
            for r in phash_near_dup_pairs(
                spark.read.parquet(f"{SF}/documents.parquet")
            ).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'"
        )
        want = [tuple(r) for r in con.execute(duck_phash_sql()).fetchall()]
        assert got == want
        assert len(got) >= 200  # 500 docs -> ~125 groups x 2 pairs
        assert {h for _, _, h in got} == {1, 3}

    def test_member_masks_are_disjoint_and_sized(self):
        assert bin(FLIP_MASKS[1]).count("1") == 1
        assert bin(FLIP_MASKS[2]).count("1") == 3
        assert bin(FLIP_MASKS[3]).count("1") == 29
        assert FLIP_MASKS[1] & FLIP_MASKS[2] == 0
        assert FLIP_MASKS[1] & FLIP_MASKS[3] == 0
        assert FLIP_MASKS[2] & FLIP_MASKS[3] == 0
        # none touch the pinned high cells
        for m in FLIP_MASKS:
            assert m >> 60 == 0


class TestPlan:
    def test_pixels_never_cross_an_exchange(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        df = phash_near_dup_pairs(docs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        for seg in plan.split("Exchange hashpartitioning")[1:]:
            head = seg.split("\n")[0]
            assert "payload#" not in head
            assert "text#" not in head

    def test_signature_stage_is_one_exchange_of_ids(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            phash_signatures(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly the doc_id spread before synthesis, nothing else
        assert plan.count("Exchange hashpartitioning") == 1


class TestCrossFormat:
    def test_same_content_hashes_identically_across_formats(self):
        from pdf_extractor_spark.functions.imagehash import (
            ahash64,
            fixture_cross_format,
        )
        from pdf_extractor_spark.operators.jpeg_codec import jpeg_decode
        from pdf_extractor_spark.operators.png_codec import png_decode

        for d in (0, 2, 3, 7, 12):  # matched docs (d % 4 != 1)
            png, jpg = fixture_cross_format(d)
            assert png[:4] == b"\x89PNG" and jpg[:2] == b"\xff\xd8"
            assert png != jpg  # byte-level dedup has no chance
            hp = ahash64(png_decode(png))
            planes, _m = jpeg_decode(jpg)
            hj = ahash64(planes[0][:, :, None])
            assert hp == hj, d

    def test_planted_invert_is_maximally_far(self):
        from pdf_extractor_spark.functions.imagehash import (
            ahash64,
            fixture_cross_format,
        )
        from pdf_extractor_spark.operators.jpeg_codec import jpeg_decode
        from pdf_extractor_spark.operators.png_codec import png_decode

        for d in (1, 5, 9):
            png, jpg = fixture_cross_format(d)
            hp = ahash64(png_decode(png))
            planes, _m = jpeg_decode(jpg)
            hj = ahash64(planes[0][:, :, None])
            assert bin((hp ^ hj) & (2**64 - 1)).count("1") == 64
