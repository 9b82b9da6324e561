

class TestG711:
    def test_companding_error_bounds_and_projection(self):
        import numpy as np

        from pdf_extractor_spark.operators.wav_codec import (
            alaw_decode,
            alaw_encode,
            ulaw_decode,
            ulaw_encode,
        )

        s = np.arange(-32768, 32768, dtype=np.int16)
        for enc, dec, bound, small in (
            (ulaw_encode, ulaw_decode, 1024, 8),
            (alaw_encode, alaw_decode, 1024, 16),
        ):
            q = dec(enc(s))
            err = np.abs(q.astype(np.int32) - s.astype(np.int32))
            assert err.max() <= bound
            # logarithmic: small signals quantize much finer
            assert err[32768 - 256:32768 + 256].max() <= small
            # decode∘encode is a projection (idempotent on its image)
            assert np.array_equal(dec(enc(q)), q)

    def test_alaw_decode_matches_itu_table(self):
        # Classic Sun alaw2linear form of ITU-T G.711 table 2:
        # seg 0 -> (mant<<4)+8 ; seg>0 -> ((mant<<4)+0x108)<<(seg-1)
        import numpy as np

        from pdf_extractor_spark.operators.wav_codec import alaw_decode

        codes = np.arange(256, dtype=np.uint8)
        got = alaw_decode(codes).astype(np.int32)
        for c in range(256):
            a = c ^ 0x55
            seg = (a >> 4) & 7
            mant = a & 0x0F
            mag = (
                (mant << 4) + 8 if seg == 0
                else ((mant << 4) + 0x108) << (seg - 1)
            )
            want = mag if (a & 0x80) else -mag
            assert got[c] == want, (c, got[c], want)

    def test_wav_container_routes_g711_tags(self):
        import numpy as np

        from pdf_extractor_spark.operators.wav_codec import (
            WavError,
            ulaw_decode,
            ulaw_encode,
            wav_decode,
            wav_encode_g711,
        )

        rng = np.random.RandomState(5)
        s = rng.randint(-30000, 30000, size=(333, 1)).astype(np.int16)
        data = wav_encode_g711(s, "ulaw", sample_rate=8000)
        pcm, rate = wav_decode(data)
        assert rate == 8000
        assert np.array_equal(
            pcm[:, 0], ulaw_decode(ulaw_encode(s[:, 0]))
        )
        try:
            wav_encode_g711(s, "gsm")
            raise AssertionError("unknown law accepted")
        except WavError:
            pass
