"""Tests for the from-scratch RFC 3492 Punycode encoder and ACE
host fold (functions/idn.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.functions.idn import (
    IDN_HOSTS,
    host_to_ascii,
    punycode_encode,
)

# RFC 3492 §7.1 official sample strings (labels A-H cover Arabic,
# Chinese (simplified + traditional), Czech, Hebrew, Hindi, Japanese)
RFC_VECTORS = [
    (
        "ليهمابتكل"
        "موشعربي؟",
        "egbpdaj6bu4bxfgehfvwxn",
    ),
    (
        "他们为什么不说中文",
        "ihqwcrb4cv8a8dqg056pqjye",
    ),
    (
        "他們爲什麽不說中文",
        "ihqwctvzc91f659drss3x8bo0yb",
    ),
    (
        "Pročprostěnemluvíčesky",
        "Proprostnemluvesky-uyb24dma41a",
    ),
    (
        "למההםפשוט"
        "לאמדבריםע"
        "ברית",
        "4dbcagdahymbxekheh6e0a7fei0b",
    ),
    ("3年B組金八先生", "3B-ww4c5e180e575a65lsy2b"),
]


class TestPunycode:
    @pytest.mark.parametrize("label,expected", RFC_VECTORS)
    def test_rfc3492_sample_strings(self, label, expected):
        assert punycode_encode(label) == expected

    def test_fixture_pool_matches_stdlib(self):
        for h in IDN_HOSTS:
            if all(ord(c) < 128 for c in h):
                assert host_to_ascii(h) == h
            else:
                assert (
                    host_to_ascii(h)
                    == h.encode("idna").decode("ascii")
                )

    @settings(max_examples=100, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                min_codepoint=ord("a"),
                max_codepoint=0x2FFF,
                blacklist_categories=("Cs", "Cc", "Zs"),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_matches_stdlib_on_random_labels(self, label):
        # property: our encoder == CPython's punycode codec for any
        # label (the codec handles the raw RFC 3492 transform)
        assert (
            punycode_encode(label)
            == label.encode("punycode").decode("ascii")
        )

    def test_ascii_passthrough_and_case_fold(self):
        assert host_to_ascii("WWW.Example.COM") == "www.example.com"
        assert (
            host_to_ascii("SUB.Bücher.example")
            == "sub.xn--bcher-kva.example"
        )
