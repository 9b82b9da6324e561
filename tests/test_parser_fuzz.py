"""Corruption containment for the SOURCE parsers, companion to
tests/test_codec_fuzz.py: random byte corruption of a valid payload
must parse or raise ValueError (UnicodeDecodeError and
JSONDecodeError are subclasses) — never KeyError/IndexError/
AttributeError.  The CDX-J parser leaked KeyError on valid-JSON
lines with corrupted field names until this suite existed."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pdf_extractor_spark.operators.exif_tiff import (
    build_exif_tiff,
    parse_exif_tiff,
)
from pdf_extractor_spark.operators.svg_extract import (
    build_svg,
    svg_extract_text,
)
from pdf_extractor_spark.sources.cdx import build_cdxj, parse_cdxj
from pdf_extractor_spark.sources.feeds import (
    build_atom,
    build_rss,
    parse_feed,
)
from pdf_extractor_spark.sources.sitemaps import (
    build_urlset,
    parse_urlset,
)
from pdf_extractor_spark.sources.warc import (
    build_archive,
    build_wet,
    parse_warc,
    parse_wet,
)

_PAGES = [(i, f"body text {i} alpha beta") for i in range(6)]

CASES = [
    ("warc", build_archive(_PAGES), parse_warc),
    (
        "wet",
        build_wet([(i, f"http://h{i}.test/", f"text {i}") for i in range(6)]),
        parse_wet,
    ),
    ("cdxj", build_cdxj(list(range(8))), parse_cdxj),
    ("rss", build_rss(_PAGES), parse_feed),
    ("atom", build_atom(_PAGES), parse_feed),
    ("urlset", build_urlset(list(range(8))), parse_urlset),
    ("svg", build_svg("hello world one two", 3), svg_extract_text),
    (
        "exif",
        build_exif_tiff("II", 6, "maker", "2021:01:02 03:04:05",
                        (72, 1), gps=(12, 34, 56)),
        parse_exif_tiff,
    ),
]


@pytest.mark.parametrize(
    "name,base,parse", CASES, ids=[c[0] for c in CASES]
)
def test_corruption_stays_inside_value_errors(name, base, parse):
    # str hash() is salted per process — crc32 keeps the
    # corruption schedule identical across pytest runs
    rng = np.random.RandomState(zlib.crc32(name.encode()))
    base = bytearray(base)
    for _ in range(400):
        mut = bytearray(base)
        for _ in range(rng.randint(1, 16)):
            mut[rng.randint(len(mut))] = rng.randint(256)
        try:
            parse(bytes(mut))
        except ValueError:
            pass  # typed diagnosis — the contract


def test_idn_fuzz_stays_inside_value_errors():
    import random

    from pdf_extractor_spark.functions.idn import (
        host_to_ascii,
        punycode_encode,
    )

    rng = random.Random(13)
    alphabet = "abcxyz0129-._é中И퟿�!@# "
    for _ in range(3000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 30))
        )
        for fn in (host_to_ascii, punycode_encode):
            try:
                fn(s)
            except ValueError:
                pass


def test_html_tables_fuzz_stays_inside_value_errors():
    from pdf_extractor_spark.operators.html_tables import (
        extract_tables,
    )

    base = (
        b"<table><tr><th>a</th><th>b</th></tr>"
        b"<tr><td>1</td><td colspan=2>2</td></tr>"
        b"<tr><td>x</td></tr></table>"
        b"<table><tr><td><table><tr><td>n</td></tr></table>"
        b"</td></tr></table>"
    )
    rng = np.random.RandomState(13)
    for _ in range(1500):
        mut = bytearray(base)
        for _ in range(rng.randint(1, 14)):
            mut[rng.randint(len(mut))] = rng.randint(256)
        try:
            extract_tables(bytes(mut))
        except ValueError:
            pass
