"""Property-based tests (hypothesis) for the discovery-layer pure
parsers: SURT canonicalization, the WHATWG refresh grammar, and the
robots group scanner — the parsers whose inputs at 10^12 documents
are adversarial by default."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_extractor_spark.functions.robots import (
    parse_crawl_delay,
    parse_robots,
    parse_sitemap_urls,
)
from pdf_extractor_spark.operators.html_extract import parse_refresh
from pdf_extractor_spark.sources.cdx import surt

# ------------------------------------------------------------- SURT

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789-",
    min_size=1, max_size=8,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))

_urls = st.builds(
    lambda scheme, labels, port, path, q: (
        f"{scheme}://{'.'.join(labels)}"
        + (f":{port}" if port else "")
        + "/" + "/".join(path)
        + (("?" + "&".join(q)) if q else "")
    ),
    st.sampled_from(["http", "https", "HTTP", "HTTPS", "Http"]),
    st.lists(_label, min_size=1, max_size=4),
    st.one_of(st.none(), st.integers(1, 65535)),
    st.lists(_label, min_size=0, max_size=3),
    st.lists(
        st.builds(lambda k, v: f"{k}={v}", _label, _label),
        min_size=0, max_size=3,
    ),
)


class TestSurtProperties:
    @settings(max_examples=300, deadline=None)
    @given(_urls)
    def test_case_insensitive_and_lowercase(self, url):
        key = surt(url)
        assert surt(url.lower()) == key
        # structure: host part, ')' separator, all lowercase
        assert ")" in key and key == key.lower()

    @settings(max_examples=300, deadline=None)
    @given(_urls)
    def test_query_order_never_matters(self, url):
        if "?" not in url:
            return
        base, q = url.split("?", 1)
        parts = q.split("&")
        assert surt(base + "?" + "&".join(reversed(parts))) == surt(url)

    @settings(max_examples=300, deadline=None)
    @given(_urls)
    def test_www_and_default_port_invariance(self, url):
        scheme, rest = url.split("://", 1)
        dport = {"http": 80, "https": 443}[scheme.lower()]
        host_end = min(
            (rest.index(c) for c in "/:?" if c in rest),
            default=len(rest),
        )
        host, tail = rest[:host_end], rest[host_end:]
        if tail.startswith(":"):
            return  # explicit port already present
        if host.lower().startswith("www"):
            return  # would double-strip / shadow the invariance
        with_www = f"{scheme}://www.{host}{tail}"
        with_port = f"{scheme}://{host}:{dport}{tail}"
        assert surt(with_www) == surt(url)
        assert surt(with_port) == surt(url)


# --------------------------------------------------- refresh grammar

class TestRefreshProperties:
    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(0, 3600),
        st.sampled_from(["; url=", ";URL=", ", url=", " ; Url = "]),
        st.sampled_from(["", "'", '"']),
        _urls,
    )
    def test_wellformed_always_roundtrips(self, delay, sep, q, url):
        content = f"{delay}{sep}{q}{url}{q}"
        assert parse_refresh(content) == (delay, url)

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def test_never_crashes_and_never_invents_a_delay(self, content):
        got = parse_refresh(content)
        if got is not None:
            delay, _url = got
            assert isinstance(delay, int) and delay >= 0


# ------------------------------------------------------ robots scan

_directive = st.one_of(
    st.builds(lambda a: f"User-agent: {a}", _label),
    st.builds(lambda p: f"Disallow: /{p}", _label),
    st.builds(lambda p: f"Allow: /{p}", _label),
    st.builds(lambda d: f"Crawl-delay: {d}", st.integers(-5, 99)),
    st.builds(lambda u: f"Sitemap: https://{u}.example/s.xml", _label),
    st.just("# comment"),
    st.just(""),
    st.text(alphabet="abc:# /", max_size=12),  # junk lines
)


class TestRobotsScanProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(_directive, max_size=25))
    def test_parsers_never_crash_and_agree_on_structure(self, lines):
        text = "\n".join(lines)
        rules = parse_robots(text)
        delay = parse_crawl_delay(text)
        maps = parse_sitemap_urls(text)
        # rules only ever come from Allow/Disallow values
        assert all(p.startswith("/") for p, _ in rules)
        # delays are parsed non-negative or absent
        assert delay is None or delay >= 0
        # sitemap values preserve the URL text verbatim
        assert all(m.startswith("https://") for m in maps)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(_directive, max_size=25))
    def test_star_fallback_consistency(self, lines):
        # an agent with no group of its own gets exactly the * rules
        text = "\n".join(lines)
        assert parse_robots(text, agent="zzz-unknown-bot") == \
            parse_robots(text, agent="*")
