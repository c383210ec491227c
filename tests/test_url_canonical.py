"""M31 URL canonicalization: behavior vectors for the stdlib recast of the
reference's sanitize chain (strip_html5_whitespace → safe_url_string →
urljoin → canonicalize_url, /root/reference/har2tree/nodes.py:663-673).
Hostile/escaped inputs live HERE — the SQL oracle only covers the synth
(escape-free) vocabulary."""

from urllib.parse import urljoin, urlsplit

import pytest

from har2tree_ray.functions.urls import (canonicalize_url, safe_url_string,
                                         strip_html5_whitespace)


@pytest.mark.parametrize("raw,expect", [
    ("  https://a.example/x \n\t", "https://a.example/x"),
    ("\x0chttps://a.example\r", "https://a.example"),
    ("plain", "plain"),
])
def test_strip_html5_whitespace(raw, expect):
    assert strip_html5_whitespace(raw) == expect


@pytest.mark.parametrize("raw,expect", [
    # spaces and non-ASCII get escaped; existing escapes survive
    ("https://a.example/x y", "https://a.example/x%20y"),
    ("https://a.example/x%20y", "https://a.example/x%20y"),
    ("https://a.example/é?q=v é#f g",
     "https://a.example/%C3%A9?q=v%20%C3%A9#f%20g"),
    # IDNA host
    ("https://héllo.example/p", "https://xn--hllo-bpa.example/p"),
    # reserved characters stay
    ("https://a.example/a/b;c?d=e&f=g", "https://a.example/a/b;c?d=e&f=g"),
])
def test_safe_url_string(raw, expect):
    assert safe_url_string(raw) == expect


@pytest.mark.parametrize("raw,expect", [
    # scheme + host lowercase, default port stripped, path case kept
    ("HTTPS://WWW.Example.COM:443/A/B", "https://www.example.com/A/B"),
    ("HTTP://Host.EX:80/", "http://host.ex/"),
    ("http://host.ex:8080/x", "http://host.ex:8080/x"),
    # query args sorted by (key, value); blanks kept
    ("https://h.ex/a?b=2&a=10&a=2", "https://h.ex/a?a=10&a=2&b=2"),
    ("https://h.ex/a?flag&x=1", "https://h.ex/a?flag=&x=1"),
    # empty path → '/'
    ("https://plain.example", "https://plain.example/"),
    ("https://plain.example?q=1", "https://plain.example/?q=1"),
    # fragment dropped by default
    ("https://h.ex/p#sec", "https://h.ex/p"),
    # percent-escape normalization: unreserved decoded, rest uppercased,
    # %2F/%3F kept escaped (they would change path semantics)
    ("https://h.ex/%7euser/p%c3%a9", "https://h.ex/~user/p%C3%A9"),
    ("https://h.ex/a%2fb%3Fc", "https://h.ex/a%2Fb%3Fc"),
    # raw space in path escaped; '+' in query is a space and re-encodes as '+'
    ("https://h.ex/x y?q=a b", "https://h.ex/x%20y?q=a+b"),
    # userinfo kept, host after '@' lowercased
    ("http://User:Pw@Host.EX/", "http://User:Pw@host.ex/"),
])
def test_canonicalize_url(raw, expect):
    assert canonicalize_url(raw) == expect


def test_canonicalize_keep_fragments():
    assert (canonicalize_url("https://h.ex/p?b=1&a=2#Sec", keep_fragments=True)
            == "https://h.ex/p?a=2&b=1#Sec")


def test_full_sanitize_chain_matches_reference_shape():
    """The composed chain on a messy relative href — the exact sequence
    urls_in_rendered_page applies per URL (nodes.py:664-670)."""
    base = "https://site.example/p1/p2/index.html"
    href = "  ../Img/logo é.png?b=2&a=1#top "
    out = canonicalize_url(
        urljoin(base, safe_url_string(strip_html5_whitespace(href))),
        keep_fragments=True)
    assert out == "https://site.example/p1/Img/logo%20%C3%A9.png?a=1&b=2#top"
    assert urlsplit(out).netloc


def test_no_netloc_dropped():
    for href in ("mailto:x@y.example", "javascript:void(0)", "about:blank"):
        assert not urlsplit(canonicalize_url(href, keep_fragments=True)).netloc


def test_canonicalize_idempotent_property():
    """canonicalize ∘ canonicalize == canonicalize — a canonical form must be
    a fixed point, else dedup keys differ between one-pass and re-canonicalized
    pipelines (hypothesis over messy URL fragments)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.text(
        alphabet="abcXYZ019%/?&=#:@ ~.+-_'()!*éф\x00",
        max_size=40,
    )

    @settings(max_examples=300, deadline=None)
    @given(scheme=st.sampled_from(["http", "HTTPS", "ftp"]),
           host=st.sampled_from(["Host.EX", "a.b.example:8080",
                                 "x.example:443", "plain"]),
           path=frag, query=frag, fragment=frag)
    def run(scheme, host, path, query, fragment):
        url = f"{scheme}://{host}/{path}?{query}#{fragment}"
        once = canonicalize_url(url, keep_fragments=True)
        twice = canonicalize_url(once, keep_fragments=True)
        assert twice == once

    run()
