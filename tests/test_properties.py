"""Property-based tests (hypothesis) over the pure function layer — the
reference has no randomized testing at all (SURVEY §5); these pin the
invariants the distributed stages rely on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from har2tree_ray import geo
from har2tree_ray.functions import parse, urls, webhash

settings.register_profile("ci", max_examples=200, deadline=None)
settings.load_profile("ci")

lat_s = st.floats(min_value=-90, max_value=90, allow_nan=False)
lng_s = st.floats(min_value=-180, max_value=179.999999, allow_nan=False)
res_s = st.integers(min_value=1, max_value=12)


@given(lat_s, lng_s, res_s)
def test_cell_xy_in_range_and_parent_consistent(lat, lng, res):
    ix, iy = geo.cell_xy(np.array([lat]), np.array([lng]), res)
    n = 1 << res
    assert 0 <= ix[0] < n and 0 <= iy[0] < n
    # the parent at res-1 is the cell of the same point at res-1
    if res > 1:
        pix, piy = geo.cell_xy(np.array([lat]), np.array([lng]), res - 1)
        assert geo.parent_cell_id(ix, iy, res)[0] == geo.cell_id(pix, piy, res - 1)[0]


@given(lat_s, lng_s, res_s)
def test_cell_bounds_contain_point(lat, lng, res):
    ix, iy = geo.cell_xy(np.array([lat]), np.array([lng]), res)
    min_lng, min_lat, max_lng, max_lat = geo.cell_bounds(ix, iy, res)
    assert min_lat[0] - 1e-9 <= lat <= max_lat[0] + 1e-9
    # longitude may clamp at the antimeridian edge cell
    if -180 <= lng < 180:
        assert min_lng[0] - 1e-9 <= lng <= max_lng[0] + 1e-9


@given(lat_s, lat_s, lng_s, lng_s, res_s)
def test_chebyshev_distance_symmetric_and_bounded(a_lat, b_lat, a_lng, b_lng, res):
    ax, ay = geo.cell_xy(np.array([a_lat]), np.array([a_lng]), res)
    bx, by = geo.cell_xy(np.array([b_lat]), np.array([b_lng]), res)
    d1 = geo.chebyshev_cell_distance(ax, ay, bx, by, res)[0]
    d2 = geo.chebyshev_cell_distance(bx, by, ax, ay, res)[0]
    assert d1 == d2
    assert 0 <= d1 <= (1 << res)


@given(st.binary(max_size=200))
def test_b64_repair_roundtrip(raw):
    import base64

    clean = base64.b64encode(raw).decode()
    assert parse.repair_b64(clean) == raw
    # dirty padding: stripped '=' must still decode
    assert parse.repair_b64(clean.rstrip("=")) == raw


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=30))
def test_split_url_http_hostname(host_path):
    host = "h-" + "".join(c for c in host_path if c.isalnum())[:20]
    if not host:
        return
    url = f"https://{host}.example.com/a/b.png"
    scheme, hostname, filename = urls.split_url(url)
    assert scheme == "https"
    assert hostname == f"{host}.example.com"
    assert filename == "b.png"


@given(st.lists(st.sampled_from(["geo", "redirect", "referer", "frame", "x_y"]),
                max_size=10))
def test_hhhash_consecutive_dedup_idempotent(names):
    text = " ".join(f"@{n}=v" for n in names)
    deduped = []
    for n in names:
        if not deduped or deduped[-1] != n:
            deduped.append(n)
    text2 = " ".join(f"@{n}=v" for n in deduped)
    assert webhash.hhhash(text) == webhash.hhhash(text2)


@given(st.text(max_size=300))
def test_parse_span_features_total(text):
    """The extractor must never raise on arbitrary text and always return
    the full feature dict."""
    f = parse.parse_span_features(text)
    assert set(f) == {
        "redirect_url", "meta_refresh", "referer", "initiator_url",
        "frame_urls", "ext_src", "ext_href", "ext_cssurl", "ext_srcset",
        "ext_attr", "ext_cssimport", "ext_fulltext", "jsloc_urls",
        "embedded_mimes", "embedded_hashes", "setcookies", "cookies_sent",
    }


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_capture_generation_deterministic(cap_idx):
    from har2tree_ray.synth import generate_capture

    a = generate_capture(cap_idx % 1000)
    b = generate_capture(cap_idx % 1000)
    assert a == b


def test_split_url_fast_path_matches_urlparse():
    """The hand-rolled http(s) parse must equal the urlparse-based reference
    implementation on synth URLs and edge cases."""
    import os
    from urllib.parse import urlparse

    from har2tree_ray import synth
    from har2tree_ray.functions.urls import split_url

    def ref_split(url):
        if not url:
            return "", "", ""
        p = urlparse(url)
        s = p.scheme
        if s == "file":
            return s, "", os.path.basename(p.path) or "file.bin"
        if s in ("blob", "data"):
            return s, "", ""
        if not s and "://" not in url:
            return "", "", os.path.basename(p.path) or ""
        return s, p.netloc, os.path.basename(p.path) or "file.bin"

    cases = [
        "https://x.com", "https://x.com/", "https://x.com/a/b/",
        "https://x.com/p?q=1", "https://x.com/p#f", "https://x.com?q=1",
        "https://x.com#f", "http://[::1]:8080/v6.html", "rel/p.js", "",
        "https://h:8080/a%20b/c+d/e.html%3Fx", "blob:https://h/1",
        "file:///tmp/f.bin",
    ]
    for cap in range(8):
        for row in synth.generate_capture(cap):
            cases.extend(s["media_ref"] for s in row["spans"])
    for u in cases:
        assert split_url(u) == ref_split(u), u


@settings(max_examples=300, deadline=None)
@given(
    scheme=st.sampled_from(["http", "https"]),
    host=st.from_regex(r"[a-z0-9.\-]{1,20}(:[0-9]{1,5})?", fullmatch=True),
    path=st.from_regex(r"(/[A-Za-z0-9._%+\-]{0,12}){0,4}", fullmatch=True),
    query=st.sampled_from(["", "?a=1", "?a=1&b=2"]),
    frag=st.sampled_from(["", "#f", "#a/b"]),
)
def test_split_url_fast_path_property(scheme, host, path, query, frag):
    """Hypothesis sweep: the hand-rolled http(s) parse equals urlparse."""
    import os
    from urllib.parse import urlparse

    from har2tree_ray.functions.urls import split_url

    url = f"{scheme}://{host}{path}{query}{frag}"
    p = urlparse(url)
    want = (p.scheme, p.netloc, os.path.basename(p.path) or "file.bin")
    assert split_url(url) == want
