"""Differential test: the Arrow-kernel flatten_normalize must agree with
the scalar functions it replaced, row by row, on every URL family the
splitter handles (http(s), file:, blob:, data:, odd schemes, relative,
empty, ports, v4/v6 IPs, punycode, quoted chars, fragments)."""

import hashlib

import pyarrow as pa

from har2tree_ray.functions import parse, urls
from har2tree_ray.stages.normalize import flatten_normalize

URLS = [
    "https://h1.example.com/a/b.js",
    "http://h2.example.com/",
    "https://h3.example.com",
    "https://h4.example.com?q=1",
    "https://h5.example.com/#frag",
    "https://h6.example.com/dir/",
    "https://h7.example.com/a%20b/c+d.png?x=1#f",
    "http://10.1.2.3/x.gif",
    "http://10.1.2.3:8080/x.gif",
    "http://[2001:db8::1]/y",
    "http://[2001:db8::1]:443/y",
    "https://h8.example.com:8443/p/q.html",
    "https://xn--caf-dma.example/p",
    "file:///tmp/some/file.bin",
    "file:///tmp/dir/",
    "blob:https://h9.example.com/uuid-1234",
    "data:text/plain;base64,QUJD",
    "ftp://h10.example.com/f.txt",
    "weird-scheme://host/path",
    "relative/path/only.js",
    "",
    "HTTP://UPPER.example.com/a",
    "https://h11.example.com/a//b///c.js",
    "https://fe80::1/odd",
]

TEXTS = [
    "plain body",
    "@status=301 @dur=42 body",
    "@status=x not a number",
    "@geo=48.85,2.35 tail",
    "@geo=48.8566,2.3522",
    "",
    "@status=-1 @geo=-12.5,-0.25",
    "two @status=200 @status=404 markers",
] * 3


def test_flatten_normalize_matches_scalar_functions():
    n = len(URLS)
    texts = (TEXTS * ((n // len(TEXTS)) + 1))[:n]
    spans = [[{"kind": "resource", "text": texts[i], "media_ref": URLS[i],
               "offset": i}] for i in range(n)]
    batch = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
        "spans": pa.array(spans, pa.list_(pa.struct([
            ("kind", pa.string()), ("text", pa.string()),
            ("media_ref", pa.string()), ("offset", pa.int32())]))),
    })
    out = flatten_normalize(batch).to_pylist()
    assert len(out) == n
    for i, row in enumerate(out):
        u, t = URLS[i], texts[i]
        s, h, f = urls.split_url(u)
        assert row["scheme"] == s, (u, row["scheme"], s)
        assert row["hostname"] == h, (u, row["hostname"], h)
        assert row["filename"] == f, (u, row["filename"], f)
        assert row["name"] == urls.unquote_name(u)
        assert row["url_nofrag"] == urls.strip_fragment(u)
        assert row["is_ip"] == urls.is_ip_hostname(h), (u, h)
        assert row["idna_hostname"] == urls.idna_decode(h)
        assert row["status"] == parse.parse_status(t), (t, row["status"])
        lat, lng = parse.parse_geo(t)
        assert (row["lat"], row["lng"]) == (lat, lng), t
        assert row["body_hash"] == hashlib.sha256(t.encode()).hexdigest()
