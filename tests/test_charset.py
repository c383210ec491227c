"""M32 charset normalization: the stdlib sniff chain in
``functions/charset.py`` must recover extraction evidence from non-UTF-8
bodies the way the reference's charset_normalizer pass does
(/root/reference/har2tree/helper.py:283-294)."""

from __future__ import annotations

import base64

from har2tree_ray.functions.charset import (charset_from_content_type,
                                            decode_body, sniff_charset)


def test_bom_wins():
    assert sniff_charset("héllo".encode("utf-16-le"), "") == "latin-1"  # no BOM
    assert sniff_charset(b"\xff\xfe" + "héllo".encode("utf-16-le")) == "utf-16"
    assert decode_body(b"\xff\xfe" + "héllo".encode("utf-16-le")) == "héllo"
    assert decode_body(b"\xef\xbb\xbfh\xc3\xa9llo") == "héllo"  # utf-8-sig strips BOM
    # utf-32-le BOM starts with the utf-16-le BOM — must match the longer one
    assert sniff_charset("a".encode("utf-32")) == "utf-32"
    assert decode_body("héllo".encode("utf-32")) == "héllo"


def test_strict_utf8_beats_declaration():
    body = "héllo".encode("utf-8")
    assert sniff_charset(body, declared="iso-8859-1") == "utf-8"
    assert decode_body(body, "iso-8859-1") == "héllo"


def test_meta_declaration():
    body = '<html><meta charset="iso-8859-1"><p>s\xe9curit\xe9'.encode("latin-1")
    assert sniff_charset(body) == "iso8859-1"
    assert decode_body(body).endswith("sécurité")
    http_equiv = ('<meta http-equiv="Content-Type" '
                  'content="text/html; charset=windows-1252">caf\xe9').encode("cp1252")
    assert decode_body(http_equiv).endswith("café")


def test_xml_prolog():
    body = '<?xml version="1.0" encoding="ISO-8859-15"?><r>€</r>'.encode("iso-8859-15")
    assert decode_body(body) == '<?xml version="1.0" encoding="ISO-8859-15"?><r>€</r>'


def test_transport_declaration_and_fallback():
    body = "s\xe9curit\xe9".encode("latin-1")  # no BOM, invalid utf-8, no meta
    assert decode_body(body, "iso-8859-1") == "sécurité"
    assert decode_body(body, "bogus-charset") == "sécurité"  # latin-1 fallback
    assert decode_body(body, "") == "sécurité"
    assert charset_from_content_type("text/html; charset=ISO-8859-1") == "ISO-8859-1"
    assert charset_from_content_type('text/html; charset="utf-8"') == "utf-8"
    assert charset_from_content_type("text/html") == ""
    assert charset_from_content_type(None) == ""


def test_har_ingest_recovers_latin1_url_evidence():
    """A base64 ISO-8859-1 body's accented resource URL must survive into the
    span text for M19 extraction (the old utf-8 errors=replace turned the
    accented bytes into U+FFFD and broke the URL)."""
    from har2tree_ray.functions.parse import parse_span_features
    from har2tree_ray.sources.har import har_entries_to_spans

    html = ('<html><meta charset="iso-8859-1">'
            '<img src="https://cdn.example/s\xe9curit\xe9.png"></html>')
    e = {
        "startedDateTime": "2024-01-01T00:00:00.000Z",
        "time": 10,
        "request": {"method": "GET", "url": "https://site.example/", "headers": []},
        "response": {"status": 200,
                     "headers": [{"name": "Content-Type",
                                  "value": "text/html; charset=iso-8859-1"}],
                     "content": {"mimeType": "text/html", "size": 10,
                                 "encoding": "base64",
                                 "text": base64.b64encode(
                                     html.encode("latin-1")).decode()},
                     "redirectURL": ""},
    }
    spans = har_entries_to_spans([e])
    f = parse_span_features(spans[0]["text"])
    assert "https://cdn.example/sécurité.png" in f["ext_src"]


def test_bomless_utf16_with_declaration():
    """NUL bytes are valid UTF-8, so a BOM-less UTF-16 body must NOT be
    claimed by the strict-utf-8 step — the declared charset wins (review
    finding: evidence was destroyed into NUL-interleaved text)."""
    body = '<img src="https://x.example/a.png">'.encode("utf-16-le")
    assert sniff_charset(body, declared="utf-16-le") == "utf-16-le"
    assert decode_body(body, "utf-16-le") == '<img src="https://x.example/a.png">'
    # undeclared BOM-less utf-16 falls to latin-1 (bytes preserved, not lost)
    assert "\x00" in decode_body(body, "")
