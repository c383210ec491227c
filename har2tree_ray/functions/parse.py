"""Span-text parsing — the recast of har2tree's body/content parsers.

The reference extracts attach evidence from HAR entries and HTML/CSS/JS
bodies (external resources M19 /root/reference/har2tree/helper.py:356-466,
JS redirects M22 nodes.py:573-584, meta refresh M23 nodes.py:586-590,
initiator M25 nodes.py:601-616, data-URI blobs helper.py:85-127,236-250,
cookies M14/M15 nodes.py:508-539).  In the interleaved recast all of that
evidence lives in the span ``text`` as directives and markup fragments; this
module holds the compiled patterns and the single-pass extractor.

All regexes are compiled at module import — once per worker process; the
SpanParser actor (stages.parser) reuses them so setup is amortized per actor,
per the actor-pool contract (SURVEY.md §2.3 ST1-ST3).
"""

from __future__ import annotations

import base64
import hashlib
import re

RE_GEO = re.compile(r"@geo=(-?\d+\.\d+),(-?\d+\.\d+)")
RE_STATUS = re.compile(r"@status=(-?\d+)")
RE_REDIRECT = re.compile(r"@redirect=(\S+)")
RE_META_REFRESH = re.compile(r"@meta_refresh=(\S+)")
RE_REFERER = re.compile(r"@referer=(\S+)")
RE_INITIATOR = re.compile(r"@initiator=(\S+)")
RE_FRAME = re.compile(r"@frame=(\S+)")
RE_SETCOOKIE = re.compile(r"@setcookie=([^=\s]+)=(\S+)@(\S+)")
RE_COOKIE = re.compile(r"@cookie=([^=\s]+)=(\S+)")
RE_SRC = re.compile(r'src="([^"]+)"')
RE_HREF = re.compile(r'href="([^"]+)"')
RE_CSSURL = re.compile(r"url\(([^)]+)\)")
RE_JSLOC = re.compile(r"location\.href='([^']+)'")
# M19 breadth (reference helper.py:356-466): responsive-image srcset,
# poster/longdesc/data resource attributes, the CSS @import string form
# (tinycss2 path; the url() form is RE_CSSURL), the meta-refresh HTML TAG
# (vs the @meta_refresh directive, nodes.py:586-590), and the full-text URL
# fallback the reference runs over the whole (unescaped) body.
RE_SRCSET = re.compile(r'srcset="([^"]+)"')
RE_ATTR = re.compile(r'\b(?:poster|longdesc|data)="([^"]+)"')
RE_CSSIMPORT = re.compile(r'@import\s+["\']([^"\']+)["\']')
RE_META_TAG = re.compile(r'<meta[^>]*?content="\s*\d+\s*;\s*url=([^"]+)"',
                         re.IGNORECASE)
RE_DIRECTIVE_TOKEN = re.compile(r"@\w+=\S+")
RE_FULLURL = re.compile(r'https?://[^\s"\'<>()\[\]{}]+')
_URL_TRAIL_PUNCT = ".,;:!?"
RE_DATAURI = re.compile(r"data:([\w/+.-]+);base64,([A-Za-z0-9+/=]+)")
RE_POST = re.compile(r"@post=([^:\s]+):(\S+)")       # M12 mime:b64 POST body
RE_TLS = re.compile(r"@tls=([^@\s]+)@(\S+)")         # M26 proto@issuer
RE_UA = re.compile(r"@ua=(\S+)")                     # M11 user agent
RE_DUR = re.compile(r"@dur=(\d+)")                   # M8 entry duration (ms)


def first(rx: re.Pattern, text: str) -> str:
    m = rx.search(text)
    return m.group(1) if m else ""


def parse_geo(text: str) -> tuple[float, float]:
    m = RE_GEO.search(text)
    if not m:
        return 0.0, 0.0
    return float(m.group(1)), float(m.group(2))


def parse_status(text: str) -> int:
    if "@status=" not in text:  # default status — most spans omit it
        return 200
    m = RE_STATUS.search(text)
    return int(m.group(1)) if m else 200


def repair_b64(data: str) -> bytes:
    """Base64 decode with dirty-padding repair
    (/root/reference/har2tree/nodes.py:115-129, helper.py:97-111)."""
    data = data.strip()
    pad = (-len(data)) % 4
    try:
        return base64.b64decode(data + "=" * pad)
    except Exception:
        return b""


def _markup_channel(rx: re.Pattern, text: str, unescaped: str | None,
                    guard: str) -> list[str]:
    """Scan one markup channel over the raw text AND (when HTML-escaped
    markup is present) its unescaped copy — the reference ``unescape()``s
    blobs before re-walking them (helper.py:391-400).  Order-preserving
    dedup keeps cascade determinism."""
    vals = rx.findall(text) if guard in text else []
    if unescaped is not None and guard in unescaped:
        vals = list(dict.fromkeys(vals + rx.findall(unescaped)))
    return vals


def split_srcset(value: str) -> list[str]:
    """``srcset`` attribute value → candidate URLs (descriptors dropped) —
    comma-separated candidates, URL is the first whitespace token of each
    (reference collects srcset per tag, helper.py:403-415)."""
    out = []
    for cand in value.split(","):
        u = cand.strip().split(" ", 1)[0]
        if u:
            out.append(u)
    return out


def fulltext_urls(text: str) -> list[str]:
    """M19 full-text URL fallback (reference helper.py:451-466: a URL regex
    over the whole body catches references no tag walk sees).  Directive
    tokens are stripped first — in the interleaved recast they share the
    text stream but correspond to the reference's *structured* fields, which
    its body regex never saw."""
    stripped = RE_DIRECTIVE_TOKEN.sub(" ", text)
    return [u.rstrip(_URL_TRAIL_PUNCT) for u in RE_FULLURL.findall(stripped)]


def parse_span_features(text: str) -> dict:
    """Single-pass extraction of every attach-evidence feature of one span.

    Returns plain-Python values; the caller assembles columnar batches.
    ``embedded`` entries are (mime, sha256hex) of decoded data-URI blobs
    (reference stores (sha512, BytesIO) pairs — helper.py:236-250; we keep
    the hash, the blob bytes stay re-derivable from the text).
    """
    # substring guards before each regex: most spans carry none of these
    # markers and a C-level ``in`` check is ~10x cheaper than a regex scan
    embedded = []
    if ";base64," in text:
        for mime, b64 in RE_DATAURI.findall(text):
            raw = repair_b64(b64)
            if raw:
                embedded.append((mime, hashlib.sha256(raw).hexdigest()))
    # HTML-escaped markup: unescape once and let every markup channel scan
    # both copies (helper.py:391-400)
    unescaped = None
    if "&quot;" in text or "&amp;" in text or "&#" in text:
        import html
        unescaped = html.unescape(text)
    # M23 meta refresh: the @meta_refresh directive wins; otherwise the
    # meta-refresh HTML tag in body markup (nodes.py:586-590, helper.py)
    meta = first(RE_META_REFRESH, text) if "@meta_refresh=" in text else ""
    if not meta and "<meta" in text:
        meta = first(RE_META_TAG, text)
    srcset_vals = _markup_channel(RE_SRCSET, text, unescaped, 'srcset="')
    return {
        "redirect_url": first(RE_REDIRECT, text) if "@redirect=" in text else "",
        "meta_refresh": meta,
        "referer": first(RE_REFERER, text) if "@referer=" in text else "",
        "initiator_url": first(RE_INITIATOR, text) if "@initiator=" in text else "",
        "frame_urls": RE_FRAME.findall(text) if "@frame=" in text else [],
        "ext_src": _markup_channel(RE_SRC, text, unescaped, 'src="'),
        "ext_href": _markup_channel(RE_HREF, text, unescaped, 'href="'),
        "ext_cssurl": _markup_channel(RE_CSSURL, text, unescaped, "url("),
        "ext_srcset": [u for v in srcset_vals for u in split_srcset(v)],
        "ext_attr": _markup_channel(RE_ATTR, text, unescaped, '="'),
        "ext_cssimport": _markup_channel(RE_CSSIMPORT, text, unescaped,
                                         "@import"),
        "ext_fulltext": fulltext_urls(unescaped or text)
        if "http" in text else [],
        "jsloc_urls": _markup_channel(RE_JSLOC, text, unescaped,
                                      "location.href="),
        "embedded_mimes": [m for m, _ in embedded],
        "embedded_hashes": [h for _, h in embedded],
        "setcookies": [f"{n}={v}@{d}" for n, v, d in RE_SETCOOKIE.findall(text)]
        if "@setcookie=" in text else [],
        "cookies_sent": [f"{n}={v}" for n, v in RE_COOKIE.findall(text)]
        if "@cookie=" in text else [],
    }


# ---------------------------------------------------------- POST-body decode

_RE_BOUNDARY = re.compile(r'boundary="?([^";,\s]+)"?')


def decode_multipart(mimetype: str, text: str) -> "list[dict] | None":
    """Stdlib multipart decode matching the reference's MultipartDecoder
    shape (nodes.py:377-400): a list of ``{"headers": {...}, "content":
    str}`` per part.  Like the reference, LF-only bodies are normalized to
    CRLF before splitting; content is the exact bytes between the blank
    line and the CRLF preceding the next boundary.  → None when the
    mimetype carries no boundary (caller falls back to raw text)."""
    m = _RE_BOUNDARY.search(mimetype)
    if not m:
        return None
    body = text if "\r\n" in text else text.replace("\n", "\r\n")
    out: list[dict] = []
    for seg in body.split("--" + m.group(1))[1:]:
        if seg.startswith("--"):
            break  # closing delimiter → epilogue
        if seg.startswith("\r\n"):
            seg = seg[2:]
        hdr_blk, sep, content = seg.partition("\r\n\r\n")
        if not sep:
            hdr_blk, content = "", seg
        if content.endswith("\r\n"):
            content = content[:-2]
        headers: dict[str, str] = {}
        for line in hdr_blk.split("\r\n"):
            k, colon, v = line.partition(":")
            if colon:
                headers[k.strip()] = v.strip()
        out.append({"headers": headers, "content": content})
    return out


def decode_posted_data(mimetype: str, payload: "str | bytes"):
    """Mime-routed POST-body decode dispatch — the recast of the reference's
    biggest per-record parser (M12, /root/reference/har2tree/nodes.py:260-498):
    base64 repair → form-urlencoded → NDJSON stream → multipart → JSON
    family → text → pass-through.

    Formats whose parsers aren't in this container (amazon-ion, protobuf,
    dns-wire — nodes.py:384-441) fall through to the raw-bytes branch, like
    the reference's final fallback (nodes.py:470-498).  Returns a
    JSON-serializable value (the engine stores it as a JSON string column —
    the dynamic ``posted_data`` union of SURVEY §2 hard-part (4))."""
    import json as _json
    from urllib.parse import parse_qsl

    if isinstance(payload, str) and mimetype and "base64" in mimetype:
        raw = repair_b64(payload)
        if raw:
            payload = raw
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8")
        except UnicodeDecodeError:
            return {"_raw_b64": base64.b64encode(payload).decode()}
    mt = (mimetype or "").lower()
    if "form-urlencoded" in mt:
        return dict(parse_qsl(payload, keep_blank_values=True))
    if mt.startswith("application/x-json-stream"):
        # NDJSON recast of the reference's json_stream.load (nodes.py:
        # 344-361): one JSON value per non-empty line, as a list
        try:
            return [_json.loads(ln) for ln in payload.splitlines()
                    if ln.strip()]
        except ValueError:
            return payload
    if mt.startswith("multipart"):
        # boundary tokens are case-sensitive — extract from the raw mimetype
        parts = decode_multipart(mimetype or "", payload)
        return parts if parts is not None else payload
    if "json" in mt or mt.endswith("+json"):
        try:
            return _json.loads(payload)
        except ValueError:
            return payload
    if mt.startswith("text/") or not mt:
        # reference tries JSON even for text bodies (nodes.py:466-468)
        try:
            return _json.loads(payload)
        except ValueError:
            return payload
    return payload
