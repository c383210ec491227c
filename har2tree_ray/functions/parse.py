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


def decode_protobuf_wire(data: bytes):
    """Schema-less protobuf wire walk — a pure-stdlib recast of the
    reference's blackboxprotobuf decode (M12, nodes.py:401-416).  Returns
    ``(message, typedef)`` where message maps field-number strings to
    values (varint → int, fixed64/fixed32 → little-endian float,
    length-delimited → nested message if it re-walks cleanly, else utf-8
    string, else base64) and typedef mirrors blackboxprotobuf's
    ``{"<field>": {"type": ...}}`` shape.  Raises ValueError on any
    malformed wire (callers fall back to the raw branch)."""
    import struct

    def read_varint(b: bytes, i: int) -> "tuple[int, int]":
        shift = val = 0
        while True:
            if i >= len(b) or shift > 63:
                raise ValueError("truncated varint")
            byte = b[i]
            i += 1
            val |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return val, i
            shift += 7

    def walk(b: bytes, depth: int = 0):
        if depth > 16:
            raise ValueError("nesting too deep")
        msg: dict = {}
        typedef: dict = {}
        i = 0
        while i < len(b):
            tag, i = read_varint(b, i)
            fnum, wt = tag >> 3, tag & 7
            if fnum == 0:
                raise ValueError("field number 0")
            if wt == 0:
                val, i = read_varint(b, i)
                t: dict = {"type": "int"}
            elif wt == 1:
                if i + 8 > len(b):
                    raise ValueError("truncated fixed64")
                val = struct.unpack("<d", b[i:i + 8])[0]
                i += 8
                t = {"type": "fixed64"}
            elif wt == 5:
                if i + 4 > len(b):
                    raise ValueError("truncated fixed32")
                val = struct.unpack("<f", b[i:i + 4])[0]
                i += 4
                t = {"type": "fixed32"}
            elif wt == 2:
                ln, i = read_varint(b, i)
                if i + ln > len(b):
                    raise ValueError("truncated bytes field")
                chunk = b[i:i + ln]
                i += ln
                if chunk:
                    try:
                        val, sub = walk(chunk, depth + 1)
                        t = {"type": "message", "message_typedef": sub}
                    except ValueError:
                        try:
                            val = chunk.decode("utf-8")
                            t = {"type": "str"}
                        except UnicodeDecodeError:
                            val = base64.b64encode(chunk).decode()
                            t = {"type": "bytes"}
                else:
                    val, t = "", {"type": "str"}
            else:
                raise ValueError(f"unsupported wire type {wt}")
            key = str(fnum)
            if key in msg:  # repeated field → list
                if not isinstance(msg[key], list):
                    msg[key] = [msg[key]]
                msg[key].append(val)
            else:
                msg[key] = val
            typedef[key] = t
        return msg, typedef

    if not data:
        raise ValueError("empty payload")
    return walk(bytes(data))


_DNS_TYPES = {1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX",
              16: "TXT", 28: "AAAA", 33: "SRV", 41: "OPT", 65: "HTTPS"}


def decode_dns_wire(data: bytes) -> dict:
    """Minimal RFC 1035 wire-format parse — the stdlib recast of the
    reference's ``dns.message.from_wire(...).to_text()`` (M12,
    nodes.py:433-441), emitted as a stable dict instead of dnspython's
    text rendering: ``{"id", "flags", "questions": [{"name", "type"}],
    "answers": [{"name", "type", "ttl", "rdata"}]}``.  Name compression
    pointers are followed; A/AAAA rdata renders as the address string,
    anything else as base64.  Raises ValueError on malformed wire."""
    import ipaddress
    import struct

    if len(data) < 12:
        raise ValueError("truncated header")
    qid, flags, qd, an, ns_, ar = struct.unpack(">HHHHHH", data[:12])

    def read_name(i: int, depth: int = 0) -> "tuple[str, int]":
        if depth > 16:
            raise ValueError("pointer loop")
        labels = []
        while True:
            if i >= len(data):
                raise ValueError("truncated name")
            ln = data[i]
            if ln == 0:
                return (".".join(labels) + "." if labels else "."), i + 1
            if ln & 0xC0 == 0xC0:  # compression pointer
                if i + 1 >= len(data):
                    raise ValueError("truncated pointer")
                ptr = ((ln & 0x3F) << 8) | data[i + 1]
                if ptr >= i:
                    raise ValueError("forward pointer")
                suffix, _ = read_name(ptr, depth + 1)
                base = ".".join(labels)
                return (base + "." + suffix if base else suffix), i + 2
            if ln & 0xC0:
                raise ValueError("reserved label type")
            if i + 1 + ln > len(data):
                raise ValueError("truncated label")
            labels.append(data[i + 1:i + 1 + ln].decode("ascii", "replace"))
            i += 1 + ln

    i = 12
    questions = []
    for _ in range(qd):
        name, i = read_name(i)
        if i + 4 > len(data):
            raise ValueError("truncated question")
        qtype, _qclass = struct.unpack(">HH", data[i:i + 4])
        i += 4
        questions.append({"name": name,
                          "type": _DNS_TYPES.get(qtype, str(qtype))})
    answers = []
    for _ in range(an + ns_ + ar):
        name, i = read_name(i)
        if i + 10 > len(data):
            raise ValueError("truncated record")
        rtype, _rclass, ttl, rdlen = struct.unpack(">HHIH", data[i:i + 10])
        i += 10
        if i + rdlen > len(data):
            raise ValueError("truncated rdata")
        rd = data[i:i + rdlen]
        i += rdlen
        if rtype == 1 and rdlen == 4:
            rdata = str(ipaddress.IPv4Address(rd))
        elif rtype == 28 and rdlen == 16:
            rdata = str(ipaddress.IPv6Address(rd))
        else:
            rdata = base64.b64encode(rd).decode()
        answers.append({"name": name, "type": _DNS_TYPES.get(rtype, str(rtype)),
                        "ttl": ttl, "rdata": rdata})
    return {"id": qid, "flags": flags, "questions": questions,
            "answers": answers}


# --------------------------------------------------------------- text Ion

_ION_ID = re.compile(r"[A-Za-z$_][A-Za-z0-9$_]*")
_ION_TS = re.compile(
    r"\d{4}(?:-\d{2}(?:-\d{2})?)?"                      # date (or year/month)
    r"(?:[Tt](?:\d{2}:\d{2}(?::\d{2}(?:\.\d+)?)?"       # time
    r"(?:[Zz]|[+-]\d{2}:\d{2})?)?)?")
_ION_NUM = re.compile(r"[+-]?(?:0[xX][0-9a-fA-F_]+|0[bB][01_]+|"
                      r"\d[\d_]*(?:\.[\d_]*)?(?:[eEdD][+-]?\d+)?)")
_ION_OPER = re.compile(r"[!#%&*+\-./;<=>?@^`|~]+")
_ION_ESC = {"n": "\n", "t": "\t", "r": "\r", "0": "\0", "a": "\a",
            "b": "\b", "f": "\f", "v": "\v", '"': '"', "'": "'",
            "\\": "\\", "/": "/", "?": "?"}


class _IonReader:
    """Recursive-descent reader for the PUBLIC Amazon Ion text grammar —
    the full-fidelity recast of the reference's simpleion POST-body branch
    (nodes.py:418-431; the reference parses with the amazon.ion binding,
    this walker is stdlib).  Ion-only types map to JSON-serializable
    sentinels so ``json.dumps(sort_keys)`` stays the storage contract:
    symbol → {"$ion_symbol": s}, timestamp → {"$ion_timestamp": raw},
    sexp → {"$ion_sexp": [...]}, blob → {"$ion_blob": b64},
    clob → {"$ion_clob": text}, annotations →
    {"$ion_annotations": [...], "value": v}.  Decimals parse as floats
    (documented deviation — keeps the JSON-shaped subset byte-compatible
    with the JSON tear this replaces).  Binary Ion (BVM E0 01 00 EA) is
    out of scope and raises, falling back to the raw branch."""

    def __init__(self, s: str) -> None:
        self.s = s
        self.i = 0
        self.n = len(s)

    def err(self, msg: str) -> "ValueError":
        return ValueError(f"ion: {msg} at {self.i}")

    def ws(self) -> None:
        s, n = self.s, self.n
        while self.i < n:
            c = s[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif s.startswith("//", self.i):
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            elif s.startswith("/*", self.i):
                j = s.find("*/", self.i + 2)
                if j < 0:
                    raise self.err("unterminated comment")
                self.i = j + 2
            else:
                return

    def value(self):
        self.ws()
        if self.i >= self.n:
            raise self.err("empty value")
        # annotations: one or more `sym::`
        anns = []
        while True:
            save = self.i
            m = _ION_ID.match(self.s, self.i)
            tok = None
            if m:
                tok, self.i = m.group(0), m.end()
            elif self.s[self.i] == "'" and not self.s.startswith("'''", self.i):
                tok = self._quoted_symbol()
            if tok is None:
                break
            self.ws()
            if self.s.startswith("::", self.i):
                anns.append(tok)
                self.i += 2
                self.ws()
                continue
            self.i = save  # not an annotation — re-read as a value
            break
        v = self._bare_value()
        if anns:
            return {"$ion_annotations": anns, "value": v}
        return v

    def _bare_value(self):
        s, c = self.s, self.s[self.i]
        if c == "{":
            if s.startswith("{{", self.i):
                return self._lob()
            return self._struct()
        if c == "[":
            return self._seq("]", list)
        if c == "(":
            return {"$ion_sexp": self._seq(")", list, sexp=True)}
        if c == '"':
            return self._string()
        if s.startswith("'''", self.i):
            return self._long_string()
        if c == "'":
            return {"$ion_symbol": self._quoted_symbol()}
        # timestamp before number: both start with a digit
        m = _ION_TS.match(s, self.i)
        if m and len(m.group(0)) >= 5 and ("-" in m.group(0)):
            self.i = m.end()
            return {"$ion_timestamp": m.group(0)}
        m = _ION_NUM.match(s, self.i)
        if m and m.group(0) not in ("+", "-"):
            return self._number(m)
        m = _ION_ID.match(s, self.i)
        if m:
            tok = m.group(0)
            self.i = m.end()
            if tok == "null":
                if s.startswith(".", self.i):
                    self.i += 1
                    t = _ION_ID.match(s, self.i)
                    if not t:
                        raise self.err("bad typed null")
                    self.i = t.end()
                return None
            if tok == "true":
                return True
            if tok == "false":
                return False
            if tok in ("nan",):
                raise self.err("nan unsupported in JSON storage")
            return {"$ion_symbol": tok}
        raise self.err(f"unexpected {c!r}")

    def _number(self, m):
        raw = m.group(0)
        self.i = m.end()
        t = raw.replace("_", "")
        low = t.lower()
        if low.startswith(("0x", "-0x", "+0x")):
            return int(t, 16)
        if low.startswith(("0b", "-0b", "+0b")):
            return int(t, 2)
        if "." in t or "e" in low or "d" in low:
            return float(low.replace("d", "e"))
        return int(t)

    def _string(self) -> str:
        out, s = [], self.s
        self.i += 1
        while True:
            if self.i >= self.n:
                raise self.err("unterminated string")
            c = s[self.i]
            if c == '"':
                self.i += 1
                return "".join(out)
            if c == "\\":
                out.append(self._escape())
            else:
                out.append(c)
                self.i += 1

    def _escape(self) -> str:
        s = self.s
        e = s[self.i + 1]
        if e in _ION_ESC:
            self.i += 2
            return _ION_ESC[e]
        if e == "x":
            v = chr(int(s[self.i + 2:self.i + 4], 16))
            self.i += 4
            return v
        if e == "u":
            v = chr(int(s[self.i + 2:self.i + 6], 16))
            self.i += 6
            return v
        if e == "U":
            v = chr(int(s[self.i + 2:self.i + 10], 16))
            self.i += 10
            return v
        if e == "\n":  # escaped newline joins lines
            self.i += 2
            return ""
        raise self.err(f"bad escape \\{e}")

    def _long_string(self) -> str:
        # '''...''' segments; adjacent segments concatenate
        parts = []
        while True:
            self.ws()
            if not self.s.startswith("'''", self.i):
                break
            self.i += 3
            j = self.s.find("'''", self.i)
            if j < 0:
                raise self.err("unterminated long string")
            parts.append(self.s[self.i:j])
            self.i = j + 3
        return "".join(parts)

    def _quoted_symbol(self) -> str:
        out, s = [], self.s
        self.i += 1
        while True:
            if self.i >= self.n:
                raise self.err("unterminated symbol")
            c = s[self.i]
            if c == "'":
                self.i += 1
                return "".join(out)
            if c == "\\":
                out.append(self._escape())
            else:
                out.append(c)
                self.i += 1

    def _field_name(self) -> str:
        self.ws()
        c = self.s[self.i]
        if c == '"':
            return self._string()
        if c == "'":
            return self._quoted_symbol()
        m = _ION_ID.match(self.s, self.i)
        if not m:
            raise self.err("bad field name")
        self.i = m.end()
        return m.group(0)

    def _struct(self) -> dict:
        self.i += 1
        out: dict = {}
        self.ws()
        if self.s.startswith("}", self.i):
            self.i += 1
            return out
        while True:
            k = self._field_name()
            self.ws()
            if not self.s.startswith(":", self.i):
                raise self.err("expected ':'")
            self.i += 1
            out[k] = self.value()  # duplicate field: last wins
            self.ws()
            if self.s.startswith(",", self.i):
                self.i += 1
                self.ws()
                if self.s.startswith("}", self.i):  # trailing comma
                    self.i += 1
                    return out
                continue
            if self.s.startswith("}", self.i):
                self.i += 1
                return out
            raise self.err("expected ',' or '}'")

    def _seq(self, close: str, ctor, sexp: bool = False):
        self.i += 1
        out = []
        while True:
            self.ws()
            if self.i >= self.n:
                raise self.err(f"unterminated '{close}' sequence")
            if self.s.startswith(close, self.i):
                self.i += 1
                return ctor(out)
            if sexp:
                m = _ION_OPER.match(self.s, self.i)
                if m:
                    out.append({"$ion_symbol": m.group(0)})
                    self.i = m.end()
                    continue
            out.append(self.value())
            if not sexp:
                self.ws()
                if self.s.startswith(",", self.i):
                    self.i += 1

    def _lob(self) -> dict:
        j = self.s.find("}}", self.i + 2)
        if j < 0:
            raise self.err("unterminated lob")
        body = self.s[self.i + 2:j].strip()
        self.i = j + 2
        if body.startswith('"'):  # clob (short form)
            inner = _IonReader(body)
            return {"$ion_clob": inner._string()}
        return {"$ion_blob": re.sub(r"\s+", "", body)}


def decode_ion_text(payload: str):
    """Parse ONE top-level text-Ion value (after an optional $ion_1_0
    version marker) into a JSON-serializable object; raises ValueError on
    anything that is not well-formed text Ion (binary Ion included), which
    the POST dispatch turns into the raw fallback — the same
    decode-or-fall-through contract as every other M12 branch."""
    r = _IonReader(payload)
    r.ws()
    if r.s.startswith("$ion_1_0", r.i):
        r.i += len("$ion_1_0")
    v = r.value()
    r.ws()
    if r.i != r.n:
        raise r.err("trailing content after the top-level value")
    return v


_PROTOBUF_MIMES = ("application/grpc-web+proto", "application/x-protobuf",
                   "application/proto", "application/x-protobuffer")


def decode_posted_data(mimetype: str, payload: "str | bytes"):
    """Mime-routed POST-body decode dispatch — the recast of the reference's
    biggest per-record parser (M12, /root/reference/har2tree/nodes.py:260-498):
    base64 repair → form-urlencoded → NDJSON stream → multipart → JSON
    family → text → pass-through.

    Binary wire formats decode with pure-stdlib walkers: protobuf via
    ``decode_protobuf_wire`` (blackboxprotobuf shape, nodes.py:401-416),
    dns-message via ``decode_dns_wire`` (nodes.py:433-441); atom+xml and
    amazon-ion text try the JSON tear the reference applies
    (nodes.py:363-377,418-432 — ion TEXT is decoded for its
    JSON-expressible subset; binary ion falls to raw, documented recast of
    simpleion).  Undecodable wire falls to the raw branch like the
    reference's final fallback (nodes.py:470-498).  Returns a
    JSON-serializable value (the engine stores it as a JSON string column —
    the dynamic ``posted_data`` union of SURVEY §2 hard-part (4))."""
    import json as _json
    from urllib.parse import parse_qsl

    if isinstance(payload, str) and mimetype and "base64" in mimetype:
        raw = repair_b64(payload)
        if raw:
            payload = raw
    mt = (mimetype or "").lower()
    # binary-first mimes: decode from BYTES before any utf-8 pass
    if mt.startswith(_PROTOBUF_MIMES):
        raw = payload.encode() if isinstance(payload, str) else payload
        try:
            message, typedef = decode_protobuf_wire(raw)
            return [{"protobuf_message": message, "typedef": typedef}]
        except ValueError:
            pass  # fall through to the generic branches
    if mt.startswith("application/dns-message") and isinstance(payload, bytes):
        try:
            return decode_dns_wire(payload)
        except ValueError:
            pass
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8")
        except UnicodeDecodeError:
            return {"_raw_b64": base64.b64encode(payload).decode()}
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
    if mt.startswith("application/x-amzn-ion"):
        # full-fidelity TEXT-Ion parse (simpleion recast, nodes.py:418-431)
        # — strictly widens the old JSON tear: JSON-shaped bodies parse to
        # the same object (Ion structs/lists/strings/ints ⊇ JSON), while
        # symbols, annotations, timestamps, sexps and lobs land as $ion_*
        # sentinels instead of falling to raw.  Binary Ion / malformed
        # text still falls through verbatim like every M12 branch.
        try:
            return decode_ion_text(payload)
        except (ValueError, IndexError):
            return payload
    if mt.startswith("application/atom+xml"):
        # observed carrying JSON blobs in the wild (nodes.py:363-377) —
        # tear as JSON, keep verbatim otherwise
        try:
            return _json.loads(payload)
        except ValueError:
            return payload
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
