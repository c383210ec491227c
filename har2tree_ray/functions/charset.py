"""Charset-aware body decoding (M32).

The reference normalizes every response body through charset_normalizer
before parsing (``charset_normalizer.from_bytes(html).best()``,
/root/reference/har2tree/helper.py:283-294), so non-UTF-8 captures keep
their extraction evidence (URLs with accented path segments, meta-refresh
targets in legacy encodings).  charset_normalizer is a statistical
detector; this container has no such dependency, so the engine uses the
deterministic stdlib sniff chain below instead — it covers every charset a
*declared* real-world capture can carry and never loses bytes:

1. **BOM** — UTF-8-sig / UTF-32 LE,BE / UTF-16 LE,BE (UTF-32 checked first:
   a UTF-32-LE BOM starts with the UTF-16-LE one).
2. **Strict UTF-8** — valid UTF-8 is effectively unambiguous for multi-byte
   text and is the dominant real-world encoding; taking it before any
   declaration also matches charset_normalizer, which trusts bytes over
   headers.
3. **In-content declaration** — HTML ``<meta charset>`` /
   ``<meta http-equiv=Content-Type>`` or an XML ``encoding=`` prolog within
   the first 2048 bytes (the window HTML5 parsers use).
4. **Transport declaration** — the ``charset=`` parameter of the
   Content-Type header / HAR ``content.mimeType``.
5. **latin-1** — total fallback; maps every byte, so decoding never fails
   and evidence is never dropped (vs the old ``utf-8 errors=replace``
   which turned every non-UTF-8 URL byte into U+FFFD).

Pure functions — callers sit inside ``map_batches`` tasks (sources/har.py),
so this is vectorization-neutral and needs no state.
"""

from __future__ import annotations

import codecs
import re

#: BOM → codec, longest-prefix first (UTF-32-LE BOM contains UTF-16-LE's).
#: The BOM-autodetecting codec names ("utf-16", not "utf-16-le") so the BOM
#: itself is stripped from the decoded text, not kept as U+FEFF.
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32"),
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)

# <meta charset="..."> | <meta http-equiv="content-type" content="...;charset=...">
# | <?xml ... encoding="..."?> — ASCII-compatible scan over the raw bytes.
_RE_META = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]+)""", re.I)
_RE_XML = re.compile(
    rb"""<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9._:-]+)["']""", re.I)
_RE_CT_PARAM = re.compile(r"""charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]+)""", re.I)

_SNIFF_WINDOW = 2048


def charset_from_content_type(value: str | None) -> str:
    """``text/html; charset=ISO-8859-1`` → ``ISO-8859-1`` (or '')."""
    if not value or "charset" not in value.lower():
        return ""
    m = _RE_CT_PARAM.search(value)
    return m.group(1) if m else ""


def _codec(name: str) -> str:
    """Validated codec name, or '' when unknown/unsafe."""
    if not name:
        return ""
    try:
        return codecs.lookup(name).name
    except LookupError:
        return ""


def sniff_charset(raw: bytes, declared: str = "") -> str:
    """Best-effort charset of ``raw`` via the deterministic chain above."""
    for bom, codec in _BOMS:
        if raw.startswith(bom):
            return codec
    # NUL bytes are VALID UTF-8 (U+0000) but never appear in legitimate web
    # text — they are the signature of BOM-less UTF-16/32.  Without this
    # guard a declared charset=utf-16 body would be "successfully" decoded
    # as UTF-8 into NUL-interleaved garbage and never reach steps 3-4.
    if b"\x00" not in raw:
        try:
            raw.decode("utf-8")
            return "utf-8"
        except (UnicodeDecodeError, ValueError):
            pass
    head = raw[:_SNIFF_WINDOW]
    m = _RE_META.search(head) or _RE_XML.search(head)
    if m:
        codec = _codec(m.group(1).decode("ascii", "ignore"))
        if codec:
            return codec
    codec = _codec(declared)
    if codec:
        return codec
    return "latin-1"


def decode_body(raw: bytes, declared: str = "") -> str:
    """Bytes → text with the sniffed charset; never raises, never drops a
    byte silently (worst case is latin-1's byte-per-char identity map)."""
    codec = sniff_charset(raw, declared)
    try:
        return raw.decode(codec, errors="replace")
    except Exception:  # defensive: a sniffed multi-byte codec on junk
        return raw.decode("latin-1")
