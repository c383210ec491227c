"""URL scalar functions (reference parity: /root/reference/har2tree/nodes.py
and helper.py — M4-M11, M20, M21, M27 in SURVEY.md §2.2).

These are pure functions applied in vectorized batches; nothing here touches
Ray.  Semantics follow the reference behaviorally (cited per function), not
its code.
"""

from __future__ import annotations

import ipaddress
import os
import re as _re
from urllib.parse import (parse_qsl, quote, unquote_plus, urlencode, urljoin,
                          urlparse, urlsplit, urlunsplit)

__all__ = [
    "split_url",
    "strip_fragment",
    "is_ip_hostname",
    "idna_decode",
    "rebuild_url",
    "strip_html5_whitespace",
    "safe_url_string",
    "canonicalize_url",
]


def split_url(url: str) -> tuple[str, str, str]:
    """→ (scheme, hostname, filename).

    Mirrors URLNode host/filename extraction
    (/root/reference/har2tree/nodes.py:186-213): ``file:`` URLs have no
    hostname and the path basename as filename; ``blob:`` and ``data:`` keep
    the scheme with empty hostname; http(s) keeps the netloc (with port) and
    falls back to ``file.bin`` when the path has no basename.

    The http(s) branch is a hand-rolled parse with urlparse-identical output
    (differential-tested): ``urlparse`` was 35% of the tree-cascade batch
    profile, called once per span.
    """
    if not url:
        return "", "", ""
    if url.startswith("https://") or url.startswith("http://"):
        scheme, rest = url.split("://", 1)
        cut = len(rest)
        for i, ch in enumerate(rest):
            if ch in "/?#":
                cut = i
                break
        netloc = rest[:cut]
        if cut == len(rest) or rest[cut] != "/":
            return scheme, netloc, "file.bin"  # empty path
        path = rest[cut:]
        for stop in "?#":
            j = path.find(stop)
            if j != -1:
                path = path[:j]
        fn = path.rsplit("/", 1)[-1]
        return scheme, netloc, fn or "file.bin"
    parsed = urlparse(url)
    scheme = parsed.scheme
    if scheme == "file":
        return scheme, "", os.path.basename(parsed.path) or "file.bin"
    if scheme in ("blob", "data"):
        return scheme, "", ""
    if not scheme and "://" not in url:
        # relative reference: no scheme, no hostname
        return "", "", os.path.basename(parsed.path) or ""
    hostname = parsed.netloc
    filename = os.path.basename(parsed.path)
    return scheme, hostname, filename or "file.bin"


def strip_fragment(url: str) -> str:
    """``alternative_url_for_referer`` — drop everything after the first ``#``
    (/root/reference/har2tree/nodes.py:220)."""
    return url.split("#", 1)[0]


def is_ip_hostname(hostname: str) -> bool:
    """True when the hostname parses as an IP address
    (/root/reference/har2tree/nodes.py:233-238).  Ports/brackets stripped
    like the reference's v6 normalization (nodes.py:592-599)."""
    if not hostname:
        return False
    h = hostname
    if h.startswith("[") and "]" in h:
        h = h[1 : h.index("]")]
    elif h.count(":") == 1:
        h = h.split(":", 1)[0]
    try:
        ipaddress.ip_address(h)
        return True
    except ValueError:
        return False


def idna_decode(hostname: str) -> str:
    """Decoded punycode hostname if it differs, else ''
    (/root/reference/har2tree/nodes.py:240-247)."""
    if "xn--" not in hostname:
        return ""
    try:
        decoded = hostname.encode("ascii").decode("idna")
    except (UnicodeError, UnicodeDecodeError):
        return ""
    return decoded if decoded != hostname else ""


def rebuild_url(base_url: str, partial: str, known_urls: "set[str] | frozenset[str]",
                strict: bool = False) -> str:
    """Repair a partial/relative redirect target against a base URL, validated
    against the document's known-URL set.

    Escalating strategies behaviorally matching the reference
    (/root/reference/har2tree/helper.py:130-201):
      1. already-known absolute URL → itself;
      2. scheme-relative ``//host/...`` → base scheme;
      3. absolute path → base origin + path;
      4. relative path → urljoin against base;
      5. known-URL suffix match (same path under another known origin);
    each candidate is accepted only if present in ``known_urls``; when none
    matches, the best-effort candidate (urljoin) is returned.

    ``strict=True`` (the tree cascade's mode) runs strategies 1-4 only and
    returns '' when no candidate is known: the reference's suffix scan
    (helper.py:196-199) picks an arbitrary member when several known URLs
    share a path suffix, and a distributed engine needs the attach decision
    to be set-order independent.
    """
    if not partial:
        return ""
    partial = partial.strip().strip("'\"")
    if partial in known_urls:
        return partial
    base = urlparse(base_url)
    candidates: list[str] = []
    if partial.startswith("//"):
        candidates.append(f"{base.scheme}:{partial}")
    elif partial.startswith("/"):
        candidates.append(f"{base.scheme}://{base.netloc}{partial}")
    elif partial.startswith(("http://", "https://")):
        candidates.append(partial)
    else:
        candidates.append(urljoin(base_url, partial))
        candidates.append(f"{base.scheme}://{partial}")
    for cand in candidates:
        if cand in known_urls:
            return cand
        # normalize duplicate slashes in the path (reference uses normpath,
        # helper.py:186-194)
        p = urlparse(cand)
        norm = p._replace(path=os.path.normpath(p.path)).geturl() if p.path else cand
        if norm in known_urls:
            return norm
    if strict:
        return ""
    # suffix match against known URLs (strategy 5)
    for k in known_urls:
        if partial and k.endswith(partial):
            return k
    return candidates[0]


# --------------------------------------------------------------------------
# M31 URL canonicalization — the reference sanitizes every rendered-page URL
# through w3lib (strip_html5_whitespace → safe_url_string → urljoin →
# canonicalize_url, /root/reference/har2tree/nodes.py:663-673).  The three
# functions below re-express that PUBLIC, documented behavior with the
# stdlib; none of w3lib's code is used.

_HTML5_WS = " \t\n\r\x0c"

#: RFC 3986 sub-delims + path extras w3lib's canonical form leaves unescaped.
_PATH_SAFE = "/;:@&=+$,!*'()~"
_FRAGMENT_SAFE = _PATH_SAFE + "?"


def strip_html5_whitespace(url: str) -> str:
    """Trim the HTML5 'space characters' (space, tab, LF, CR, FF) — what a
    browser strips from an attribute URL before resolving it."""
    return url.strip(_HTML5_WS)


def safe_url_string(url: str) -> str:
    """Percent-escape characters that make a URL unsafe to fetch (spaces,
    non-ASCII, control bytes) while leaving existing escapes and RFC 3986
    reserved characters intact; IDNA-encode a non-ASCII host.  Behavioral
    recast of w3lib's documented ``safe_url_string`` contract."""
    try:
        parts = urlsplit(strip_html5_whitespace(url))
    except ValueError:
        return url
    netloc = parts.netloc
    try:
        netloc.encode("ascii")
    except UnicodeEncodeError:
        userinfo, _, hostport = netloc.rpartition("@")
        host, colon, port = hostport.partition(":")
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass
        netloc = (userinfo + "@" if userinfo else "") + host + colon + port
    # quote() with '%' in safe keeps existing escapes; utf-8 for the rest
    return urlunsplit((
        parts.scheme,
        netloc,
        quote(parts.path, safe=_PATH_SAFE + "%"),
        quote(parts.query, safe=_PATH_SAFE + "%?/"),
        quote(parts.fragment, safe=_FRAGMENT_SAFE + "%"),
    ))


_RE_PCT = _re.compile("%([0-9a-fA-F]{2})")


def _norm_pct(text: str, safe: str) -> str:
    """Normalize percent-escapes to canonical form: raw unsafe characters
    get escaped, escapes of unreserved characters get decoded, every
    remaining escape gets uppercase hex.  %2F/%3F stay escaped — decoding
    them would change path semantics."""
    text = quote(text, safe=safe + "%")  # '%' safe ⇒ existing escapes intact

    def fix(m: "_re.Match[str]") -> str:
        b = int(m.group(1), 16)
        ch = chr(b)
        if b < 128 and (ch.isalnum() or ch in "-._~"):
            return ch  # unreserved: canonical form is the bare character
        return "%" + m.group(1).upper()

    return _RE_PCT.sub(fix, text)


def canonicalize_url(url: str, keep_fragments: bool = False) -> str:
    """One canonical spelling per URL — the reference's dedup key for
    rendered-page URLs (nodes.py:669).  Behavioral recast of w3lib's
    documented ``canonicalize_url``: lowercase scheme and host, strip the
    scheme's default port, normalize percent-escapes to uppercase hex and
    minimal form, empty path → '/', query arguments sorted by (key, value)
    and re-encoded, fragment dropped unless ``keep_fragments``.

    Documented deviations from w3lib (engine contract notes, like the
    rebuild_url strategy list): (a) an empty path stays empty — not '/' —
    when the URL has no netloc (every downstream consumer requires a
    netloc, so the case is unreachable in pipelines; noted here because it
    would matter if this were ever used as a bare dedup key); (b) on a
    ``urlsplit`` ValueError (e.g. an invalid port) the input is returned
    unchanged rather than raising."""
    try:
        parts = urlsplit(strip_html5_whitespace(url))
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    userinfo, _, hostport = parts.netloc.rpartition("@")
    host, colon, port = hostport.partition(":")
    host = host.lower()
    if port and {"http": "80", "https": "443", "ftp": "21"}.get(scheme) == port:
        colon = port = ""
    netloc = (userinfo + "@" if userinfo else "") + host + colon + port
    path = _norm_pct(parts.path, safe=_PATH_SAFE) or ("/" if netloc else "")
    pairs = sorted(parse_qsl(parts.query, keep_blank_values=True))
    query = urlencode(pairs)
    fragment = parts.fragment if keep_fragments else ""
    return urlunsplit((scheme, netloc, path, query, fragment))


def unquote_name(url: str) -> str:
    """Node display name — ``unquote_plus``
    (/root/reference/har2tree/nodes.py:176)."""
    return unquote_plus(url)
