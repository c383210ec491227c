"""Web-artifact hash + identifier functions (reference parity ops):

* ``hhhash``     — HHHash over the span's ordered directive names — the
  recast of the header-name hash (M13, /root/reference/har2tree/helper.py:
  49-82): ordered names, consecutive duplicates collapsed, version-prefixed
  sha256.
* ``domhash``    — per-document structure hash (M29, /root/reference/
  har2tree/nodes.py:83-85): sha256 of the '|'-joined ordered kind sequence,
  truncated to 32 hex chars.
* ``extract_identifiers`` — captcha sitekeys + google tag IDs with blocklist
  (M30, /root/reference/har2tree/helper.py:253-280).
* ``split_suffix`` — TLD / registered-domain extraction (M28, /root/
  reference/har2tree/nodes.py:131-170) without pyfaup: last-label TLD with a
  small built-in second-level suffix list; IPs yield no domain (the
  reference returns None for IP hosts).

Pure functions — vectorized by the calling ``map_batches`` stage.
"""

from __future__ import annotations

import hashlib
import re

HHHASH_VERSION = 1
_DIRECTIVE = re.compile(r"@([a-z_]+)=")
_SITEKEY = re.compile(r'data-sitekey="([^"]+)"')
_GTAG = re.compile(r"\b(G(?:TM?)?-[A-Z0-9]{6,10})\b")
GTAG_BLOCKLIST = frozenset({"G-00000000", "G-12345678", "GTM-XXXXXX"})
SECOND_LEVEL_SUFFIXES = frozenset({"co.uk", "com.au", "co.jp", "com.br", "co.in"})
_IPV4 = re.compile(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")


def hhhash(text: str) -> str:
    """Ordered directive names, consecutive-dup collapsed →
    'hhh:1:' + sha256 of ':'-joined names (helper.py:49-82 semantics)."""
    names = _DIRECTIVE.findall(text)
    deduped: list[str] = []
    for n in names:
        if not deduped or deduped[-1] != n:
            deduped.append(n)
    digest = hashlib.sha256(":".join(deduped).encode()).hexdigest()
    return f"hhh:{HHHASH_VERSION}:{digest}"


def domhash(kinds_in_order: list[str]) -> str:
    """sha256 of '|'-joined kind sequence, 32 hex chars (nodes.py:83-85)."""
    return hashlib.sha256("|".join(kinds_in_order).encode()).hexdigest()[:32]


def extract_identifiers(text: str) -> tuple[list[str], list[str]]:
    """→ (sitekeys, gtag_ids) — gtag ids filtered against the blocklist
    (helper.py:275-277)."""
    sitekeys = _SITEKEY.findall(text)
    gtags = [g for g in _GTAG.findall(text) if g not in GTAG_BLOCKLIST]
    return sitekeys, gtags


def split_suffix(hostname: str) -> tuple[str, str]:
    """→ (tld, registered_domain); ('','') for IPs, empties and single
    labels.  Port is stripped first (nodes.py:592-599 normalization)."""
    if not hostname:
        return "", ""
    h = hostname.rsplit(":", 1)[0] if re.search(r":[0-9]+$", hostname) else hostname
    if _IPV4.match(h):
        return "", ""
    labels = h.split(".")
    if len(labels) < 2:
        return "", ""
    tail2 = ".".join(labels[-2:])
    if tail2 in SECOND_LEVEL_SUFFIXES and len(labels) >= 3:
        return tail2, ".".join(labels[-3:])
    return labels[-1], tail2
