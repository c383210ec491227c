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
  reference/har2tree/nodes.py:131-170) without pyfaup: the standard Public
  Suffix List algorithm (publicsuffix.org/list/ spec — longest matching
  rule wins, '*' wildcards, '!' exceptions, implicit '*' default) over a
  vendored PSL snapshot (``har2tree_ray/data/public_suffix_snapshot.dat``,
  same format as the upstream file so a full-list swap is a file drop);
  IPs yield no domain (the reference returns None for IP hosts).

Pure functions — vectorized by the calling ``map_batches`` stage.  The PSL
tables are parsed once at module import (an actor importing this module
pays the parse once, not per batch — the ST2 suffix-table state recast).
"""

from __future__ import annotations

import hashlib
import os
import re

HHHASH_VERSION = 1
_DIRECTIVE = re.compile(r"@([a-z_]+)=")
_SITEKEY = re.compile(r'data-sitekey="([^"]+)"')
_GTAG = re.compile(r"\b(G(?:TM?)?-[A-Z0-9]{6,10})\b")
GTAG_BLOCKLIST = frozenset({"G-00000000", "G-12345678", "GTM-XXXXXX"})
_IPV4 = re.compile(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")

_PSL_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "data", "public_suffix_snapshot.dat")


def _load_psl(path: str = _PSL_PATH) -> tuple[frozenset, frozenset, frozenset]:
    """→ (exact rules, wildcard PARENTS, exception rules) — each a frozenset
    of dotted suffix strings.  ``*.ck`` is stored as parent ``ck``;
    ``!www.ck`` as exception ``www.ck``."""
    exact, wild, exc = set(), set(), set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            rule = line.strip()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                exc.add(rule[1:])
            elif rule.startswith("*."):
                wild.add(rule[2:])
            else:
                exact.add(rule)
    return frozenset(exact), frozenset(wild), frozenset(exc)


PSL_EXACT, PSL_WILDCARD_PARENTS, PSL_EXCEPTIONS = _load_psl()
# deepest rule, in labels — bounds the suffix-candidate scan per hostname
_PSL_MAX_LABELS = max(
    max((r.count(".") + 1 for r in PSL_EXACT), default=1),
    max((r.count(".") + 2 for r in PSL_WILDCARD_PARENTS), default=1),
)


def _suffix_nlabels(labels: list[str]) -> int:
    """Number of labels in the public suffix of ``labels`` per the PSL
    algorithm: exception rules win (suffix = rule minus its leftmost
    label), else the longest matching exact/wildcard rule, else the
    implicit ``*`` default (1)."""
    n = len(labels)
    for k in range(min(n, _PSL_MAX_LABELS + 1), 0, -1):
        if ".".join(labels[n - k:]) in PSL_EXCEPTIONS:
            return k - 1
    best = 1  # implicit default rule '*'
    for k in range(1, min(n, _PSL_MAX_LABELS) + 1):
        tail = ".".join(labels[n - k:])
        if tail in PSL_EXACT:
            best = max(best, k)
        if tail in PSL_WILDCARD_PARENTS and n >= k + 1:
            # '*.<tail>' matches one extra label to the left
            best = max(best, k + 1)
    return best


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


def psl_sql_tables() -> tuple[dict[int, list[str]], dict[int, list[str]], list[tuple[str, int]]]:
    """The PSL tables regrouped for SQL generation: exact rules by label
    count (k=1 omitted — identical to the implicit default), wildcard
    parents by parent label count, exception rules as (rule, rule_labels)
    longest-first.  Used by the ``host_tld`` DuckDB oracle so both sides
    derive from the one vendored data file."""
    exact: dict[int, list[str]] = {}
    for r in PSL_EXACT:
        k = r.count(".") + 1
        if k >= 2:
            exact.setdefault(k, []).append(r)
    wild: dict[int, list[str]] = {}
    for r in PSL_WILDCARD_PARENTS:
        wild.setdefault(r.count(".") + 1, []).append(r)
    exc = sorted(((r, r.count(".") + 1) for r in PSL_EXCEPTIONS),
                 key=lambda t: (-t[1], t[0]))
    return ({k: sorted(v) for k, v in exact.items()},
            {k: sorted(v) for k, v in wild.items()}, exc)


def split_suffix(hostname: str) -> tuple[str, str]:
    """→ (tld, registered_domain) per the PSL algorithm; ('','') for IPs,
    empties and single labels; registered_domain is '' when the hostname IS
    a public suffix.  Port is stripped first (nodes.py:592-599
    normalization)."""
    if not hostname:
        return "", ""
    h = hostname.rsplit(":", 1)[0] if re.search(r":[0-9]+$", hostname) else hostname
    if _IPV4.match(h):
        return "", ""
    labels = h.split(".")
    if len(labels) < 2:
        return "", ""
    k = _suffix_nlabels(labels)
    tld = ".".join(labels[len(labels) - k:])
    reg = ".".join(labels[len(labels) - k - 1:]) if len(labels) > k else ""
    return tld, reg
