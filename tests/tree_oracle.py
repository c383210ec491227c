"""Independent single-process implementation of the tree-build semantics.

Deliberately written in a different style from the engine (recursive, own
inline parsing, no pandas/pyarrow) so that structural bugs in the
distributed implementation don't cancel out.  Semantics spec: the docstring
of har2tree_ray/pipelines/tree.py (itself the recast of
/root/reference/har2tree/har2tree.py:718-1014,770-853,575-607).
"""

from __future__ import annotations

import re
import sys
from urllib.parse import urlparse

sys.setrecursionlimit(10000)

TOKEN = re.compile(r"@(\w+)=(\S+)")
SRC = re.compile(r'src="([^"]+)"')
HREF = re.compile(r'href="([^"]+)"')
CSSURL = re.compile(r"url\(([^)]+)\)")
JSLOC = re.compile(r"location\.href='([^']+)'")
SRCSET = re.compile(r'srcset="([^"]+)"')
ATTR = re.compile(r'\b(?:poster|longdesc|data)="([^"]+)"')
CSSIMPORT = re.compile(r'@import\s+["\']([^"\']+)["\']')
METATAG = re.compile(r'<meta[^>]*?content="\s*\d+\s*;\s*url=([^"]+)"', re.I)
ANYURL = re.compile(r'https?://[^\s"\'<>()\[\]{}]+')

CONTAINERS = {"document", "script", "iframe"}


def parse_span(span: dict) -> dict:
    t = span["text"]
    d: dict = {"redirect": "", "meta_refresh": "", "referer": "", "initiator": "",
               "frames": [], "status": 200}
    for key, val in TOKEN.findall(t):
        if key == "redirect" and not d["redirect"]:
            d["redirect"] = val
        elif key == "meta_refresh" and not d["meta_refresh"]:
            d["meta_refresh"] = val
        elif key == "referer" and not d["referer"]:
            d["referer"] = val
        elif key == "initiator" and not d["initiator"]:
            d["initiator"] = val
        elif key == "frame":
            d["frames"].append(val)
        elif key == "status":
            d["status"] = int(val)
    import html as _html

    un = _html.unescape(t) if ("&quot;" in t or "&amp;" in t or "&#" in t) else None

    def chan(rx):
        vals = rx.findall(t)
        if un is not None:
            vals = list(dict.fromkeys(vals + rx.findall(un)))
        return vals

    d["src"] = chan(SRC)
    d["href"] = chan(HREF)
    d["cssurl"] = chan(CSSURL)
    d["jsloc"] = chan(JSLOC)
    d["srcset"] = [c.strip().split(" ")[0] for v in chan(SRCSET)
                   for c in v.split(",") if c.strip()]
    d["attr"] = chan(ATTR)
    d["cssimport"] = chan(CSSIMPORT)
    d["fulltext"] = [u.rstrip(".,;:!?") for u in
                     ANYURL.findall(re.sub(r"@\w+=\S+", " ", un or t))]
    if not d["meta_refresh"]:
        m = METATAG.search(t)
        if m:
            d["meta_refresh"] = m.group(1)
    d["url"] = span["media_ref"]
    d["kind"] = span["kind"]
    d["offset"] = span["offset"]
    p = urlparse(span["media_ref"])
    d["hostname"] = p.netloc if p.scheme in ("http", "https") else ""
    return d


def build_tree_oracle(spans: list[dict]) -> list[tuple]:
    """→ list of (child_offset, parent_offset, attach_rule, depth)."""
    ns = sorted((parse_span(s) for s in spans), key=lambda d: d["offset"])
    ok_urls = {n["url"] for n in ns if n["status"] > 0}
    ns = [n for n in ns if (n["status"] > 0 or n["url"] not in ok_urls) and n["url"]]
    if not ns:
        return []
    urlmap: dict[str, list[int]] = {}
    for i, n in enumerate(ns):
        urlmap.setdefault(n["url"], []).append(i)
    allurls = set(urlmap)
    free = set(range(1, len(ns)))
    out = [(ns[0]["offset"], -1, "root", 0)]
    depth = {0: 0}

    def nofrag(u: str) -> str:
        return u.split("#", 1)[0]

    def repair(base: str, t: str) -> str:
        """M21 partial-target repair, written independently: strategies
        exact → scheme-relative → path-absolute → urljoin, each accepted only
        if the candidate (or its normpath form) is a known URL, else ''."""
        import posixpath
        from urllib.parse import urljoin as _uj

        t = t.strip().strip("'\"")
        if t in allurls:
            return t
        b = urlparse(base)
        if t.startswith("//"):
            cands = [f"{b.scheme}:{t}"]
        elif t.startswith("/"):
            cands = [f"{b.scheme}://{b.netloc}{t}"]
        elif t.startswith(("http://", "https://")):
            cands = [t]
        else:
            cands = [_uj(base, t), f"{b.scheme}://{t}"]
        for c in cands:
            if c in allurls:
                return c
            pc_ = urlparse(c)
            if pc_.path:
                n2 = pc_._replace(path=posixpath.normpath(pc_.path)).geturl()
                if n2 in allurls:
                    return n2
        return ""

    def eff_redirect(n: dict) -> str:
        if n["redirect"]:
            return repair(n["url"], n["redirect"]) or n["redirect"]
        if n["meta_refresh"]:
            m = repair(n["url"], n["meta_refresh"])
            if m:
                return m
        for j in n["jsloc"]:
            jj = repair(n["url"], j)
            if jj:
                return jj
        return ""

    def resolvable_ref(n: dict) -> bool:
        return bool(n["referer"]) and (n["referer"] in allurls or nofrag(n["referer"]) in allurls)

    def grab(i: int, p: int, rule: str) -> None:
        free.discard(i)
        depth[i] = depth[p] + 1
        out.append((ns[i]["offset"], ns[p]["offset"], rule, depth[i]))

    def expand(u: int) -> None:
        me = ns[u]
        kids = []
        tgt = eff_redirect(me)
        if tgt:
            chosen = []
            for c in urlmap.get(tgt, []):
                if c in free:
                    chosen.append(c)
                    if ns[c]["status"] > 0:
                        break
            for c in chosen:
                grab(c, u, "redirect")
                kids.append(c)
        for fu in me["frames"]:
            for v in dict.fromkeys((fu, nofrag(fu))):
                for c in urlmap.get(v, []):
                    if c in free:
                        grab(c, u, "frame")
                        kids.append(c)
        for c in sorted(free):
            if ns[c]["initiator"] == me["url"]:
                grab(c, u, "initiator")
                kids.append(c)
        for c in sorted(free):
            if ns[c]["referer"] == me["url"]:
                grab(c, u, "referer")
                kids.append(c)
        for c in sorted(free):
            r = ns[c]["referer"]
            if r and r != me["url"] and nofrag(r) == me["url"]:
                grab(c, u, "referer_nofrag")
                kids.append(c)
        for cls in ("src", "href", "cssurl", "srcset", "attr", "cssimport",
                    "fulltext"):
            for ref in me[cls]:
                for c in urlmap.get(ref, []):
                    if c in free and not resolvable_ref(ns[c]):
                        grab(c, u, f"external_{cls}")
                        kids.append(c)
        for k in kids:
            expand(k)

    expand(0)
    done = 0
    while free and done < 1000:
        o = min(free)
        done += 1
        me = ns[o]
        p, rule = 0, "fallback_root"
        if me["referer"]:
            hit = [i for i in urlmap.get(me["referer"], []) if i not in free]
            if not hit:
                hit = [i for i in urlmap.get(nofrag(me["referer"]), []) if i not in free]
            if hit:
                p, rule = min(hit), "fallback_referer"
            else:
                rp = urlparse(me["referer"])
                rh = rp.netloc if rp.scheme in ("http", "https") else ""
                cands = [i for i in range(len(ns))
                         if i not in free and ns[i]["hostname"] == rh
                         and ns[i]["kind"] in CONTAINERS]
                if cands:
                    p = min(cands, key=lambda i: (-depth[i], i))
                    rule = "fallback_hostname"
        grab(o, p, rule)
        expand(o)
    return out
