"""Real-HAR ingestion (S1/S4): HAR JSON capture files (``.har`` /
``.har.gz``) → the engine's interleaved document schema.

The reference consumes one HAR dict per document and sorts its entries by
``startedDateTime`` (/root/reference/har2tree/har2tree.py:108-183); here each
HAR file becomes ONE interleaved row whose spans carry the same evidence the
reference extracts per entry, re-encoded as the engine's directive
vocabulary:

* ``@status``     — response.status
* ``@redirect``   — response.redirectURL (M24)
* ``@referer``    — request Referer header (J3; har2tree.py:249-253)
* ``@ua``         — first entry's User-Agent header (M11; har2tree.py:255-260)
* ``@initiator``  — Chrome ``_initiator`` url / top stack frame (M25)
* ``@dur``        — entry.time ms (M8)
* ``@cookie`` / ``@setcookie`` — request/response cookie headers (M14/M15)
* ``@post``       — request.postData as ``mime:b64`` (M12)
* response body text is appended verbatim so markup evidence
  (``src=``/``href=``/``url()``/``location.href``) feeds the external-
  resource joins exactly like the reference's soup pass (M19/M31).

Directive values are single tokens (spaces → ``%20``) because the directive
grammar is whitespace-delimited; ``media_ref`` keeps the raw URL.

Scale shape: file paths fan out through ``from_items → map_batches`` so
parsing is distributed (one task per few files), and the output is a normal
interleaved Dataset — every downstream pipeline (cascade, chains, rollups)
runs on it unchanged.
"""

from __future__ import annotations

import base64
import glob
import gzip
import json
import os
import re

import pyarrow as pa

import ray.data as rd

from ..functions.charset import charset_from_content_type, decode_body
from ..schema import INTERLEAVED_SCHEMA

_BODY_CAP = 200_000  # chars of response body kept per span

# Injection guard: page content and header values are UNTRUSTED (har2tree's
# core use case is hostile captures) but share the whitespace-delimited text
# stream with the engine's directives.  Any '@<name>=' sequence arriving from
# HAR data — response bodies, referer/cookie header values, redirect URLs —
# is percent-escaped at ingest so it can never be parsed as a directive.
# The reference reads these from structured HAR fields and is immune
# (har2tree.py:249-260, nodes.py:508-539); this restores that property.
_DIRECTIVE_NAMES = ("geo", "status", "redirect", "meta_refresh", "referer",
                    "initiator", "frame", "setcookie", "cookie", "post",
                    "tls", "ua", "dur")
_RE_AT_DIRECTIVE = re.compile(r"@(?=(?:%s)=)" % "|".join(_DIRECTIVE_NAMES))


def _defang(text: str) -> str:
    """Escape directive-forging '@' in untrusted HAR-derived text."""
    return _RE_AT_DIRECTIVE.sub("%40", text) if "@" in text else text


def _tok(v: str) -> str:
    """Directive values must be single whitespace-free tokens that cannot
    themselves smuggle a directive (see ``_defang``)."""
    return _defang(v).replace(" ", "%20").replace("\t", "%09").replace("\n", "%0A")


def _header(headers: list[dict], name: str) -> str:
    for h in headers or []:
        if h.get("name", "").lower() == name:
            return h.get("value", "") or ""
    return ""


def _kind(mime: str, url: str) -> str:
    m = (mime or "").lower()
    if "html" in m:
        return "document"
    if "javascript" in m or "ecmascript" in m:
        return "script"
    if "css" in m:
        return "css"
    if m.startswith("image/"):
        return "img"
    if m.startswith(("audio/", "video/")) or "shockwave" in m:
        return "media"
    if "font" in m or url.split("?")[0].endswith((".woff", ".woff2", ".ttf")):
        return "font"
    return "other"


def _initiator_url(entry: dict) -> str:
    ini = entry.get("_initiator")
    if not isinstance(ini, dict):
        return ""
    if ini.get("url"):
        return ini["url"]
    stack = ini.get("stack") or {}
    frames = stack.get("callFrames") or []
    if frames and frames[0].get("url"):
        return frames[0]["url"]
    return ""


def _local_only(url: str | None) -> bool:
    """URLs whose frame content never loads remotely — reference
    ``_url_to_local_only_content`` (har2tree.py:430-436)."""
    return (url is None or url in ("about:blank", "about:srcdoc", "")
            or url.startswith(("data", "chrome-error", "blob")))


def flatten_frames(frames: dict) -> dict[str, list[str]]:
    """Recursive ``FramesResponse`` sidecar → {frame URL → child real URLs}.

    Mirrors the reference's frame walk (har2tree.py:855-877): a frame node
    with children contributes, per child, its first *real* (non-local-only)
    URL, recursing through local-only children.  Keys are stored unquoted
    AND fragment-stripped so the cascade's exact ``media_ref`` lookup hits
    both variants (``search_in_frames`` matches ``{u, u.split('#')[0]}``)."""
    from urllib.parse import unquote_plus

    out: dict[str, list[str]] = {}

    def real_urls(fr: dict):
        u = fr.get("url")
        if u and not _local_only(u):
            yield unquote_plus(u)
        else:
            for c in fr.get("children") or []:
                if isinstance(c, dict):
                    yield from real_urls(c)

    def walk(fr: dict) -> None:
        if not isinstance(fr, dict):
            return
        kids = [c for c in (fr.get("children") or []) if isinstance(c, dict)]
        if fr.get("url") and kids:
            u = unquote_plus(fr["url"])
            found = [ru for c in kids for ru in real_urls(c)]
            for key in {u, u.split("#", 1)[0]}:
                out.setdefault(key, []).extend(found)
        for c in kids:
            walk(c)

    walk(frames)
    return out


def har_entries_to_spans(entries: list[dict],
                         frames_map: dict[str, list[str]] | None = None
                         ) -> list[dict]:
    """HAR entries → span structs (offset = startedDateTime sort rank)."""
    from urllib.parse import unquote_plus

    entries = sorted(entries, key=lambda e: e.get("startedDateTime", ""))
    spans = []
    for off, e in enumerate(entries):
        req = e.get("request", {}) or {}
        resp = e.get("response", {}) or {}
        url = req.get("url", "") or ""
        parts = []
        status = resp.get("status", 0)
        if status != 200:
            parts.append(f"@status={status}")
        rurl = resp.get("redirectURL") or ""
        if rurl:
            parts.append(f"@redirect={_tok(rurl)}")
        ref = _header(req.get("headers"), "referer")
        if ref:
            parts.append(f"@referer={_tok(ref)}")
        if off == 0:
            ua = _header(req.get("headers"), "user-agent")
            if ua:
                parts.append(f"@ua={_tok(ua)}")
        ini = _initiator_url(e)
        if ini:
            parts.append(f"@initiator={_tok(ini)}")
        if frames_map:
            # J4 frame evidence: this entry's URL names a frame with
            # children → its children's real URLs become @frame= targets
            # (reference search_in_frames, har2tree.py:865-877; matched on
            # the unquoted URL and its fragment-stripped variant)
            uq = unquote_plus(url)
            seen_fu: set[str] = set()
            for key in {uq, uq.split("#", 1)[0]}:
                for fu in frames_map.get(key, ()):
                    if fu not in seen_fu:
                        seen_fu.add(fu)
                        parts.append(f"@frame={_tok(fu)}")
        if e.get("time") is not None:
            parts.append(f"@dur={max(0, int(e['time']))}")
        sent = _header(req.get("headers"), "cookie")
        if sent:
            for kv in sent.split(";"):
                kv = kv.strip()
                if "=" in kv:
                    n, v = kv.split("=", 1)
                    if n:
                        parts.append(f"@cookie={_tok(n)}={_tok(v) or '-'}")
        for h in resp.get("headers") or []:
            if h.get("name", "").lower() != "set-cookie":
                continue
            for line in (h.get("value") or "").split("\n"):
                seg = line.split(";")
                if "=" not in seg[0]:
                    continue
                n, v = seg[0].strip().split("=", 1)
                dom = ""
                for attr in seg[1:]:
                    a = attr.strip()
                    if a.lower().startswith("domain="):
                        dom = a.split("=", 1)[1].lstrip(".")
                host = url.split("://", 1)[-1].split("/", 1)[0].split(":")[0]
                if n:
                    parts.append(
                        f"@setcookie={_tok(n)}={_tok(v) or '-'}@{_tok(dom or host)}")
        post = req.get("postData") or {}
        if post.get("text") is not None:
            mime = _tok(post.get("mimeType") or "")
            b64 = base64.b64encode(post["text"].encode("utf-8", "replace")).decode()
            parts.append(f"@post={mime or 'text/plain'}:{b64}")
        mime = (resp.get("content") or {}).get("mimeType", "")
        body = (resp.get("content") or {}).get("text") or ""
        if (resp.get("content") or {}).get("encoding") == "base64":
            # M32: charset-normalized decode (BOM → strict utf-8 → meta/xml
            # declaration → Content-Type charset → latin-1), mirroring the
            # reference's charset_normalizer pass (helper.py:283-294) with a
            # deterministic stdlib chain — see functions/charset.py.
            declared = (charset_from_content_type(mime)
                        or charset_from_content_type(
                            _header(resp.get("headers"), "content-type")))
            try:
                body = decode_body(base64.b64decode(body), declared)
            except Exception:
                body = ""
        text = " ".join(parts)
        if body and _kind(mime, url) in ("document", "script", "css"):
            # body markup is appended for the M19/M31 extraction regexes but
            # defanged first: page content must not forge engine directives
            safe_body = _defang(body[:_BODY_CAP])
            text = (text + " " + safe_body) if text else safe_body
        spans.append({"kind": _kind(mime, url), "text": text,
                      "media_ref": url, "offset": off})
    return spans


def _sidecar_stem(path: str) -> str:
    """``x.har`` / ``x.har.gz`` → the ``x`` every sidecar file is keyed on
    (reference root_name, har2tree.py:121-124)."""
    stem = path[:-3] if path.endswith(".gz") else path
    return stem[:-4] if stem.endswith(".har") else stem


def load_sidecars(path: str) -> dict:
    """S2: the per-capture companion files of a HAR
    (har2tree.py:127-179) → interleaved-row columns + the frames map.

    * ``<stem>.frames.json``       → frames_map for ``@frame=`` directives
    * ``<stem>.last_redirect.txt`` → ``last_redirect`` (unquote_plus'd)
    * ``<stem>.html``              → ``rendered_html``
    * ``<stem>.data`` + ``.data.filename`` → downloaded blob columns
    * ``<stem>.cookies.json``      → ``cookies_json`` raw JSON array
      (the final browser cookie jar — har2tree.py:142-148)
    """
    from urllib.parse import unquote_plus

    stem = _sidecar_stem(path)
    out: dict = {"downloaded_filename": None, "downloaded_b64": None,
                 "rendered_html": None, "last_redirect": None,
                 "cookies_json": None, "frames_map": None}
    ck = stem + ".cookies.json"
    if os.path.isfile(ck):
        try:
            with open(ck, encoding="utf-8", errors="replace") as f:
                raw = f.read()
            if isinstance(json.loads(raw), list):  # jar must be an array
                out["cookies_json"] = raw
        except (OSError, json.JSONDecodeError):
            pass
    fp = stem + ".frames.json"
    if os.path.isfile(fp):
        try:
            with open(fp, encoding="utf-8", errors="replace") as f:
                out["frames_map"] = flatten_frames(json.load(f)) or None
        except (OSError, json.JSONDecodeError):
            pass
    lr = stem + ".last_redirect.txt"
    if os.path.isfile(lr):
        try:
            with open(lr, encoding="utf-8", errors="replace") as f:
                out["last_redirect"] = unquote_plus(f.read())
        except OSError:
            pass
    html = stem + ".html"
    if os.path.isfile(html):
        try:
            with open(html, "rb") as f:
                out["rendered_html"] = f.read().decode("utf-8", "replace")
        except OSError:
            pass
    data, datafn = stem + ".data", stem + ".data.filename"
    if os.path.isfile(data) and os.path.isfile(datafn):
        try:
            with open(datafn, encoding="utf-8", errors="replace") as f:
                out["downloaded_filename"] = f.read()
            with open(data, "rb") as f:
                out["downloaded_b64"] = base64.b64encode(f.read()).decode()
        except OSError:
            out["downloaded_filename"] = out["downloaded_b64"] = None
    return out


def har_file_to_row(path: str, doc_id: str) -> dict | None:
    """One HAR file (+ sidecars) → one interleaved row; ``None`` for
    unreadable files (the reference's capture loader logs and skips broken
    members rather than failing the whole capture — parser.py:30-41)."""
    import logging

    opener = gzip.open if path.endswith(".gz") else open
    try:
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            h = json.load(f)
        entries = (h.get("log") or {}).get("entries") or []
        side = load_sidecars(path)
        spans = har_entries_to_spans(entries, side.pop("frames_map"))
    except (OSError, json.JSONDecodeError, AttributeError, TypeError) as e:
        logging.getLogger("har2tree_ray.har").warning(
            "skipping unreadable HAR %s: %s", path, e)
        return None
    return {"doc_id": doc_id, "spans": spans, **side}


def read_har_dir(dir_path: str, capture_id: str | None = None,
                 batch_size: int = 4) -> rd.Dataset:
    """All ``*.har`` / ``*.har.gz`` under a directory → interleaved Dataset.

    One document per file, ``doc_id = <capture>.<file index>`` (sorted file
    order — the CrawledTree multi-HAR convention, parser.py:30-41).  Paths
    fan out as items so the JSON parse runs distributed."""
    cap = capture_id or os.path.basename(os.path.normpath(dir_path))
    paths = sorted(glob.glob(os.path.join(dir_path, "*.har"))
                   + glob.glob(os.path.join(dir_path, "*.har.gz")))
    items = [{"path": p, "doc_id": f"{cap}.{i}"} for i, p in enumerate(paths)]
    if not items:
        return rd.from_arrow(pa.Table.from_pylist([], schema=INTERLEAVED_SCHEMA))

    def load(batch: dict) -> pa.Table:
        rows = [har_file_to_row(p, d)
                for p, d in zip(batch["path"], batch["doc_id"])]
        return pa.Table.from_pylist([r for r in rows if r is not None],
                                    schema=INTERLEAVED_SCHEMA)

    return rd.from_items(items).map_batches(
        load, batch_format="numpy", batch_size=batch_size)
