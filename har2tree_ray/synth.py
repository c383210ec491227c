"""Deterministic synthesizer for the interleaved text+media document table.

The engine's primary input (BASELINE.json ``input_hint``) is::

    doc_id: string
    spans:  list<struct<kind, text, media_ref, offset:int32>>

No external data exists in this sandbox, so this module generates it —
seeded, capture-by-capture, reproducible regardless of partitioning (every
capture derives its own RandomState from ``seed ^ capture_index``).  The
generated corpus mirrors the reference test-capture semantics
(/root/reference/tests/, FIXTURES.md §1-3):

* documents grouped into *captures* of 1-4 docs; non-first docs carry a root
  ``@referer`` pointing at the first doc's landing URL (drives the
  CrawledTree graft, J9 — /root/reference/har2tree/parser.py:43-72);
* an initial HTTP-redirect chain (``@redirect=``, J1/J11);
* attach evidence channels: ``@initiator=`` (J2), ``@referer=`` exact and
  fragment-bearing (J3), ``@frame=`` (J4), embedded ``src=``/``href=``/
  ``url()`` refs in the parent's text (J5/M19), JS ``location.href`` (M22)
  and ``@meta_refresh=`` (M23);
* status-0 retry duplicates (D1 — har2tree/har2tree.py:575-607);
* orphans with partial/unknown referers (fallback cascade J6);
* ``data:`` URIs (embedded blobs, M19), odd schemes and relative refs
  (M5/M20 edge cases);
* ``@geo=lat,lng`` on every span — the deterministic span coordinate of the
  north rule's H3/S2 recast (6-decimal text so engine and SQL oracle parse
  bit-identical doubles);
* Zipf-distributed host pool (hot-host skew for salting tests);
* span list stored in a deterministically *shuffled* physical order —
  ``offset`` is the logical order key and every consumer must re-sort
  (reference entry sort, har2tree/har2tree.py:181-183).

Span counts are mostly 5-60 with a ~1% heavy tail up to ~615 (the largest
lalibre doc — BASELINE.md).
"""

from __future__ import annotations

import base64
import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import INTERLEAVED_SCHEMA

SYNTH_VERSION = 19  # bump to invalidate /tmp caches when generation changes

_GTAG_ALPHABET = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"))

# ---------------------------------------------------------------- host pool

_N_HOSTS = 200
_PUNYCODE = ["xn--caf-dma", "xn--mnchen-3ya", "xn--bcher-kva", "xn--nxasmq6b", "xn--wgv71a"]


# hosts 170-184 exercise the PSL paths of split_suffix (M28): multi-level
# exact suffixes, private-section suffixes, the *.ck / *.kawasaki.jp
# wildcards and their !www.ck / !city.kawasaki.jp exceptions
_PSL_HOSTS = ["shop.co.uk", "a.b.com.cn", "cdn.co.za", "user{i}.github.io",
              "h{i}.com.au", "blog{i}.blogspot.com", "x.co.jp", "h{i}.co.in",
              "s{i}.foo.ck", "www.ck", "h{i}.x.kawasaki.jp",
              "city.kawasaki.jp", "h{i}.org.uk", "h{i}.com.br", "co.uk"]


def _host(idx: int) -> str:
    if idx < 170:
        return f"h{idx}.example{idx % 10}.com"
    if idx < 185:
        return _PSL_HOSTS[idx - 170].format(i=idx)
    if idx < 190:
        return f"h{idx}.example.com:8080"
    if idx < 195:
        i = idx - 190
        return f"10.{i}.{i}.{i + 1}"
    return f"{_PUNYCODE[idx - 195]}.example.com"


HOSTS = [_host(i) for i in range(_N_HOSTS)]
# Zipf-ish sampling weights: p ∝ 1/(rank+1)^1.1 — a few hot hosts dominate.
_W = 1.0 / np.power(np.arange(1, _N_HOSTS + 1), 1.1)
HOST_P = _W / _W.sum()

_EXT = {"document": "html", "script": "js", "css": "css", "img": "png",
        "media": "mp4", "iframe": "html", "font": "woff2"}
_KINDS = ["script", "css", "img", "iframe", "media", "font", "document"]
_VOCAB = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
          "mike november oscar papa quebec romeo sierra tango uniform victor").split()


def _geo(host_idx: int, offset: int) -> tuple[float, float]:
    """Deterministic span coordinate: host centroid + per-offset jitter."""
    lat_c = -60.0 + (host_idx * 37) % 120
    lng_c = -180.0 + (host_idx * 73) % 360
    jlat = ((offset * 13) % 21 - 10) * 0.013
    jlng = ((offset * 29) % 21 - 10) * 0.017
    return round(lat_c + jlat, 6), round(lng_c + jlng, 6)


def _url(rs: np.random.RandomState, kind: str, host_idx: int, n: int) -> str:
    host = HOSTS[host_idx]
    scheme = "https" if rs.random_sample() < 0.85 else "http"
    depth = rs.randint(1, 4)
    path = "/".join(f"p{rs.randint(0, 50)}" for _ in range(depth))
    url = f"{scheme}://{host}/{path}/r{n}.{_EXT[kind]}"
    if rs.random_sample() < 0.2:
        url += f"?q={rs.randint(0, 1000)}"
    return url


def generate_capture(cap_idx: int, seed: int = 42) -> list[dict]:
    """Generate one capture (1-4 docs) → list of
    {doc_id, spans, downloaded_filename, downloaded_b64, rendered_html} rows."""
    rs = np.random.RandomState((seed * 1_000_003 + cap_idx) % (2**31 - 1))
    n_docs = 1 + rs.randint(0, 4)
    rows = []
    landing_url = None
    for j in range(n_docs):
        doc_id = f"cap{cap_idx:07d}.{j}"
        spans, landing, extra = _generate_doc(rs, doc_id, root_referer=landing_url if j else None)
        if j == 0:
            landing_url = landing
        rows.append({"doc_id": doc_id, "spans": spans, **extra})
    return rows


# downloaded-blob magic prefixes (public file signatures) — drives the M18
# mimetype sniff; the last entry is a random unknown payload
_MAGIC_PREFIXES = [
    (b"%PDF-", "pdf"),
    (b"PK\x03\x04", "zip"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF89a", "gif"),
    (b"\xff\xd8\xff", "jpg"),
    (b"\x1f\x8b", "gz"),
    (b"RIFF\x24\x00\x00\x00WEBP", "webp"),
    (b"\x00\x00\x00\x20ftypisom", "mp4"),
    (b"OggS", "ogg"),
    (b"wOF2", "woff2"),
    (b"\x00\x00\x01\x00", "ico"),
    (b"II*\x00", "tif"),
    (b"\x1aE\xdf\xa3", "webm"),
    (b"BM", "bmp"),
    (b"SQLite format 3\x00", "db"),
    (b"MThd", "mid"),
    (b"PAR1", "parquet"),
    (b"\xca\xfe\xba\xbe", "class"),
    (b"CWS", "swf"),
    (b"\x00\x00\x00\x20ftypavif", "avif"),
    (b"\x00" * 257 + b"ustar", "tar"),   # offset-257 signature
    (b"\x00" * 128 + b"DICM", "dcm"),    # offset-128 signature
    (b"", "bin"),
]


def _gen_post(rs: np.random.RandomState) -> str:
    """One ``mime:b64`` POST payload (M12 decode fixture).  JSON bodies are
    written in the canonical form ``json.dumps(sort_keys, separators)`` the
    decoder re-emits, so decode→re-encode round-trips byte-identical."""
    r = rs.random_sample()
    if r < 0.3:
        n = int(rs.randint(1, 4))
        pairs = []
        for i in range(n):
            rv = rs.random_sample()
            if rv < 0.15:       # '+' decodes to space on both sides
                pairs.append(f"k{i}=v+{int(rs.randint(0, 99))}")
            elif rv < 0.3:      # '=' inside value: remainder after FIRST '='
                pairs.append(f"k{i}=v={int(rs.randint(0, 99))}")
            elif rv < 0.4:      # bare key, no '=' → empty value
                pairs.append(f"flag{i}")
            else:
                pairs.append(f"k{i}=v{int(rs.randint(0, 99))}")
        raw = "&".join(pairs).encode()
        mime = "application/x-www-form-urlencoded"
    elif r < 0.55:
        n = int(rs.randint(1, 4))
        obj = {f"k{i}": (int(rs.randint(0, 999)) if rs.random_sample() < 0.5
                         else f"s{int(rs.randint(0, 99))}") for i in range(n)}
        raw = json.dumps(obj, sort_keys=True, separators=(",", ":")).encode()
        mime = "application/json"
    elif r < 0.7:
        raw = " ".join(_VOCAB[int(k)]
                       for k in rs.randint(0, len(_VOCAB), size=4)).encode()
        mime = "text/plain"
    elif r < 0.8:
        # NDJSON stream: one canonical JSON object per line (M12
        # x-json-stream branch)
        n = int(rs.randint(1, 4))
        lines = [json.dumps({"ev": f"e{int(rs.randint(0, 9))}",
                             "n": int(rs.randint(0, 99))},
                            sort_keys=True, separators=(",", ":"))
                 for _ in range(n)]
        raw = "\n".join(lines).encode()
        mime = "application/x-json-stream"
    elif r < 0.9:
        # multipart/form-data with 1-2 parts (M12 multipart branch)
        n = int(rs.randint(1, 3))
        segs = []
        for i in range(n):
            segs.append(f'--bnd1\r\nContent-Disposition: form-data; '
                        f'name="f{i}"\r\n\r\nv{int(rs.randint(0, 99))}\r\n')
        raw = ("".join(segs) + "--bnd1--\r\n").encode()
        mime = "multipart/form-data;boundary=bnd1"
    elif r < 0.95:
        rv = rs.random_sample()
        if rv < 0.6:
            # atom+xml / amazon-ion carrying a JSON blob (M12 exotic
            # branches, nodes.py:363-377,418-432) — canonical-form JSON so
            # decode → re-encode round-trips byte-identical for the oracle
            obj = {f"a{i}": int(rs.randint(0, 99))
                   for i in range(int(rs.randint(1, 3)))}
            raw = json.dumps(obj, sort_keys=True,
                             separators=(",", ":")).encode()
            mime = ("application/atom+xml" if rv < 0.3
                    else "application/x-amzn-ion")
        else:
            # REAL text Ion beyond the JSON subset: annotation + symbol +
            # timestamp fields (decode_ion_text full-fidelity branch; the
            # oracle rebuilds the $ion_* sentinel JSON with regexps)
            k = int(rs.randint(0, 9))
            n = int(rs.randint(0, 99))
            mo, dy, hh = (int(rs.randint(1, 13)), int(rs.randint(1, 29)),
                          int(rs.randint(0, 24)))
            raw = (f"evt::{{kind:click_{k},n:{n},"
                   f"ts:2026-{mo:02d}-{dy:02d}T{hh:02d}:00:00Z}}").encode()
            mime = "application/x-amzn-ion"
    else:
        # \xff\xfe prefix guarantees invalid UTF-8 → the raw-bytes branch
        raw = b"\xff\xfe" + bytes(
            rs.randint(0, 256, size=10, dtype=np.int32).astype(np.uint8))
        mime = "application/octet-stream"
    return f"{mime}:{base64.b64encode(raw).decode()}"


def _generate_doc(rs: np.random.RandomState, doc_id: str, root_referer: str | None):
    """Two-pass generation: structure (urls, parents, channels) then text."""
    if rs.random_sample() < 0.01:
        n_res = int(rs.randint(100, 616))
    else:
        n_res = int(rs.randint(4, 60))
    n_redir = int(rs.randint(0, 4)) if rs.random_sample() < 0.5 else 0

    serial = [0]

    def next_url(kind, host_idx):
        serial[0] += 1
        return _url(rs, kind, host_idx, serial[0])

    spans: list[dict] = []  # structure records

    def add(kind, url, host_idx, **feat):
        spans.append({"kind": kind, "url": url, "host_idx": host_idx,
                      "status": 200, "refs": [], "directives": [], **feat})
        return len(spans) - 1

    root_host = int(rs.choice(_N_HOSTS, p=HOST_P))
    # initial redirect chain: root → ... → landing document (J11/J1)
    prev = add("document", next_url("document", root_host), root_host)
    if root_referer:
        spans[prev]["directives"].append(f"@referer={root_referer}")
    for _ in range(n_redir):
        # same-host hop 30% of the time so path-absolute targets (below)
        # actually resolve against the current origin
        if rs.random_sample() < 0.3:
            h = spans[prev]["host_idx"]
        else:
            h = int(rs.choice(_N_HOSTS, p=HOST_P))
        u = next_url("document", h)
        target = u
        # M21: ~35% of same-host redirect targets are emitted path-absolute
        # ('/p1/p2/r.html'); every consumer (cascade, chain walk, SQL
        # oracle) must rebuild them against the redirecting span's origin
        if h == spans[prev]["host_idx"] and rs.random_sample() < 0.35:
            target = "/" + u.split("://", 1)[1].split("/", 1)[1]
        spans[prev]["directives"].append(f"@redirect={target}")
        spans[prev]["status"] = 301 if rs.random_sample() < 0.8 else 302
        prev = add("document", u, h)
    landing = spans[prev]["url"]

    containers = [prev]  # spans that can parent others (document/script/iframe)
    for _ in range(n_res):
        kind = _KINDS[int(rs.choice(len(_KINDS), p=[0.25, 0.1, 0.3, 0.07, 0.08, 0.05, 0.15]))]
        h = int(rs.choice(_N_HOSTS, p=HOST_P))
        u = next_url(kind, h)
        parent = int(containers[rs.randint(0, len(containers))])
        channel = rs.random_sample()
        idx = add(kind, u, h)
        if channel < 0.24:  # embedded resource in parent's text (J5)
            tag = {"script": "src", "img": "src", "media": "src", "iframe": "src",
                   "css": "href", "font": "cssurl", "document": "href"}[kind]
            spans[parent]["refs"].append((tag, u))
        elif channel < 0.27:  # M19 srcset candidate list (one live URL + one
            # dangling descriptor-bearing candidate — parse must split both)
            spans[parent]["refs"].append(("srcset", u))
        elif channel < 0.30:  # M19 poster/longdesc/data resource attr
            spans[parent]["refs"].append(("attr", u))
        elif channel < 0.45:  # initiator (J2)
            spans[idx]["directives"].append(f"@initiator={spans[parent]['url']}")
        elif channel < 0.60:  # referer exact (J3)
            spans[idx]["directives"].append(f"@referer={spans[parent]['url']}")
        elif channel < 0.68:  # referer with fragment → nofrag rule (J3b)
            spans[idx]["directives"].append(f"@referer={spans[parent]['url']}#frag{rs.randint(0, 9)}")
        elif channel < 0.74 and spans[parent]["kind"] in ("document", "iframe"):
            spans[parent]["directives"].append(f"@frame={u}")  # frame join (J4)
        elif channel < 0.78:  # JS location redirect evidence (M22)
            spans[parent]["refs"].append(("jsloc", u))
        elif channel < 0.80:  # M19 CSS @import string form
            spans[parent]["refs"].append(("cssimport", u))
        elif channel < 0.84:  # meta refresh (M23) — absolute, scheme-relative
            # or path-absolute target; the relative forms only attach when the
            # rebuilt URL (parent's scheme/origin) matches, else the span
            # becomes a fallback orphan (realistic cross-origin miss).
            # Absolute targets split between the @meta_refresh directive and
            # the raw meta-refresh HTML tag (M19/M23 tag channel).
            r2 = rs.random_sample()
            if r2 < 0.5:
                if rs.random_sample() < 0.5:
                    spans[parent]["refs"].append(("metatag", u))
                else:
                    spans[parent]["directives"].append(f"@meta_refresh={u}")
            elif r2 < 0.8:
                spans[parent]["directives"].append(
                    "@meta_refresh=//" + u.split("://", 1)[1])
            else:
                spans[parent]["directives"].append(
                    "@meta_refresh=/" + u.split("://", 1)[1].split("/", 1)[1])
        elif channel < 0.87:  # M19 HTML-escaped markup (&quot;-escaped src)
            spans[parent]["refs"].append(("escsrc", u))
        elif channel < 0.89:  # M19 full-text URL fallback: bare URL in body
            spans[parent]["refs"].append(("fulltext", u))
        elif channel < 0.95:  # orphan with partial referer → hostname fallback (J6)
            spans[idx]["directives"].append(
                f"@referer=https://{HOSTS[spans[parent]['host_idx']]}/unknown{rs.randint(0, 999)}.html")
        # else: fully orphan → fallback_root
        # status-0 retry duplicate (D1): insert a dead attempt before the
        # real span (same URL, status 0); all container indices precede idx
        # so the insert shifts no recorded parent.
        if rs.random_sample() < 0.04:
            dead = dict(spans[idx])
            dead.update(status=0, refs=[], directives=list(spans[idx]["directives"]))
            spans.insert(idx, dead)
            idx += 1
        if kind in ("document", "script", "iframe"):
            containers.append(idx)
    # a couple of odd-scheme / relative spans (M5/M20 edge cases; orphans)
    for _ in range(int(rs.randint(0, 3))):
        pick = rs.random_sample()
        if pick < 0.3:
            u = f"blob:https://{HOSTS[root_host]}/{rs.randint(0, 10**6)}"
        elif pick < 0.5:
            u = f"file:///tmp/f{rs.randint(0, 100)}.bin"
        elif pick < 0.75:
            u = f"rel/path{rs.randint(0, 100)}.js"
        else:
            u = f"https://{HOSTS[int(rs.randint(0, _N_HOSTS))]}/a%20b/c+d/e{rs.randint(0, 100)}.html%3Fx"
        add("media", u, root_host)
    # cookies (J7 as-of recast): setters on early spans, senders later
    jar_recv: list[tuple[str, str, str]] = []  # @setcookie → received set
    jar_initial: list[tuple[str, str]] = []    # root-span @cookie (initial set)
    if rs.random_sample() < 0.5 and len(spans) > 3:
        dom = HOSTS[spans[0]["host_idx"]].split(":")[0]
        name = f"ck{rs.randint(0, 5)}"
        val = f"v{rs.randint(0, 9)}"
        spans[rs.randint(0, len(spans) // 2)]["directives"].append(f"@setcookie={name}={val}@{dom}")
        jar_recv.append((name, val, dom))
        # ~30% of set cookies are never sent (drives the D4 anti-join)
        if rs.random_sample() < 0.7:
            spans[rs.randint(len(spans) // 2, len(spans))]["directives"].append(f"@cookie={name}=sent")
    # <stem>.cookies.json recast (D4 set algebra fixtures — reference
    # har2tree.py:142-148,344-387): initial cookies are the ROOT span's
    # @cookie directives (nodes_list[0].cookies_sent, har2tree.py:344-346);
    # the final jar mixes received cookies, the initial set, and
    # locally-created ones — some later sent, some never.
    root_dom = HOSTS[spans[0]["host_idx"]].split(":")[0]
    if rs.random_sample() < 0.3:
        name, val = f"init{int(rs.randint(0, 9))}", f"i{int(rs.randint(0, 9))}"
        spans[0]["directives"].append(f"@cookie={name}={val}")
        jar_initial.append((name, val))
    cookies_json: str | None = None
    if rs.random_sample() < 0.6:
        jar: list[dict] = []
        for name, val, dom in jar_recv:
            if rs.random_sample() < 0.8:  # received cookie survives to jar
                jar.append({"name": name, "value": val, "domain": dom})
        for name, val in jar_initial:
            jar.append({"name": name, "value": val, "domain": root_dom})
        for k in range(int(rs.randint(0, 3))):
            # locally created: in the jar, never in a @setcookie; ~40%
            # sent later anyway (drops out of locally_created_not_sent,
            # har2tree.py:373-377); suffix k keeps identifiers distinct
            name = f"loc{int(rs.randint(0, 9))}{k}"
            val = f"w{int(rs.randint(0, 9))}"
            jar.append({"name": name, "value": val, "domain": root_dom})
            if rs.random_sample() < 0.4 and len(spans) > 2:
                spans[int(rs.randint(1, len(spans)))]["directives"].append(
                    f"@cookie={name}={val}")
        if jar:
            cookies_json = json.dumps(jar, sort_keys=True,
                                      separators=(",", ":"))

    # boilerplate spans: identical text served from different URLs across
    # docs (same library on a CDN) — drives exact content dedup (A2/D3,
    # har2tree/har2tree.py:550-569).  Geo pinned to the host centroid
    # (offset 0) so the rendered text is byte-identical everywhere.
    boilerplate = {i for i, s in enumerate(spans)
                   if s["kind"] in ("script", "css") and not s["refs"]
                   and not s["directives"] and s["status"] == 200
                   and rs.random_sample() < 0.25}

    # -------- pass 2: render text, assign offsets, shuffle physical order
    ua = f"UA/{int(rs.randint(0, 6))}.0-gecko"  # M11 capture user agent
    out = []
    for off, s in enumerate(spans):
        if off in boilerplate:
            lat, lng = _geo(s["host_idx"], 0)
            text = (f"@geo={lat:.6f},{lng:.6f} "
                    f"LIBRARY-{s['host_idx']}-{s['kind']}-BOILERPLATE v1")
            out.append({"kind": s["kind"], "text": text,
                        "media_ref": s["url"], "offset": off})
            continue
        lat, lng = _geo(s["host_idx"], off)
        parts = [f"@geo={lat:.6f},{lng:.6f}"]
        # M16: ~3% of directive-free non-root spans render an empty body
        # (text is the bare geo token — the empty_response flag's fixture)
        if (off != 0 and not s["directives"] and not s["refs"]
                and s["status"] == 200 and rs.random_sample() < 0.03):
            out.append({"kind": s["kind"], "text": parts[0],
                        "media_ref": s["url"], "offset": off})
            continue
        if off == 0:
            parts.append(f"@ua={ua}")
        if s["status"] != 200:
            parts.append(f"@status={s['status']}")
        parts.extend(s["directives"])
        for tag, u in s["refs"]:
            if tag == "src":
                parts.append(f'src="{u}"')
            elif tag == "href":
                parts.append(f'href="{u}"')
            elif tag == "cssurl":
                parts.append(f"url({u})")
            elif tag == "jsloc":
                parts.append(f"location.href='{u}'")
            elif tag == "srcset":
                # live candidate + dangling 1x candidate; descriptor variety
                # pinned by the URL length so generation stays deterministic
                dangle = f"https://cdn-alt.example/v{len(u) % 7}.webp"
                parts.append(f'srcset="{dangle} 1x, {u} {len(u) % 3 + 1}x"'
                             if len(u) % 2 else f'srcset="{u} 2x"')
            elif tag == "attr":
                name = ("poster", "longdesc", "data")[len(u) % 3]
                parts.append(f'{name}="{u}"')
            elif tag == "cssimport":
                parts.append(f'@import "{u}"')
            elif tag == "metatag":
                parts.append(
                    f'<meta http-equiv="refresh" content="{len(u) % 9};url={u}">')
            elif tag == "escsrc":
                parts.append(f"src=&quot;{u}&quot;")
            elif tag == "fulltext":
                parts.append(u)
        if rs.random_sample() < 0.05:
            blob = base64.b64encode(bytes(rs.randint(0, 256, size=12, dtype=np.int32).astype(np.uint8)))
            # Sometimes truncate the b64 (len%4 ∈ {1,2,3}): len%4==1 is
            # undecodable even after padding repair (both engine repair_b64
            # and the embedded_blobs oracle must drop it); 2/3 decode after
            # '=' padding on both sides.
            cut = int(rs.randint(0, 4)) if rs.random_sample() < 0.3 else 0
            b64 = blob.decode()[: len(blob) - cut]
            parts.append(f"data:application/octet-stream;base64,{b64}")
        # identifiers (M30): captcha sitekeys + google tag IDs, including
        # blocklisted placeholders the extractor must reject
        if s["kind"] == "document":
            r_id = rs.random_sample()
            if r_id < 0.06:
                key = "".join(_GTAG_ALPHABET[rs.randint(0, 36, size=10)])
                parts.append(f'data-sitekey="6L{key}"')
            elif r_id < 0.12:
                tag = "".join(_GTAG_ALPHABET[rs.randint(0, 36, size=7)])
                prefix = "G-" if rs.random_sample() < 0.7 else "GTM-"
                parts.append(f"gtag {prefix}{tag}")
            elif r_id < 0.15:
                parts.append("gtag G-12345678")  # blocklisted placeholder
        # M8 entry duration
        if rs.random_sample() < 0.9:
            parts.append(f"@dur={int(rs.randint(1, 2000))}")
        # M26 security details on https document spans
        if (s["kind"] == "document" and s["url"].startswith("https://")
                and rs.random_sample() < 0.3):
            proto = "TLSv1.3" if rs.random_sample() < 0.7 else "TLSv1.2"
            issuer = ["LetsEncrypt", "DigiCert", "GTS", "SelfSigned"][int(rs.randint(0, 4))]
            parts.append(f"@tls={proto}@{issuer}")
        # M12 posted data (one POST body per span at most)
        if rs.random_sample() < 0.06:
            parts.append("@post=" + _gen_post(rs))
        n_filler = int(rs.randint(3, 40))
        parts.extend(_VOCAB[int(k)] for k in rs.randint(0, len(_VOCAB), size=n_filler))
        out.append({"kind": s["kind"], "text": " ".join(parts),
                    "media_ref": s["url"], "offset": off})
    # S2 sidecars: downloaded blob (magic-prefixed — M18 sniff fixture) and
    # rendered HTML, as nullable doc columns
    extra = {"downloaded_filename": None, "downloaded_b64": None,
             "rendered_html": None, "last_redirect": None,
             "cookies_json": cookies_json}
    # <stem>.last_redirect.txt recast: the address-bar URL, exercising every
    # branch of the reference's progressive search (har2tree.py:198-222) —
    # exact, fragment-bearing (strip '#'), query-stripped ('?'-prefix
    # upgrade), failed capture (chrome-error), and unresolvable.
    r_lr = rs.random_sample()
    if r_lr < 0.35:
        extra["last_redirect"] = landing
    elif r_lr < 0.50:
        extra["last_redirect"] = f"{landing}#frag{int(rs.randint(0, 9))}"
    elif r_lr < 0.62:
        extra["last_redirect"] = landing.split("?", 1)[0]
    elif r_lr < 0.68:
        extra["last_redirect"] = "chrome-error://chromewebdata/"
    elif r_lr < 0.73:
        extra["last_redirect"] = "https://gone.example/vanished.html"
    if rs.random_sample() < 0.12:
        magic, ext = _MAGIC_PREFIXES[int(rs.randint(0, len(_MAGIC_PREFIXES)))]
        payload = magic + bytes(
            rs.randint(0, 256, size=int(rs.randint(8, 64)),
                       dtype=np.int32).astype(np.uint8))
        extra["downloaded_filename"] = f"dl{int(rs.randint(0, 1000))}.{ext}"
        extra["downloaded_b64"] = base64.b64encode(payload).decode()
    if rs.random_sample() < 0.5:
        # M31 canonicalization fixtures: beside the plain landing href, the
        # rendered page carries messy-but-escape-free URL spellings — each
        # exercising one rule of the reference's sanitize chain
        # (strip_html5_whitespace → safe_url_string → urljoin →
        # canonicalize_url, nodes.py:663-673).  Escape-free by construction:
        # percent-normalization is covered by pure-function pytests; the SQL
        # oracle re-expresses only the transforms this vocabulary needs.
        root_url = out[0]["media_ref"]
        scheme, rest = root_url.split("://", 1)
        host = rest.split("/", 1)[0]
        n = int(rs.randint(0, 100))
        messy = [
            f"HTTPS://{host.upper()}/Mixed/Case{n}?b=2&a=1",  # case + query sort
            # default port (dropped by canonicalization) — on the BARE host:
            # appending ':443' to a host that already carries a port would
            # produce an invalid 'host:8080:443' authority
            f"{scheme}://{host.split(':')[0]}:{443 if scheme == 'https' else 80}/port{n}.html",
            f"/rooted/asset{n}.css",            # root-relative → base origin
            f"//cdn-render.example/lib{n}.js",  # scheme-relative → base scheme
            f"img/banner{n}.png",               # relative → base directory
            f"  {landing}  ",                   # HTML5 whitespace padding
            f"{landing}#sec{n}",                # fragment kept (reference mode)
            "https://plain.example",            # empty path → '/'
            "mailto:contact@site.example",      # no netloc → dropped
        ]
        picks = sorted(int(i) for i in
                       rs.choice(len(messy), size=int(rs.randint(2, 6)),
                                 replace=False))
        anchors = " ".join(f'<a href="{messy[i]}">m{i}</a>' for i in picks)
        extra["rendered_html"] = (
            f'<html><body><a href="{landing}">home</a> {anchors} '
            f"{len(out)} spans</body></html>")
    perm = rs.permutation(len(out))
    return [out[int(i)] for i in perm], landing, extra


# ------------------------------------------------------------- batch + write

def capture_batch_table(cap_indices: np.ndarray, seed: int = 42) -> pa.Table:
    """Vector entry point for Ray: capture indices → interleaved Arrow table."""
    rows: list[dict] = []
    for c in cap_indices:
        rows.extend(generate_capture(int(c), seed))
    return pa.Table.from_pylist(rows, schema=INTERLEAVED_SCHEMA)


# sf-dir basename → number of captures (avg ~2.5 docs/capture).
# sf0.3 is a synthetic-only tier (no driver tables) used by the scaling
# benchmark: big enough that per-pipeline fixed costs amortize away.
SF_CAPTURES = {"sf0.001": 120, "sf0.01": 800, "sf0.1": 8000, "sf0.3": 24000,
               "sf0.5": 40000, "sf1.0": 80000}
CACHE_ROOT = "/tmp/graft_interleaved"


def interleaved_path(sf_name: str) -> str:
    return os.path.join(CACHE_ROOT, sf_name)


def ensure_interleaved(sf_dir: str, seed: int = 42) -> str:
    """Synthesize (once, atomically cached under /tmp) the interleaved table
    for a testdata tier; returns the parquet directory path.

    Uses a Ray Data pipeline when a Ray session exists (distributed
    generation: ``range(n_captures) → map_batches → write_parquet``), else a
    local loop — content is identical either way because every capture seeds
    its own RandomState.
    """
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n_caps = SF_CAPTURES.get(sf_name, 120)
    out_dir = interleaved_path(sf_name)
    marker = os.path.join(out_dir, "_SUCCESS.json")
    want = {"version": SYNTH_VERSION, "n_captures": n_caps, "seed": seed}
    if os.path.exists(marker):
        try:
            if json.load(open(marker)) == want:
                return out_dir
        except Exception:
            pass
    import shutil
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{sf_name}.")
    try:
        import ray
        use_ray = ray.is_initialized() and n_caps >= 500
    except Exception:
        use_ray = False
    if use_ray:
        import ray.data as rd

        def gen(batch: dict) -> pa.Table:
            return capture_batch_table(batch["id"], seed)

        (rd.range(n_caps, override_num_blocks=max(8, n_caps // 100))
         .map_batches(gen, batch_format="numpy", batch_size=64)
         .write_parquet(tmp))
    else:
        step = 200
        for lo in range(0, n_caps, step):
            t = capture_batch_table(np.arange(lo, min(lo + step, n_caps)), seed)
            pq.write_table(t, os.path.join(tmp, f"part-{lo:06d}.parquet"))
    json.dump(want, open(os.path.join(tmp, "_SUCCESS.json"), "w"))
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return out_dir


# -------------------------------------------------- scaled driver tables
#
# The driver provides documents/events parquet only up to sf0.1; the
# SYNTHETIC scaling tiers (sf0.5+) used by ``bench.py --scaling`` carry
# only the interleaved table, so the exchange-dominated table-backed
# queries (doc_jaccard_pairs, event_window_distinct) used to fall back to
# the sf0.1 tables — at that size they run in ~1 s at EVERY parallelism
# level (pure plan cost), which measures nothing and drags the suite
# ratio down.  These generators synthesize documents/events at the tier's
# own scale, matching the driver tables' measured shape (sf0.1: 5,000
# docs / 100,000 events over 30 days / 1,500 users; 31-word vocab,
# 10-100 words per doc, lang {en 41%, zh/es/fr/de ~15%}, source src0-19,
# exponential-ish event deltas and values) so per-row work and key
# cardinality scale the way the real tables do.  Scaling-bench only —
# correctness oracles always run on the driver's own parquet.

DOCS_PER_SF = 50_000
EVENTS_PER_SF = 1_000_000
USERS_PER_SF = 15_000
EVENT_WINDOW_US = 30 * 24 * 3600 * 1_000_000  # driver: ~30 days at every sf

_DOC_VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"])
_DOC_LANGS = np.array(["en", "zh", "es", "fr", "de"])
_DOC_LANG_P = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
_EVENT_TYPES = np.array(["click", "error", "purchase", "signup", "view"])


_TABLES_VERSION = 2  # near-dup cluster injection


def _gen_documents(n_docs: int, seed: int) -> pa.Table:
    rs = np.random.RandomState(seed ^ 0xD0C5)
    n_words = rs.randint(10, 101, n_docs)
    flat = _DOC_VOCAB[rs.randint(0, len(_DOC_VOCAB), int(n_words.sum()))]
    bounds = np.concatenate([[0], np.cumsum(n_words)])
    texts = [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(n_docs)]
    # Near-duplicate clusters, matching the driver tables' measured shape
    # (sf0.1: 228 clusters covering 465 of 5,000 docs ≈ 4.6%; sizes
    # {2: 220, 3: 7, 4: 1}; members are a shared base text with
    # 1..size ' dup' tokens appended → 3-gram shingle Jaccard ≈ 0.98).
    # Without these, uniform random text shares almost no shingles and
    # doc_jaccard_pairs degenerates to an empty result.
    n_clusters = int(n_docs * 0.046)
    sizes = rs.choice([2, 3, 4], n_clusters, p=[0.965, 0.031, 0.004])
    slots = rs.permutation(n_docs)[:int(sizes.sum())]
    pos = 0
    for size in sizes:
        base = texts[rs.randint(0, n_docs)]
        for j in range(1, int(size) + 1):
            texts[slots[pos]] = base + " dup" * j
            pos += 1
    langs = _DOC_LANGS[rs.choice(len(_DOC_LANGS), n_docs, p=_DOC_LANG_P)]
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in rs.randint(0, 20, n_docs)],
                           pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })


def _gen_events(n_events: int, n_users: int, seed: int) -> pa.Table:
    rs = np.random.RandomState(seed ^ 0xE7E27)
    deltas = rs.exponential(EVENT_WINDOW_US / n_events, n_events)
    ts = np.cumsum(deltas).astype(np.int64) \
        + np.int64(1704067200) * 1_000_000  # 2024-01-01 UTC
    return pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rs.randint(0, n_users, n_events).astype(np.int64)),
        "event_type": pa.array(
            _EVENT_TYPES[rs.randint(0, len(_EVENT_TYPES), n_events)],
            pa.string()),
        "value": pa.array(np.round(rs.exponential(50.0, n_events), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rs.randint(0, 100, n_events)],
                          pa.string()),
    })


def ensure_scaled_tables(sf_name: str, seed: int = 42) -> str:
    """Synthesize (once, cached under /tmp) driver-shaped documents.parquet
    and events.parquet for a synthetic scaling tier; returns the directory.
    Row-group sizes are set so Ray's parquet reader can split each file."""
    sf = float(sf_name.removeprefix("sf"))
    n_docs = int(DOCS_PER_SF * sf)
    n_events = int(EVENTS_PER_SF * sf)
    n_users = max(1, int(USERS_PER_SF * sf))
    out_dir = os.path.join(CACHE_ROOT, f"{sf_name}_tables")
    marker = os.path.join(out_dir, "_SUCCESS.json")
    want = {"version": SYNTH_VERSION, "tables_version": _TABLES_VERSION,
            "n_docs": n_docs, "n_events": n_events, "n_users": n_users,
            "seed": seed}
    if os.path.exists(marker):
        try:
            if json.load(open(marker)) == want:
                return out_dir
        except Exception:
            pass
    import shutil
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{sf_name}_tables.")
    pq.write_table(_gen_documents(n_docs, seed),
                   os.path.join(tmp, "documents.parquet"), row_group_size=5_000)
    pq.write_table(_gen_events(n_events, n_users, seed),
                   os.path.join(tmp, "events.parquet"), row_group_size=50_000)
    json.dump(want, open(os.path.join(tmp, "_SUCCESS.json"), "w"))
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return out_dir
