"""Real-HAR ingestion parity: the S1 source path over the reference's own
test corpus (/root/reference/tests/data — PUBLIC captures the reference's
tests build CrawledTrees from, tests/test.py:15-26, simple_test.py:29-50).

Invariants mirrored from the reference test strategy:
* span count per document == HAR entry count (entry sort, har2tree.py:181-183);
* the initial redirect chain follows response.redirectURL hop by hop
  (simple_test redirects assertions);
* the user agent is the first entry's request header (simple_test.py:49-50);
* the cascade on HAR-derived spans equals the independent tree oracle.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

LALIBRE = "/root/reference/tests/data/lalibre"
SINGLES = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LALIBRE), reason="reference HAR corpus not present")


def _paths():
    return sorted(glob.glob(os.path.join(LALIBRE, "*.har")))


def _entries(path):
    with open(path) as f:
        h = json.load(f)
    return sorted(h["log"]["entries"], key=lambda e: e.get("startedDateTime", ""))


def test_span_counts_match_entry_counts():
    from har2tree_ray.sources.har import read_har_dir

    df = read_har_dir(LALIBRE).to_pandas()
    paths = _paths()
    assert len(df) == len(paths) > 200
    by_id = df.set_index("doc_id")
    for i in (0, 7, len(paths) - 1):
        assert len(by_id.loc[f"lalibre.{i}", "spans"]) == len(_entries(paths[i]))


def test_span_sequence_preserved():
    """Per-row invariant: (kind inference aside) media_ref and offset follow
    the startedDateTime order of the raw entries."""
    from har2tree_ray.sources.har import har_entries_to_spans

    entries = _entries(_paths()[0])
    spans = har_entries_to_spans(entries)
    assert [s["offset"] for s in spans] == list(range(len(entries)))
    assert [s["media_ref"] for s in spans] == [e["request"]["url"] for e in entries]


def test_redirect_chain_follows_har_redirects():
    """Independently walk response.redirectURL from the first entry and
    compare with the engine's landing resolution."""
    import ray

    from har2tree_ray.pipelines.graft import landing_interleaved
    from har2tree_ray.sources.har import read_har_dir

    assert ray.is_initialized()
    out = landing_interleaved(read_har_dir(LALIBRE)).to_pandas().set_index("doc_id")
    checked = 0
    for i, p in enumerate(_paths()[:25]):
        entries = _entries(p)
        urls = [e["request"]["url"] for e in entries]
        reds = [e["response"].get("redirectURL") or "" for e in entries]
        first = {}
        for j, u in enumerate(urls):
            first.setdefault(u, j)
        chain, cur = [urls[0]], 0
        while True:
            t = reds[cur]
            if not t or t not in first or first[t] <= cur or len(chain) > 16:
                break
            cur = first[t]
            chain.append(urls[cur])
        row = out.loc[f"lalibre.{i}"]
        assert row["root_url"] == chain[0]
        assert row["landing_url"] == chain[-1]
        assert row["n_hops"] == len(chain) - 1
        checked += len(chain) > 1
    assert checked > 0, "corpus should contain at least one real redirect"


def test_user_agent_from_first_entry():
    from har2tree_ray.sources.har import read_har_dir
    from har2tree_ray.pipelines.webmeta import doc_user_agent

    entries = _entries(_paths()[0])
    ua = next(h["value"] for h in entries[0]["request"]["headers"]
              if h["name"].lower() == "user-agent")
    out = doc_user_agent(read_har_dir(LALIBRE)).to_pandas().set_index("doc_id")
    assert out.loc["lalibre.0", "user_agent"] == ua.replace(" ", "%20")


def test_cascade_parity_on_real_hars():
    """Engine cascade == independent recursive oracle on real captures."""
    from har2tree_ray.sources.har import har_entries_to_spans
    from tests.test_tree import _edges
    from tests.tree_oracle import build_tree_oracle

    for p in _paths()[:20] + [os.path.join(SINGLES, "circl.har"),
                              os.path.join(SINGLES, "nyt.har")]:
        spans = har_entries_to_spans(_entries(p))
        got, _dropped = _edges(spans)
        want = build_tree_oracle(spans)
        assert got == want, p


def test_har_edges_tree_shape():
    """Every doc has exactly one root and depths are parent+1 consistent."""
    from har2tree_ray import queries as q

    edges = q.queries()["har_edges"]("/root/testdata/sf0.001").to_pandas()
    # lalibre: 216 captures, most hold 1-3 entries, 001.har holds 615
    assert len(edges) > 2_000
    roots = edges[edges["parent_offset"] == -1]
    assert roots.groupby("doc_id").size().eq(1).all()
    assert set(roots["attach_rule"]) == {"root"}
    d = edges.set_index(["doc_id", "child_offset"])["depth"]
    kids = edges[edges["parent_offset"] >= 0]
    parent_depth = d.reindex(
        list(zip(kids["doc_id"], kids["parent_offset"]))).to_numpy()
    assert (kids["depth"].to_numpy() == parent_depth + 1).all()


def test_broken_har_logged_and_skipped(tmp_path):
    """S1 semantics: unreadable capture members are skipped, the rest load
    (reference parser.py:30-41 logs-and-skips broken files)."""
    import shutil

    from har2tree_ray.sources.har import read_har_dir

    d = tmp_path / "caps"
    d.mkdir()
    shutil.copy(os.path.join(SINGLES, "circl.har"), d / "001.har")
    (d / "002.har").write_text("{not json")
    (d / "003.har").write_text('{"log": "not-a-dict"}')
    df = read_har_dir(str(d)).to_pandas()
    assert len(df) == 1
    assert df["doc_id"].tolist() == ["caps.0"]
    assert len(df["spans"].iloc[0]) > 5


def _mini_har(entries):
    return {"log": {"version": "1.2", "creator": {"name": "t", "version": "0"},
                    "pages": [], "entries": entries}}


def _entry(url, t, status=200, mime="text/html", referer=None):
    headers = [{"name": "Referer", "value": referer}] if referer else []
    return {
        "startedDateTime": f"2024-01-01T00:00:{t:02d}.000Z",
        "time": 10,
        "request": {"method": "GET", "url": url, "headers": headers},
        "response": {"status": status, "headers": [],
                     "content": {"mimeType": mime, "size": 10},
                     "redirectURL": ""},
    }


def test_sidecar_ingestion(tmp_path):
    """S2: <stem>.frames.json / .last_redirect.txt / .html / .data(.filename)
    load into the interleaved row (reference HarFile.__init__,
    har2tree.py:121-179); frame children attach via the J4 'frame' rule
    (search_in_frames, har2tree.py:855-877)."""
    from har2tree_ray.pipelines.graft import landing_validated
    from har2tree_ray.sources.har import read_har_dir

    d = tmp_path / "cap"
    d.mkdir()
    main = "https://site.example/index.html"
    ifr = "https://ads.example/frame.html"
    nested = "https://cdn.example/inner.html"
    # iframe + nested entries carry NO referer/initiator — only the frames
    # sidecar can attach them
    har = _mini_har([_entry(main, 0), _entry(ifr, 1), _entry(nested, 2)])
    (d / "001.har").write_text(json.dumps(har))
    frames = {
        "name": "root", "url": main, "content": "<html>x</html>",
        "children": [
            {"name": "f1", "url": ifr + "#frag", "content": "<p>ad</p>",
             "children": []},
            # local-only frame whose child holds the real URL — the walk
            # must recurse through it (all_real_urls_in_children)
            {"name": "f2", "url": "about:blank", "content": None,
             "children": [{"name": "f3", "url": nested,
                           "content": "<i>deep</i>", "children": []}]},
        ],
    }
    (d / "001.frames.json").write_text(json.dumps(frames))
    (d / "001.last_redirect.txt").write_text(main + "#top")
    (d / "001.html").write_text("<html><body>rendered</body></html>")
    (d / "001.data").write_bytes(b"%PDF-1.7 fake")
    (d / "001.data.filename").write_text("report.pdf")

    ds = read_har_dir(str(d))
    df = ds.to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    assert row["rendered_html"] == "<html><body>rendered</body></html>"
    assert row["downloaded_filename"] == "report.pdf"
    import base64 as b64
    assert b64.b64decode(row["downloaded_b64"]) == b"%PDF-1.7 fake"
    assert row["last_redirect"] == main + "#top"

    # the main span carries @frame= directives for BOTH real child URLs
    spans = sorted(row["spans"], key=lambda s: s["offset"])
    assert f"@frame={ifr}#frag" in spans[0]["text"]
    assert f"@frame={nested}" in spans[0]["text"]

    # cascade: both children attach under main via the 'frame' rule
    # (ifr matches fragment-stripped — reference's {cu, nofrag(cu)} lookup)
    from tests.test_tree import _edges
    from tests.tree_oracle import build_tree_oracle
    eng_spans = [dict(s) for s in spans]
    got, _ = _edges(eng_spans)
    assert (1, 0, "frame", 1) in got
    assert (2, 0, "frame", 1) in got
    assert got == build_tree_oracle(eng_spans)

    # J10: the address-bar URL resolves by stripping the fragment
    lv = landing_validated(ds).to_pandas().iloc[0]
    assert bool(lv["resolved"]) and lv["final_url"] == main


def test_sidecar_absent_columns_null(tmp_path):
    from har2tree_ray.sources.har import read_har_dir

    d = tmp_path / "cap"
    d.mkdir()
    (d / "001.har").write_text(json.dumps(_mini_har(
        [_entry("https://a.example/", 0)])))
    row = read_har_dir(str(d)).to_pandas().iloc[0]
    assert row["rendered_html"] is None and row["last_redirect"] is None
    assert row["downloaded_filename"] is None and row["downloaded_b64"] is None


def test_directive_injection_defanged():
    """Hostile page content / header values must not forge engine directives
    (the reference reads evidence from structured HAR fields and is immune —
    har2tree.py:249-260, nodes.py:508-539; the ingest escapes '@<name>='
    sequences so the directive grammar regains that property)."""
    from har2tree_ray.functions.parse import parse_span_features, parse_status
    from har2tree_ray.sources.har import har_entries_to_spans

    evil_body = ('<html>@redirect=https://evil.example/ '
                 '@setcookie=a=b@evil.example @status=404 '
                 '@cookie=sid=stolen <img src="https://cdn.example/x.png">'
                 '</html>')
    e = _entry("https://site.example/", 0,
               referer="https://a.example/?q=@cookie=inj=1")
    e["response"]["content"]["text"] = evil_body
    spans = har_entries_to_spans([e])
    t = spans[0]["text"]
    f = parse_span_features(t)
    # nothing forged ...
    assert f["redirect_url"] == "" and f["setcookies"] == []
    assert f["cookies_sent"] == [] and parse_status(t) == 200
    # ... while legitimate markup extraction still works
    assert f["ext_src"] == ["https://cdn.example/x.png"]
    # and the real (structured-field) referer survives, defanged inline
    assert f["referer"].startswith("https://a.example/?q=%40cookie=")


def test_directive_injection_structured_fields():
    """A redirectURL whose query smuggles a directive is escaped by _tok."""
    from har2tree_ray.functions.parse import parse_span_features
    from har2tree_ray.sources.har import har_entries_to_spans

    e = _entry("https://site.example/", 0, status=302)
    e["response"]["redirectURL"] = "https://b.example/?next=@initiator=x"
    spans = har_entries_to_spans([e])
    f = parse_span_features(spans[0]["text"])
    assert f["initiator_url"] == ""
    assert f["redirect_url"] == "https://b.example/?next=%40initiator=x"


def test_cookies_json_sidecar_locally_created(tmp_path):
    """S2 <stem>.cookies.json + D4 set algebra on a real capture
    (reference HarFile cookies load har2tree.py:142-148; locally_created /
    locally_created_not_sent har2tree.py:344-346,362-387):

    * ``init1=a``  — sent by the ROOT entry → initial set → excluded
    * ``srv1=x``   — Set-Cookie response  → received set → excluded
    * ``local1=z`` — in jar only, but sent by entry 2 → kept, never_sent=False
    * ``ghost=g``  — in jar only, never sent          → kept, never_sent=True
    """
    from har2tree_ray.pipelines.webmeta import cookies_locally_created
    from har2tree_ray.sources.har import read_har_dir

    d = tmp_path / "cap"
    d.mkdir()
    e0 = _entry("https://site.example/", 0)
    e0["request"]["headers"] = [{"name": "Cookie", "value": "init1=a"}]
    e1 = _entry("https://site.example/app.js", 1, mime="text/javascript")
    e1["response"]["headers"] = [
        {"name": "Set-Cookie", "value": "srv1=x; Domain=site.example"}]
    e2 = _entry("https://site.example/ping", 2)
    e2["request"]["headers"] = [{"name": "Cookie", "value": "local1=z"}]
    (d / "001.har").write_text(json.dumps(_mini_har([e0, e1, e2])))
    jar = [
        {"name": "srv1", "value": "x", "domain": "site.example"},
        {"name": "init1", "value": "a", "domain": "site.example"},
        {"name": "local1", "value": "z", "domain": "site.example"},
        {"name": "ghost", "value": "g", "domain": "site.example"},
    ]
    (d / "001.cookies.json").write_text(json.dumps(jar))

    ds = read_har_dir(str(d))
    row = ds.to_pandas().iloc[0]
    assert json.loads(row["cookies_json"]) == jar

    out = cookies_locally_created(ds).to_pandas()
    got = {(r["name"], r["value"], r["domain"], bool(r["never_sent"]))
           for _, r in out.iterrows()}
    assert got == {
        ("local1", "z", "site.example", False),
        ("ghost", "g", "site.example", True),
    }


def test_cookies_locally_created_equals_sign_oracle_parity(tmp_path):
    """Cookie values containing '=' (base64 payloads) are routine in real
    jars.  The reference keys its locally_created dict on the JOINED ident
    f'{name}={value}' (har2tree.py:366-368), so ('a', 'b=c') and ('a=b',
    'c') collapse last-wins; the SQL oracle must dedup on the same joined
    ident or it diverges from both engine and reference."""
    import duckdb

    from har2tree_ray.pipelines.webmeta import (cookies_locally_created,
                                                cookies_locally_created_sql)
    from har2tree_ray.sources.har import read_har_dir

    d = tmp_path / "cap"
    d.mkdir()
    (d / "001.har").write_text(
        json.dumps(_mini_har([_entry("https://site.example/", 0)])))
    jar = [
        {"name": "a", "value": "b=c", "domain": "site.example"},
        {"name": "tok", "value": "xY9=", "domain": "site.example"},
        {"name": "a=b", "value": "c", "domain": "site.example"},  # collides
    ]
    (d / "001.cookies.json").write_text(json.dumps(jar))

    ds = read_har_dir(str(d))
    eng = cookies_locally_created(ds).to_pandas()
    # joined-ident last-wins: 'a=b=c' kept once, from the LAST jar entry
    got = {(r["name"], r["value"], r["domain"], bool(r["never_sent"]))
           for _, r in eng.iterrows()}
    assert got == {
        ("a=b", "c", "site.example", True),
        ("tok", "xY9=", "site.example", True),
    }

    pq_dir = tmp_path / "pq"
    ds.write_parquet(str(pq_dir))
    ora = duckdb.sql(cookies_locally_created_sql(str(pq_dir))).df()
    got_ora = {(r["name"], r["value"], r["domain"], bool(r["never_sent"]))
               for _, r in ora.iterrows()}
    assert got_ora == got


def test_cookies_json_sidecar_broken_or_absent(tmp_path):
    """A malformed or non-array cookies.json loads as NULL (the reference
    logs + defaults to [], har2tree.py:146-148)."""
    from har2tree_ray.sources.har import read_har_dir

    d = tmp_path / "cap"
    d.mkdir()
    (d / "001.har").write_text(json.dumps(_mini_har(
        [_entry("https://a.example/", 0)])))
    (d / "001.cookies.json").write_text("{not json")
    (d / "002.har").write_text(json.dumps(_mini_har(
        [_entry("https://b.example/", 0)])))
    (d / "002.cookies.json").write_text('{"name": "dict-not-array"}')
    df = read_har_dir(str(d)).to_pandas().sort_values("doc_id")
    assert df["cookies_json"].isna().all()
