"""Web-artifact metadata ops (HHHash, domhash, TLD, identifiers, never-sent
cookies) + the JSON render sink."""

from __future__ import annotations

import json

import pytest

from har2tree_ray.functions import webhash
from tests.oracle_utils import assert_matches_oracle, to_pandas

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", [
    "span_hhhash", "doc_domhash", "host_tld", "span_identifiers",
    "cookies_never_sent", "posted_data", "span_security", "doc_user_agent",
    "doc_sidecars", "span_resource_hashes", "rendered_urls",
    "host_link_graph", "host_cooccur", "host_rank", "host_components",
])
def test_oracle_parity(name):
    assert_matches_oracle(name, SF)


def test_posted_data_decode_branches():
    """Every M12 decode branch round-trips: form→dict, json→object,
    text→string, binary→_raw_b64 (reference nodes.py:260-498)."""
    import base64

    from har2tree_ray.functions.parse import decode_posted_data

    assert decode_posted_data(
        "application/x-www-form-urlencoded", b"a=1&b=x") == {"a": "1", "b": "x"}
    assert decode_posted_data("application/json", b'{"k":1}') == {"k": 1}
    assert decode_posted_data("text/plain", b"alpha bravo") == "alpha bravo"
    raw = b"\xff\xfebinary"
    out = decode_posted_data("application/octet-stream", raw)
    assert out == {"_raw_b64": base64.b64encode(raw).decode()}
    # base64-flagged mimetype repairs transport encoding first
    assert decode_posted_data(
        "application/json;base64",
        base64.b64encode(b'{"z":2}').decode()) == {"z": 2}
    # NDJSON stream → list, one value per non-empty line (nodes.py:344-361)
    assert decode_posted_data(
        "application/x-json-stream", b'{"a":1}\n{"b":2}\n\n') == \
        [{"a": 1}, {"b": 2}]
    # multipart → [{"headers": {...}, "content": str}] per part, matching
    # the reference's MultipartDecoder shape (nodes.py:377-400)
    body = (b'--B\r\nContent-Disposition: form-data; name="f0"\r\n'
            b'\r\nhello\r\n'
            b'--B\r\nContent-Disposition: form-data; name="f1"\r\n'
            b'Content-Type: text/plain\r\n\r\nworld\r\n--B--\r\n')
    got = decode_posted_data("multipart/form-data;boundary=B", body)
    assert got == [
        {"headers": {"Content-Disposition": 'form-data; name="f0"'},
         "content": "hello"},
        {"headers": {"Content-Disposition": 'form-data; name="f1"',
                     "Content-Type": "text/plain"},
         "content": "world"},
    ]
    # LF-only multipart bodies normalize to CRLF first (nodes.py:385-388)
    lf = body.replace(b"\r\n", b"\n")
    assert decode_posted_data("multipart/form-data;boundary=B", lf) == got
    # no boundary param → raw text fallback
    assert decode_posted_data("multipart/form-data", b"x=1") == "x=1"


def test_magic_sniff_signatures():
    from har2tree_ray.pipelines.webmeta import sniff_mime

    assert sniff_mime(b"%PDF-1.7 rest") == "application/pdf"
    assert sniff_mime(b"\x89PNG\r\n\x1a\nxx") == "image/png"
    assert sniff_mime(b"GIF87a..") == "image/gif"
    assert sniff_mime(b"\x1f\x8bzz") == "application/gzip"
    assert sniff_mime(b"plain bytes") == ""


def test_hhhash_consecutive_dedup():
    a = webhash.hhhash("@geo=1,2 @frame=u1 @frame=u2 @referer=x")
    b = webhash.hhhash("@geo=1,2 @frame=u1 @referer=x")
    assert a == b  # consecutive duplicate names collapse
    c = webhash.hhhash("@geo=1,2 @referer=x @frame=u1 @referer=y")
    assert c != a  # non-consecutive repeats are kept
    assert a.startswith(f"hhh:{webhash.HHHASH_VERSION}:")


def test_identifier_blocklist():
    sitekeys, gtags = webhash.extract_identifiers(
        'x data-sitekey="6LKEY" gtag G-ABC1234 gtag G-12345678')
    assert sitekeys == ["6LKEY"]
    assert gtags == ["G-ABC1234"]  # blocklisted placeholder removed


def test_identifiers_present_in_fixture():
    from har2tree_ray import queries as q

    df = to_pandas(q.q_span_identifiers(SF))
    assert (df["id_type"] == "sitekey").any()
    assert (df["id_type"] == "gtag").any()
    assert not df["value"].isin(webhash.GTAG_BLOCKLIST).any()


def test_split_suffix():
    assert webhash.split_suffix("www.example.co.uk") == ("co.uk", "example.co.uk")
    assert webhash.split_suffix("h1.example2.com:8080") == ("com", "example2.com")
    assert webhash.split_suffix("10.1.1.2") == ("", "")
    assert webhash.split_suffix("localhost") == ("", "")
    # multi-level exact suffixes from the vendored PSL snapshot
    assert webhash.split_suffix("shop.com.cn") == ("com.cn", "shop.com.cn")
    assert webhash.split_suffix("a.b.co.za") == ("co.za", "b.co.za")
    # private-section suffix
    assert webhash.split_suffix("user.github.io") == ("github.io", "user.github.io")
    # wildcard rule *.ck: any label under ck is itself a suffix
    assert webhash.split_suffix("shop.foo.ck") == ("foo.ck", "shop.foo.ck")
    assert webhash.split_suffix("foo.ck") == ("foo.ck", "")
    # exception rule !www.ck overrides the wildcard
    assert webhash.split_suffix("www.ck") == ("ck", "www.ck")
    # jp city wildcard + exception
    assert webhash.split_suffix("x.y.kawasaki.jp") == ("y.kawasaki.jp", "x.y.kawasaki.jp")
    assert webhash.split_suffix("city.kawasaki.jp") == ("kawasaki.jp", "city.kawasaki.jp")
    # hostname that IS a public suffix → no registered domain
    assert webhash.split_suffix("co.uk") == ("co.uk", "")


def test_host_tree_json_roundtrip():
    """The JSON render must reproduce the host-edge structure exactly."""
    from har2tree_ray import queries as q

    docs = to_pandas(q.q_host_tree_json(SF))
    edges = to_pandas(q.q_host_edges(SF))
    some = docs.head(20)
    for _, row in some.iterrows():
        tree = json.loads(row["json"])
        assert tree["doc_id"] == row["doc_id"]

        got_edges = set()

        def walk(node, parent_key):
            key = (node["level"], node["name"])
            if parent_key is not None:
                got_edges.add((*parent_key, *key))
            for ch in node.get("children", []):
                walk(ch, key)

        for r in tree["tree"]:
            walk(r, None)
        want = edges[edges["doc_id"] == row["doc_id"]]
        want_edges = {
            (int(pl), ph, int(hl), h)
            for pl, ph, hl, h in zip(want["parent_level"], want["parent_hostname"],
                                     want["host_level"], want["hostname"])
            if int(pl) >= 0  # root sentinel edges carry no JSON parent
        }
        assert got_edges == want_edges
        # deterministic output
        assert row["json"] == json.dumps(json.loads(row["json"]),
                                         sort_keys=True, separators=(",", ":"))


@pytest.mark.parametrize("name", ["embedded_blobs", "urls_in_doc", "capture_stats"])
def test_oracle_parity_extras(name):
    assert_matches_oracle(name, SF)


def test_embedded_blob_roundtrip():
    from har2tree_ray.functions.parse import repair_b64
    from har2tree_ray import queries as q

    df = to_pandas(q.q_embedded_blobs(SF))
    assert len(df) > 0
    for b64, n in zip(df["payload_b64"].head(50), df["n_bytes"].head(50)):
        assert len(repair_b64(b64)) == n


def test_sniff_mime_signature_table():
    """M18 magic table: every signature resolves at its offset; longer
    signatures shadow weaker prefixes; unknown bytes yield ''."""
    from har2tree_ray.pipelines.webmeta import MAGIC_SIGNATURES, sniff_mime

    pad = b"\x00\x00\x00\x20"  # ISO-BMFF size field for the ftyp case
    for off, sig, mime in MAGIC_SIGNATURES:
        if off == 0:
            raw = sig + b"tail"
        elif off == 4:
            raw = pad + sig + b"tail"
        elif off == 8:  # RIFF/IFF container members
            raw = b"RIFF\x24\x00\x00\x00" + sig + b"tail"
        else:  # far-offset signatures (tar@257, DICM@128, CD001@32769)
            raw = b"\x00" * off + sig + b"tail"
        assert sniff_mime(raw) == mime, (off, sig, mime)
    assert sniff_mime(b"plain text here") == ""
    assert sniff_mime(b"") == ""
    # gzip's 2-byte sig must not shadow xz/zstd (ordering contract)
    assert sniff_mime(b"\xfd7zXZ\x00rest") == "application/x-xz"
    assert sniff_mime(b"\x89PNG\r\n\x1a\n....") == "image/png"
    # truncated payload shorter than an offset sig: no IndexError, no match
    assert sniff_mime(b"RIFF\x24\x00") == ""


def test_posted_data_protobuf_wire():
    """M12 protobuf branch (reference blackboxprotobuf, nodes.py:401-416):
    hand-built wire bytes decode to the [{"protobuf_message", "typedef"}]
    shape; malformed wire falls through to the raw branch."""
    from har2tree_ray.functions.parse import (decode_posted_data,
                                              decode_protobuf_wire)

    # field1 varint 150 | field2 str "testing" | field3 nested {1: 1}
    wire = b"\x08\x96\x01" + b"\x12\x07testing" + b"\x1a\x02\x08\x01"
    msg, typedef = decode_protobuf_wire(wire)
    assert msg == {"1": 150, "2": "testing", "3": {"1": 1}}
    assert typedef["1"] == {"type": "int"}
    assert typedef["2"] == {"type": "str"}
    assert typedef["3"]["type"] == "message"

    # repeated field → list
    msg2, _ = decode_protobuf_wire(b"\x08\x01\x08\x02\x08\x03")
    assert msg2 == {"1": [1, 2, 3]}

    out = decode_posted_data("application/x-protobuf", wire)
    assert out == [{"protobuf_message": msg, "typedef": typedef}]
    # grpc-web alias routes the same way
    out2 = decode_posted_data("application/grpc-web+proto", wire)
    assert out2 == out
    # garbage wire → falls through to raw (b64) like the reference's
    # final fallback
    bad = decode_posted_data("application/x-protobuf", b"\xff\xff\xff")
    assert "_raw_b64" in bad


def test_posted_data_dns_wire():
    """M12 dns-message branch (reference dns.message.from_wire,
    nodes.py:433-441): query + compressed-pointer answer parse."""
    import struct

    from har2tree_ray.functions.parse import (decode_dns_wire,
                                              decode_posted_data)

    name = b"\x07example\x03com\x00"
    q = struct.pack(">HHHHHH", 0x1234, 0x0100, 1, 0, 0, 0) + name + \
        struct.pack(">HH", 1, 1)
    out = decode_dns_wire(q)
    assert out["id"] == 0x1234
    assert out["questions"] == [{"name": "example.com.", "type": "A"}]
    assert out["answers"] == []

    # response: same question + one A answer via compression pointer to
    # offset 12 (0xC00C)
    ans = b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 300, 4) + \
        bytes([1, 2, 3, 4])
    r = struct.pack(">HHHHHH", 7, 0x8180, 1, 1, 0, 0) + name + \
        struct.pack(">HH", 1, 1) + ans
    out = decode_dns_wire(r)
    assert out["answers"] == [{"name": "example.com.", "type": "A",
                               "ttl": 300, "rdata": "1.2.3.4"}]

    routed = decode_posted_data("application/dns-message", q)
    assert routed["questions"][0]["name"] == "example.com."
    # truncated wire → raw fallback
    assert "_raw_b64" in decode_posted_data("application/dns-message",
                                            b"\x00\x01\x02\xff")


def test_posted_data_atom_xml_and_ion():
    """M12 atom+xml / amazon-ion branches (nodes.py:363-377,418-432): both
    tear JSON blobs; non-JSON bodies stay verbatim strings."""
    from har2tree_ray.functions.parse import decode_posted_data

    assert decode_posted_data("application/atom+xml",
                              b'{"feed": 3}') == {"feed": 3}
    xml = "<feed><entry/></feed>"
    assert decode_posted_data("application/atom+xml", xml.encode()) == xml
    assert decode_posted_data("application/x-amzn-ion",
                              b'{"k": [1, 2]}') == {"k": [1, 2]}
    assert decode_posted_data("application/x-amzn-ion",
                              b"not ion text") == "not ion text"


def test_magic_signature_table():
    """M18 magic table: ≥60 public signatures with offset support; brand
    sniffs beat the generic ISO-BMFF entry; offset signatures match only
    at their offset; weak 2-byte entries never shadow longer ones."""
    from har2tree_ray.pipelines.webmeta import MAGIC_SIGNATURES, sniff_mime

    assert len(MAGIC_SIGNATURES) >= 60
    assert sniff_mime(b"\x00\x00\x00\x20ftypavif" + b"x" * 8) == "image/avif"
    assert sniff_mime(b"\x00\x00\x00\x20ftypisom" + b"x" * 8) == "video/mp4"
    assert sniff_mime(b"\x00" * 257 + b"ustar" + b"\x00" * 200) == "application/x-tar"
    assert sniff_mime(b"ustar") == ""                     # offset matters
    assert sniff_mime(b"\x00" * 128 + b"DICM") == "application/dicom"
    assert sniff_mime(b"SQLite format 3\x00" + b"\x00" * 50) == "application/vnd.sqlite3"
    assert sniff_mime(b"MZ\x90\x00") == "application/x-msdownload"
    assert sniff_mime(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert sniff_mime(b"\xff\x0a\x00") == "image/jxl"
    assert sniff_mime(b"\xff\xd8\xff\xe0") == "image/jpeg"  # jpeg beats jxl
    assert sniff_mime(b"PAR1xxxx") == "application/vnd.apache.parquet"
    assert sniff_mime(b"") == "" and sniff_mime(b"\x00") == ""


def test_host_components_multi_component():
    """Min-label propagation must separate disjoint graphs — the sf corpus
    is one giant component, so exercise the discriminating case directly:
    two referral chains that never touch → two components, each labeled by
    its lexicographically smallest member."""
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta

    def span(host, ref):
        return {"text": f"@referer=https://{ref}/x body",
                "hostname": host}

    rows = [
        # component 1: a.example -> b.example -> c.example
        span("b.example", "a.example"),
        span("c.example", "b.example"),
        # component 2: x.example <-> y.example
        span("y.example", "x.example"),
        span("x.example", "y.example"),
    ]
    out = to_pandas(webmeta.host_components(rd.from_items(rows)))
    comp = dict(zip(out["hostname"], out["component"]))
    assert comp == {
        "a.example": "a.example", "b.example": "a.example",
        "c.example": "a.example",
        "x.example": "x.example", "y.example": "x.example",
    }


def test_host_rank_chain_values():
    """Integer mass propagation on a hand-computable chain: a -> b -> c.
    outdeg(a)=outdeg(b)=1; after 3 iterations (mass 1e6, base 150k):
      m1 = (150000+850000, 150000+850000, 150000+850000) for (b,c) heads
      a never receives: m(a) stays 150000 after iter 1.
    Worked by hand below and asserted exactly."""
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta

    rows = [
        {"text": "@referer=https://a.example/x body", "hostname": "b.example"},
        {"text": "@referer=https://b.example/x body", "hostname": "c.example"},
    ]
    out = to_pandas(webmeta.host_rank(rd.from_items(rows)))
    r = dict(zip(out["hostname"], out["rank"]))
    # iter1: a=150000, b=150000+850000=1000000, c=150000+850000=1000000
    # iter2: a=150000, b=150000+(150000*85)//100=277500, c=150000+850000=1000000
    # iter3: a=150000, b=277500, c=150000+(277500*85)//100=385875
    assert r == {"a.example": 150000, "b.example": 277500,
                 "c.example": 385875}


def test_host_reciprocity_known_graph():
    """Known directed graph: a<->b mutual, a->c one-way, c->b one-way."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta as W

    def span(ref, referer):
        return {"kind": "document", "text": f"x @referer={referer}",
                "media_ref": ref, "offset": 0}

    span_type = pa.struct([("kind", pa.string()), ("text", pa.string()),
                           ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = {
        "d1": [span("http://b/x", "http://a/")],   # a -> b
        "d2": [span("http://a/y", "http://b/")],   # b -> a
        "d3": [span("http://c/z", "http://a/")],   # a -> c
        "d4": [span("http://b/w", "http://c/")],   # c -> b
    }
    tbl = pa.table({
        "doc_id": pa.array(list(docs), pa.string()),
        "spans": pa.array(list(docs.values()), pa.list_(span_type)),
    })
    from har2tree_ray.stages.normalize import explode_spans

    flat = explode_spans(rd.from_arrow(tbl), ["text", "hostname"])
    got = (W.host_reciprocity(flat).to_pandas()
           .sort_values("hostname").reset_index(drop=True))
    want = pd.DataFrame({
        "hostname": ["a", "b", "c"],
        "out_deg": [2, 1, 1],
        "n_reciprocal": [1, 1, 0]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_host_assortativity_known_graph():
    """Path graph a-b-c: degrees a=1 b=2 c=1; canonical edges (a,b), (b,c);
    moments: m=2, sum_a=1+2=3, sum_b=2+1=3, sum_ab=2+2=4, sum_a2=1+4=5,
    sum_b2=4+1=5."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta as W
    from har2tree_ray.stages.normalize import explode_spans

    def span(ref, referer):
        return {"kind": "document", "text": f"x @referer={referer}",
                "media_ref": ref, "offset": 0}

    span_type = pa.struct([("kind", pa.string()), ("text", pa.string()),
                           ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = {
        "d1": [span("http://b/x", "http://a/")],
        "d2": [span("http://c/y", "http://b/")],
    }
    tbl = pa.table({
        "doc_id": pa.array(list(docs), pa.string()),
        "spans": pa.array(list(docs.values()), pa.list_(span_type)),
    })
    flat = explode_spans(rd.from_arrow(tbl), ["text", "hostname"])
    got = W.host_assortativity(flat).to_pandas()
    want = pd.DataFrame({"m": [2], "sum_a": [3], "sum_b": [3],
                         "sum_ab": [4], "sum_a2": [5], "sum_b2": [5]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_host_graph_copart_route_parity(monkeypatch):
    """Size-routed co-partition escalation (broadcast_max) must produce
    bit-identical ranks/components to the broadcast path, and the router
    must actually take the escalated branch when the node bound exceeds
    the threshold (skewed hub graph)."""
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta

    def span(host, ref):
        return {"text": f"@referer=https://{ref}/x body", "hostname": host}

    # skewed synthetic: hub h00 feeds 12 spokes, plus a 4-chain and a 2-cycle
    rows = ([span(f"s{i:02d}.ex", "h00.ex") for i in range(12)]
            + [span("h00.ex", "s00.ex")]
            + [span(f"c{i+1}.ex", f"c{i}.ex") for i in range(3)]
            + [span("m.ex", "n.ex"), span("n.ex", "m.ex")])

    called = {"rank": 0, "comp": 0}
    orig_rank, orig_comp = webmeta._rank_copart, webmeta._components_copart

    def spy_rank(*a, **k):
        called["rank"] += 1
        return orig_rank(*a, **k)

    def spy_comp(*a, **k):
        called["comp"] += 1
        return orig_comp(*a, **k)

    monkeypatch.setattr(webmeta, "_rank_copart", spy_rank)
    monkeypatch.setattr(webmeta, "_components_copart", spy_comp)

    bc = to_pandas(webmeta.host_rank(rd.from_items(rows)))
    assert called["rank"] == 0  # default threshold keeps the broadcast route
    cp = to_pandas(webmeta.host_rank(rd.from_items(rows), broadcast_max=0))
    assert called["rank"] == 1  # node bound > 0 routes to the coded escalation
    assert (sorted(map(tuple, bc.values.tolist()))
            == sorted(map(tuple, cp.values.tolist())))

    bc = to_pandas(webmeta.host_components(rd.from_items(rows)))
    assert called["comp"] == 0
    cp = to_pandas(webmeta.host_components(rd.from_items(rows),
                                           broadcast_max=0))
    assert called["comp"] == 1
    assert (sorted(map(tuple, bc.values.tolist()))
            == sorted(map(tuple, cp.values.tolist())))


def test_host_components_unconverged_raises():
    """Min-label propagation needs ~eccentricity iterations; exhausting
    max_iters mid-propagation must raise on BOTH routes, never return a
    wrong labeling silently."""
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta

    chain = [{"text": f"@referer=https://h{i:03d}.ex/x body",
              "hostname": f"h{i + 1:03d}.ex"} for i in range(10)]
    for kw in ({}, {"broadcast_max": 0}):
        with pytest.raises(RuntimeError, match="did not converge"):
            to_pandas(webmeta.host_components(rd.from_items(chain),
                                              max_iters=3, **kw))
        # and the same graph converges fine with enough headroom
        out = to_pandas(webmeta.host_components(rd.from_items(chain),
                                                max_iters=64, **kw))
        assert set(out["component"]) == {"h000.ex"}


def test_host_kcore_invariants_and_known_graph():
    """Corpus check: for every emitted core value k, the set
    {h : core(h) >= k} must equal the maximal subgraph with min degree
    >= k computed by an independent iterative-removal pass; known-graph
    check: K4 (core 3) + a 4-cycle (core 2) + a pendant path (core 1)."""
    import numpy as np
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta
    from har2tree_ray.queries import queries

    got = queries()["host_kcore"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    core = dict(zip(got["hostname"], got["core"].astype(int)))
    assert len(core) > 0

    # rebuild the same undirected distinct edge set independently
    from har2tree_ray.pipelines.webmeta import _referral_pairs
    from har2tree_ray.queries import read_interleaved
    from har2tree_ray.stages.normalize import explode_spans

    flat = explode_spans(read_interleaved(SF), ["text", "hostname"])
    pairs = set()
    for batch in flat.iter_batches(batch_format="pyarrow"):
        import pyarrow as pa

        s, d = _referral_pairs(pa.table(batch) if not isinstance(batch, pa.Table) else batch)
        for a, b in zip(s, d):
            pairs.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(core) == set(adj)
    for k in sorted(set(core.values())):
        sub = {h: set(n) for h, n in ((h, adj[h]) for h in adj)}
        changed = True
        while changed:
            drop = [h for h, n in sub.items() if len(n) < k]
            changed = bool(drop)
            for h in drop:
                for nb in sub[h]:
                    sub[nb].discard(h)
                del sub[h]
        assert set(sub) == {h for h, c in core.items() if c >= k}, k

    # known graph: K4 ∪ C4 ∪ pendant path, fed as synthetic spans
    def span(host, ref):
        return {"text": f"@referer=https://{ref}/p", "hostname": host}

    k4 = [("a.k4", "b.k4"), ("a.k4", "c.k4"), ("a.k4", "d.k4"),
          ("b.k4", "c.k4"), ("b.k4", "d.k4"), ("c.k4", "d.k4")]
    c4 = [("w.c4", "x.c4"), ("x.c4", "y.c4"), ("y.c4", "z.c4"),
          ("z.c4", "w.c4")]
    path = [("p.p", "q.p"), ("q.p", "r.p")]
    rows = [span(b, a) for a, b in k4 + c4 + path]
    out = webmeta.host_kcore(rd.from_items(rows))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    cmap = dict(zip(out["hostname"], out["core"].astype(int)))
    assert all(cmap[h] == 3 for h in ("a.k4", "b.k4", "c.k4", "d.k4"))
    assert all(cmap[h] == 2 for h in ("w.c4", "x.c4", "y.c4", "z.c4"))
    assert all(cmap[h] == 1 for h in ("p.p", "q.p", "r.p"))


def test_host_bridges_bruteforce_and_known_graph():
    """Corpus check: an edge is reported iff its removal disconnects its
    endpoints (BFS reachability test per edge — exact definition of a
    bridge); known graph: two triangles joined by one edge — exactly that
    joining edge is the bridge, pendant edges are bridges too."""
    import ray.data as rd

    from har2tree_ray.pipelines import webmeta
    from har2tree_ray.pipelines.webmeta import _canonical_edge_df
    from har2tree_ray.queries import queries, read_interleaved
    from har2tree_ray.stages.normalize import explode_spans

    got = queries()["host_bridges"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    reported = set(zip(got["a"], got["b"]))

    flat = explode_spans(read_interleaved(SF), ["text", "hostname"])
    edges = _canonical_edge_df(flat)
    pairs = sorted(zip(edges["a"], edges["b"]))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def connected(u, v, skip):
        seen, stack = {u}, [u]
        while stack:
            x = stack.pop()
            if x == v:
                return True
            for nb in adj[x]:
                if (min(x, nb), max(x, nb)) == skip or nb in seen:
                    continue
                seen.add(nb)
                stack.append(nb)
        return False

    want = {(a, b) for a, b in pairs if not connected(a, b, (a, b))}
    assert reported == want
    assert len(want) > 0  # the synth graph has pendant referral edges

    def span(host, ref):
        return {"text": f"@referer=https://{ref}/p", "hostname": host}

    tri1 = [("a.x", "b.x"), ("b.x", "c.x"), ("a.x", "c.x")]
    tri2 = [("d.x", "e.x"), ("e.x", "f.x"), ("d.x", "f.x")]
    join = [("c.x", "d.x")]
    pend = [("f.x", "g.x")]
    rows = [span(b, a) for a, b in tri1 + tri2 + join + pend]
    out = webmeta.host_bridges(rd.from_items(rows))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert set(zip(out["a"], out["b"])) == {("c.x", "d.x"), ("f.x", "g.x")}
