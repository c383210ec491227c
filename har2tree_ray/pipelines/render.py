"""JSON render sink — the d3js serialization surface (S3,
/root/reference/har2tree/nodes.py:50-66 ``to_dict``/``to_json`` and
har2tree.py:676-678): one deterministic JSON document per doc_id, rendering
the hostname tree as nested ``{name, level, n_urls, children[]}``.

The reference skips volatile features in its dump (``features_to_skip``,
nodes.py:77-81); here the projection is explicit — only stable columns enter
the JSON, and children are ordered by (level, hostname) so output is
byte-reproducible across runs and partitionings.

Engine shape: shuffle-free — the interleaved rows are doc-grouped already,
so the cascade, the host projection AND the JSON build all happen per
document inside one ``map_batches`` (rendering from a shuffled host-edge
table costs an all-to-all plus per-group dispatch for nothing).  Write the
result with ``ds.write_parquet`` or stream ``iter_batches`` to a JSON sink.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .tree import doc_edge_rows


def _json_for_doc(doc_id: str, edge_rows: list[dict]) -> str:
    """Branch-local hostname tree, the reference's make_hostname_tree
    algorithm (har2tree.py:680-708): walk the URL tree, group each node's
    URL children by hostname; a hostname repeats per branch.  Work is
    proportional to URL nodes — grouping host edges into a global DAG and
    re-expanding it blows up combinatorially on heavy-tail documents."""
    url_children: dict[int, list[dict]] = {}
    root = None
    for e in edge_rows:
        if e["parent_offset"] == -1:
            root = e
        else:
            url_children.setdefault(e["parent_offset"], []).append(e)

    def build(hostname: str, level: int, url_offsets: list[int]) -> dict:
        node = {"name": hostname, "level": level, "n_urls": len(url_offsets)}
        groups: dict[str, list[int]] = {}
        for u in url_offsets:
            for ce in url_children.get(u, ()):
                groups.setdefault(ce["child_hostname"], []).append(ce["child_offset"])
        if groups:
            node["children"] = [build(h, level + 1, offs)
                                for h, offs in sorted(groups.items())]
        return node

    forest = []
    if root is not None:
        forest = [build(root["child_hostname"], 0, [root["child_offset"]])]
    return json.dumps({"doc_id": doc_id, "tree": forest},
                      sort_keys=True, separators=(",", ":"))


def _d3_dict_for_doc(doc_id: str, spans: list[dict],
                     rendered_html: "str | None" = None,
                     downloaded_filename: "str | None" = None) -> dict:
    """Reference-format d3js dict for one document: the HostNode.to_dict
    shape (/root/reference/har2tree/nodes.py:50-66,725-733,802-835) —
    ``{name, children[], urls_count, request_cookie, response_cookie,
    third_party_cookies_received, mixed_content, http_content,
    https_content, contains_rendered_urlnode [, idna, hostname_is_ip,
    downloaded_filename]}`` — built branch-locally like
    make_hostname_tree (har2tree.py:680-708).

    Deviations (documented, deterministic): ``uuid`` is omitted (the
    reference's golden test scrubs it — it is random per instantiation,
    tests/simple_test.py:243-257); ``idna`` is taken from the
    lowest-offset URL of the node that has one (the reference takes
    whichever URL its walk adds first); rendered/download evidence
    attaches to the host containing the redirect-chain landing node."""
    from collections import defaultdict

    from ..functions import parse, urls
    from .tree import doc_edge_rows

    info: dict[int, dict] = {}
    for s in spans:
        t, u = s["text"], s["media_ref"]
        _, host, _ = urls.split_url(u)
        sent = ({f"{n}={v}" for n, v in parse.RE_COOKIE.findall(t)}
                if "@cookie=" in t else set())
        recv = set()
        if "@setcookie=" in t:
            for n, v, d in parse.RE_SETCOOKIE.findall(t):
                # M14 third-party rule, same as pipelines/cookies.py
                recv.add((d, f"{n}={v}", not host.endswith(d)))
        info[s["offset"]] = {
            "name": urls.unquote_name(u), "sent": sent, "recv": recv,
            "is_ip": urls.is_ip_hostname(host),
            "idna": urls.idna_decode(host)}

    edges = doc_edge_rows(spans)
    url_children: dict[int, list[dict]] = defaultdict(list)
    root = None
    for e in edges:
        if e["parent_offset"] == -1:
            root = e
        else:
            url_children[e["parent_offset"]].append(e)

    # redirect-chain landing (J1 consume-once ⇒ at most one per node)
    landing = root["child_offset"] if root is not None else None
    while landing is not None:
        nxt = [c for c in url_children.get(landing, ())
               if c["attach_rule"] == "redirect"]
        if not nxt:
            break
        landing = nxt[0]["child_offset"]

    has_render = bool(rendered_html) or bool(downloaded_filename)

    def build(hostname: str, offsets: list[int]) -> dict:
        offs = sorted(offsets)
        sent: set = set().union(*(info[o]["sent"] for o in offs))
        recv: set = set().union(*(info[o]["recv"] for o in offs))
        http = any(info[o]["name"].startswith("http://") for o in offs)
        https = any(info[o]["name"].startswith("https://") for o in offs)
        node: dict = {
            "name": hostname,
            "children": [],
            "urls_count": len(offs),
            "request_cookie": len(sent),
            "response_cookie": len(recv),
            "third_party_cookies_received": sum(
                1 for _, _, third in recv if third),
            "http_content": http,
            "https_content": https,
            "mixed_content": http and https,
            "contains_rendered_urlnode": has_render and landing in offs,
        }
        if node["contains_rendered_urlnode"] and downloaded_filename:
            node["downloaded_filename"] = downloaded_filename
        if any(info[o]["is_ip"] for o in offs):
            node["hostname_is_ip"] = True
        for o in offs:
            if info[o]["idna"]:
                node["idna"] = info[o]["idna"]
                break
        groups: dict[str, list[int]] = {}
        for u in offs:
            for ce in url_children.get(u, ()):
                groups.setdefault(ce["child_hostname"], []).append(
                    ce["child_offset"])
        node["children"] = [build(h, o) for h, o in sorted(groups.items())]
        return node

    tree = (build(root["child_hostname"], [root["child_offset"]])
            if root is not None else {})
    return {"doc_id": doc_id, "tree": tree}


def host_tree_json_d3(interleaved_ds, batch_size: int = 64):
    """(doc_id, json) — reference-format d3js render (S3 parity mode),
    canonical ``sort_keys`` dump so output is byte-reproducible.  Sidecar
    columns are optional: if the input carries ``rendered_html`` /
    ``downloaded_filename`` they drive ``contains_rendered_urlnode``."""

    def per_batch(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        rh = (batch["rendered_html"].to_pylist()
              if "rendered_html" in cols else [None] * len(ids))
        dl = (batch["downloaded_filename"].to_pylist()
              if "downloaded_filename" in cols else [None] * len(ids))
        out = [json.dumps(_d3_dict_for_doc(d, sp, r, f),
                          sort_keys=True, separators=(",", ":"))
               for d, sp, r, f in zip(ids, spans_col, rh, dl)]
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "json": pa.array(out, pa.string())})

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def host_tree_json(interleaved_ds, batch_size: int = 64):
    """(doc_id, json) — one deterministic JSON render per document."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = [_json_for_doc(d, doc_edge_rows(sp)) for d, sp in zip(ids, spans_col)]
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "json": pa.array(out, pa.string())})

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)