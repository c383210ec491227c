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