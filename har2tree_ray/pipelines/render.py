"""JSON render sink — the d3js serialization surface (S3,
/root/reference/har2tree/nodes.py:50-66 ``to_dict``/``to_json`` and
har2tree.py:676-678): one deterministic JSON document per doc_id, rendering
the hostname tree as nested ``{name, level, n_urls, children[]}``.

The reference skips volatile features in its dump (``features_to_skip``,
nodes.py:77-81); here the projection is explicit — only stable columns enter
the JSON, and children are ordered by (level, hostname) so output is
byte-reproducible across runs and partitionings.

Engine shape: ``groupby(doc_id).map_groups`` over the host-edge table — a
per-group projection, never a driver-side traversal; write the result with
``ds.write_parquet`` (or stream ``iter_batches`` to a JSON file sink)."""

from __future__ import annotations

import json

import pandas as pd

from .hosttree import host_edges


def _render_doc(df: pd.DataFrame) -> pd.DataFrame:
    children: dict[tuple, list] = {}
    nodes: dict[tuple, dict] = {}
    for r in df.itertuples(index=False):
        key = (int(r.host_level), r.hostname)
        pkey = (int(r.parent_level), r.parent_hostname)
        nodes.setdefault(key, {"name": r.hostname, "level": int(r.host_level),
                               "n_urls": 0})
        nodes[key]["n_urls"] += int(r.n_urls)
        children.setdefault(pkey, []).append(key)

    def build(key: tuple) -> dict:
        node = dict(nodes.get(key, {"name": key[1], "level": key[0], "n_urls": 0}))
        kids = sorted(set(children.get(key, ())))
        if kids:
            node["children"] = [build(k) for k in kids]
        return node

    # roots: parents that are not themselves child nodes (level -1 sentinel
    # or the synthetic root emitted by the edge builder)
    all_children = set(nodes)
    all_parents = set(children)
    roots = sorted(all_parents - all_children)
    if not roots:  # degenerate single-node doc
        roots = sorted(nodes)[:1]
    forest = [build(k) for r in roots for k in sorted(set(children.get(r, ())))] \
        if roots and roots[0] not in nodes else [build(r) for r in roots]
    doc = {"doc_id": df["doc_id"].iloc[0], "tree": forest}
    return pd.DataFrame({
        "doc_id": [df["doc_id"].iloc[0]],
        "json": [json.dumps(doc, sort_keys=True, separators=(",", ":"))],
    })


def host_tree_json(parsed_ds):
    """(doc_id, json) — one deterministic JSON render per document."""
    return host_edges(parsed_ds).groupby("doc_id").map_groups(
        _render_doc, batch_format="pandas")
