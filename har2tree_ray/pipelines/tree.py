"""URL-tree construction — the parity-critical per-document shuffle.

Recast of ``Har2Tree.make_tree`` (/root/reference/har2tree/har2tree.py:
718-757, joins J1-J8 :879-1014, fallback cascade :770-853, orphan cap
:722-732, status-0 dedup :575-607).  Ray Data shape (SURVEY.md §7 step 5):

    flat+parsed spans → groupby("doc_id") → map_groups(build_doc_tree)

Each group is one document; the ordered, mutating, consume-once attach
cascade runs sequentially *inside* the group while all documents stream in
parallel.  Output is the EDGE_SCHEMA table (a tree is rows sharing doc_id).

Deterministic attach-rule cascade (DFS pre-order from the root, matching the
reference's `_make_subtree` recursion order):

  1. ``redirect``        — effective redirect target: ``@redirect`` (HTTP,
     M24) else ``@meta_refresh`` whose target is a known URL (M23) else the
     first ``location.href`` target that is a known URL (M22).  Multi-match
     keeps candidates up to and including the first with status>0
     (har2tree.py:914-923); consume-once.
  2. ``frame``           — parent's ``@frame=`` URLs (J4).
  3. ``initiator``       — child's ``@initiator=`` equals parent URL (J2).
  4. ``referer``         — child's ``@referer=`` equals parent URL (J3).
  5. ``referer_nofrag``  — fragment-stripped referer match (J3).
  6. ``external_<cls>``  — child URL appears in the parent's extracted
     refs, tag-class order src → href → cssurl; skipped when the child has
     a referer that resolves inside the doc (anti-join, har2tree.py:1008-1010).

Fallback cascade for orphans (offset order, ≤1000 processed — the
defensive cap of har2tree.py:722-732, remainder dropped and counted):
  ``fallback_referer``  — referer matches an attached node's URL;
  ``fallback_hostname`` — deepest attached container node on the referer's
  hostname (recast of `_guess_best_node_for_partial_referer`
  har2tree.py:759-768), tie-break smallest offset;
  ``fallback_root``     — everything else.
After each fallback attach, the DFS re-runs from the new node so its own
children can attach (har2tree.py:722-732 re-enter).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.urls import rebuild_url, split_url, strip_fragment

ORPHAN_CAP = 1000
_CONTAINER_KINDS = ("document", "script", "iframe")


def _effective_redirect(node: dict, url_index: dict) -> "tuple[str, str]":
    """Effective redirect target with M21 partial-URL repair: every channel's
    target is rebuilt against the node's own URL + the doc's known-URL set
    (strict strategies 1-4 of ``rebuild_url`` — the reference rebuilds every
    redirectURL the same way, nodes.py:626-641 / helper.py:130-201).

    Returns (target, channel evidence) — evidence is the channel name plus
    the RAW value it fired on (``channel=raw`` or ``channel=raw=>repaired``
    when M21 rewrote it), consumed only by evidence-flagged runs."""
    base = node["media_ref"]
    if node["redirect_url"]:
        t = node["redirect_url"]
        if t in url_index:
            return t, f"redirect_url={t}"
        # unknown raw target: a repaired match attaches; otherwise keep the
        # raw target (no candidates — same no-attach outcome as before)
        rb = rebuild_url(base, t, url_index, strict=True)
        if rb:
            return rb, f"redirect_url={t}=>{rb}"
        return t, f"redirect_url={t}"
    mr = node["meta_refresh"]
    if mr:
        if mr in url_index:
            return mr, f"meta_refresh={mr}"
        t = rebuild_url(base, mr, url_index, strict=True)
        if t:
            return t, f"meta_refresh={mr}=>{t}"
    for t in node["jsloc_urls"]:
        if t in url_index:
            return t, f"jsloc={t}"
        rb = rebuild_url(base, t, url_index, strict=True)
        if rb:
            return rb, f"jsloc={t}=>{rb}"
    return "", ""


def build_doc_tree(nodes: list[dict],
                   evidence: bool = False) -> tuple[list[dict], int]:
    """Pure per-document cascade over parsed span dicts (offset-sorted).

    Returns (edge rows, n_dropped_orphans).  Separated from the Ray group
    function so unit tests and the graft stage can reuse it.

    ``evidence=True`` adds an ``attach_evidence`` string to every edge —
    the matched rule's raw evidence (redirect channel + target, frame URL
    variant, matched referer/initiator URL, external-ref string, fallback
    container choice) — the engine counterpart of the reference's
    trace_make_subtree debug decorators (har2tree.py:46-87, enabled by
    dropping files in a debug dir; here a structured column instead, so
    one misattached doc is greppable without rerunning oracles).  Zero
    cost when off: no evidence strings are built and the key is absent.
    """
    nodes = sorted(nodes, key=lambda r: r["offset"])
    # D1 status-0 retry dedup: drop status<=0 when a >0 twin of the same URL
    # exists anywhere in the doc (har2tree.py:575-607)
    alive_urls = {n["media_ref"] for n in nodes if n["status"] > 0}
    nodes = [n for n in nodes if n["status"] > 0 or n["media_ref"] not in alive_urls]
    # M3 empty-URL filter
    nodes = [n for n in nodes if n["media_ref"]]
    if not nodes:
        return [], 0

    by_id = {i: n for i, n in enumerate(nodes)}
    url_index: dict[str, list[int]] = {}
    # reverse evidence indexes: rules 3-5 would otherwise scan the whole
    # unattached set per visited node — O(n²) on heavy-tail docs (the 1%
    # with 100-616 spans).  Lists are built in ascending node order, so
    # iterating them preserves the original sorted(unattached) visit order.
    initiator_index: dict[str, list[int]] = {}
    referer_index: dict[str, list[int]] = {}
    nofrag_index: dict[str, list[int]] = {}
    for i, n in by_id.items():
        url_index.setdefault(n["media_ref"], []).append(i)
        iu = n["initiator_url"]
        if iu:
            initiator_index.setdefault(iu, []).append(i)
        r = n["referer"]
        if r:
            referer_index.setdefault(r, []).append(i)
            nf = strip_fragment(r)
            if nf != r:  # rule 5 requires referer != match target
                nofrag_index.setdefault(nf, []).append(i)
    all_urls = set(url_index)

    root = 0
    unattached = set(by_id) - {root}
    root_edge = {"child_offset": nodes[root]["offset"], "parent_offset": -1,
                 "attach_rule": "root", "depth": 0,
                 "child_hostname": nodes[root]["hostname"],
                 "parent_hostname": "", "child_kind": nodes[root]["kind"]}
    if evidence:
        root_edge["attach_evidence"] = ""
    edges: list[dict] = [root_edge]
    depth = {root: 0}

    def referer_resolves(n: dict) -> bool:
        r = n["referer"]
        return bool(r) and (r in all_urls or strip_fragment(r) in all_urls)

    def attach(child: int, parent: int, rule: str, ev="") -> None:
        unattached.discard(child)
        depth[child] = depth[parent] + 1
        row = {"child_offset": by_id[child]["offset"],
               "parent_offset": by_id[parent]["offset"],
               "attach_rule": rule, "depth": depth[child],
               "child_hostname": by_id[child]["hostname"],
               "parent_hostname": by_id[parent]["hostname"],
               "child_kind": by_id[child]["kind"]}
        if evidence:
            # call sites pass `evidence and f"..."` so the string is only
            # ever BUILT on flagged runs (short-circuit keeps the off path
            # allocation-free)
            row["attach_evidence"] = ev or ""
        edges.append(row)

    def collect_children(u: int) -> list[int]:
        node = by_id[u]
        url = node["media_ref"]
        attached_now: list[int] = []

        def take(cand: int, rule: str, ev="") -> None:
            attach(cand, u, rule, ev)
            attached_now.append(cand)

        # 1. redirect (consume up to first status>0 — har2tree.py:914-923)
        target, red_ev = _effective_redirect(node, url_index)
        if target:
            cands = [i for i in url_index.get(target, []) if i in unattached]
            picked = []
            for c in cands:
                picked.append(c)
                if by_id[c]["status"] > 0:
                    break
            for c in picked:
                take(c, "redirect", evidence and red_ev)
        # 2. frames (exact, then fragment-stripped — the reference matches
        # {cu, cu.split('#')[0]} against all_url_requests, har2tree.py:954)
        for fu in node["frame_urls"]:
            for v in dict.fromkeys((fu, strip_fragment(fu))):
                for c in [i for i in url_index.get(v, []) if i in unattached]:
                    take(c, "frame", evidence and f"frame_url={v}")
        # 3. initiator / 4. referer / 5. referer_nofrag — index lookups in
        # the same ascending order the sorted(unattached) scans used
        for c in initiator_index.get(url, ()):
            if c in unattached:
                take(c, "initiator", evidence and f"initiator_url={url}")
        for c in referer_index.get(url, ()):
            if c in unattached:
                take(c, "referer", evidence and f"referer={url}")
        for c in nofrag_index.get(url, ()):
            if c in unattached:
                take(c, "referer_nofrag",
                     evidence and f"referer_stripped={url}")
        # 6. external resources by tag class (anti-join on resolvable
        # referer).  Channel order is part of the determinism contract:
        # src/href/url() first (the reference's tag walk), then the M19
        # breadth channels — srcset, poster/longdesc/data attrs, CSS
        # @import, and the full-text URL fallback (helper.py:356-466).
        for cls, key in (("src", "ext_src"), ("href", "ext_href"),
                         ("cssurl", "ext_cssurl"), ("srcset", "ext_srcset"),
                         ("attr", "ext_attr"), ("cssimport", "ext_cssimport"),
                         ("fulltext", "ext_fulltext")):
            for ref in node[key]:
                for c in [i for i in url_index.get(ref, []) if i in unattached]:
                    if referer_resolves(by_id[c]):
                        continue
                    take(c, f"external_{cls}", evidence and f"{key}={ref}")
        return attached_now

    def dfs(start: int) -> None:
        stack = [start]
        while stack:
            u = stack.pop()
            children = collect_children(u)
            stack.extend(reversed(children))

    dfs(root)

    # fallback cascade (J6) with the 1000-orphan cap (A5)
    processed = 0
    while unattached and processed < ORPHAN_CAP:
        o = min(unattached)
        processed += 1
        node = by_id[o]
        parent, rule, ev = root, "fallback_root", ""
        r = node["referer"]
        if r:
            targets = [i for i in url_index.get(r, []) if i not in unattached]
            matched_r = r
            if not targets:
                matched_r = strip_fragment(r)
                targets = [i for i in url_index.get(matched_r, []) if i not in unattached]
            if targets:
                parent, rule = min(targets), "fallback_referer"
                ev = evidence and f"referer={matched_r}"
            else:
                _, ref_host, _ = split_url(r)
                cands = [
                    i for i, n in by_id.items()
                    if i not in unattached and n["hostname"] == ref_host
                    and n["kind"] in _CONTAINER_KINDS
                ]
                if cands:
                    # deepest container, tie-break smallest offset
                    parent = min(cands, key=lambda i: (-depth[i], i))
                    rule = "fallback_hostname"
                    ev = (evidence and
                          f"referer_host={ref_host};"
                          f"container_depth={depth[parent]}")
        attach(o, parent, rule, ev)
        dfs(o)

    return edges, len(unattached)


_PARSED_COLS = [
    "doc_id", "offset", "kind", "media_ref", "hostname", "status",
    "redirect_url", "meta_refresh", "referer", "initiator_url",
    "frame_urls", "ext_src", "ext_href", "ext_cssurl", "ext_srcset",
    "ext_attr", "ext_cssimport", "ext_fulltext", "jsloc_urls",
]


def _group_fn(df: pd.DataFrame) -> pd.DataFrame:
    rows = df.to_dict("records")
    for r in rows:
        for k in ("frame_urls", "ext_src", "ext_href", "ext_cssurl",
                  "ext_srcset", "ext_attr", "ext_cssimport", "ext_fulltext",
                  "jsloc_urls"):
            v = r[k]
            r[k] = list(v) if v is not None else []
    edges, _dropped = build_doc_tree(rows)
    doc_id = df["doc_id"].iloc[0]
    out = pd.DataFrame(
        edges,
        columns=["child_offset", "parent_offset", "attach_rule", "depth",
                 "child_hostname", "parent_hostname", "child_kind"],
    )
    out.insert(0, "doc_id", doc_id)
    out["child_offset"] = out["child_offset"].astype("int32")
    out["parent_offset"] = out["parent_offset"].astype("int32")
    out["depth"] = out["depth"].astype("int32")
    return out


def build_edges(parsed_ds):
    """Parsed flat spans → EDGE_SCHEMA Dataset (one shuffle on doc_id).

    General path for inputs that arrive as flat spans.  When the source is
    the interleaved table (rows already doc-grouped) use
    ``build_edges_interleaved`` — it skips the all-to-all entirely."""
    slim = parsed_ds.select_columns(_PARSED_COLS)
    return slim.groupby("doc_id").map_groups(_group_fn, batch_format="pandas")


def doc_edge_rows(spans: list[dict], evidence: bool = False) -> list[dict]:
    """One document's span structs → edge dicts (normalize + parse + cascade
    inline).  Shared by the shuffle-free edge builder and the JSON render."""
    return doc_edges_and_drops(spans, evidence)[0]


def doc_edges_and_drops(spans: list[dict],
                        evidence: bool = False) -> tuple[list[dict], int]:
    """Like ``doc_edge_rows`` but also returns the A5 orphan-cap drop count
    (SURVEY §2.5: the cap must never be silent)."""
    from ..functions import parse

    nodes = []
    for s in spans:
        t = s["text"]
        f = parse.parse_span_features(t)
        _, host, _ = split_url(s["media_ref"])
        f.update(offset=s["offset"], kind=s["kind"],
                 media_ref=s["media_ref"], hostname=host,
                 status=parse.parse_status(t))
        nodes.append(f)
    return build_doc_tree(nodes, evidence)


def _interleaved_batch_edges(batch: pa.Table) -> pa.Table:
    """One interleaved row = one whole document: normalize + parse + cascade
    inline, per batch.  ZERO shuffle — the interleaved layout IS the
    co-partitioning the groupby path exists to create; shuffling flat spans
    (with 5 list<string> evidence columns) costs more than the cascade
    itself by an order of magnitude (measured at sf0.1)."""
    return _batch_edges(batch, evidence=False)


def _batch_edges(batch: pa.Table, evidence: bool) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    cols = ["doc_id", "child_offset", "parent_offset", "attach_rule",
            "depth", "child_hostname", "parent_hostname", "child_kind"]
    if evidence:
        cols.append("attach_evidence")
    out = {k: [] for k in cols}
    for did, spans in zip(ids, spans_col):
        for e in doc_edge_rows(spans, evidence):
            out["doc_id"].append(did)
            for k in cols[1:]:
                out[k].append(e[k])
    t = {
        "doc_id": pa.array(out["doc_id"], pa.string()),
        "child_offset": pa.array(out["child_offset"], pa.int32()),
        "parent_offset": pa.array(out["parent_offset"], pa.int32()),
        "attach_rule": pa.array(out["attach_rule"], pa.string()),
        "depth": pa.array(out["depth"], pa.int32()),
        "child_hostname": pa.array(out["child_hostname"], pa.string()),
        "parent_hostname": pa.array(out["parent_hostname"], pa.string()),
        "child_kind": pa.array(out["child_kind"], pa.string()),
    }
    if evidence:
        t["attach_evidence"] = pa.array(out["attach_evidence"], pa.string())
    return pa.table(t)


def build_edges_interleaved(interleaved_ds, batch_size: int = 64,
                            evidence: bool = False):
    """Interleaved docs → EDGE_SCHEMA Dataset, shuffle-free fast path.

    ``evidence=True`` appends the ``attach_evidence`` debug column (§2.10
    trace parity — see ``build_doc_tree``); the default path is untouched.
    """
    if evidence:
        return interleaved_ds.map_batches(
            lambda b: _batch_edges(b, True),
            batch_format="pyarrow", batch_size=batch_size)
    return interleaved_ds.map_batches(
        _interleaved_batch_edges, batch_format="pyarrow", batch_size=batch_size)


def tree_stats_interleaved(interleaved_ds, batch_size: int = 64):
    """Per-doc tree stats straight off the interleaved rows — zero shuffle —
    including ``n_dropped_orphans``, the A5 orphan-cap drop count the edge
    table cannot carry (SURVEY §2.5 'no silent caps'; reference cap at
    har2tree.py:722-732).  Docs that hit the cap are also logged."""
    import logging

    log = logging.getLogger("har2tree_ray.tree")

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {"doc_id": [], "n_nodes": [], "tree_depth": [],
               "n_redirect_edges": [], "n_external_edges": [],
               "n_fallback_edges": [], "n_dropped_orphans": []}
        for did, spans in zip(ids, spans_col):
            edges, dropped = doc_edges_and_drops(spans)
            if not edges:
                continue
            if dropped:
                log.warning("doc %s: %d orphans dropped beyond the %d cap",
                            did, dropped, ORPHAN_CAP)
            out["doc_id"].append(did)
            out["n_nodes"].append(len(edges))
            out["tree_depth"].append(max(e["depth"] for e in edges))
            out["n_redirect_edges"].append(
                sum(e["attach_rule"] == "redirect" for e in edges))
            out["n_external_edges"].append(
                sum(e["attach_rule"].startswith("external_") for e in edges))
            out["n_fallback_edges"].append(
                sum(e["attach_rule"].startswith("fallback_") for e in edges))
            out["n_dropped_orphans"].append(dropped)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "n_nodes": pa.array(out["n_nodes"], pa.int64()),
            "tree_depth": pa.array(out["tree_depth"], pa.int64()),
            "n_redirect_edges": pa.array(out["n_redirect_edges"], pa.int64()),
            "n_external_edges": pa.array(out["n_external_edges"], pa.int64()),
            "n_fallback_edges": pa.array(out["n_fallback_edges"], pa.int64()),
            "n_dropped_orphans": pa.array(out["n_dropped_orphans"], pa.int64()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def tree_stats(edges_ds):
    """Per-doc tree stats from the edge table (recast of Har2Tree.stats'
    tree-shape fields — har2tree.py:504-528): depth, node count, per-rule
    counts.

    Batch-local pandas pre-aggregation → native Sum/Max shuffle (a
    map_groups over every doc pays per-group dispatch for tens of thousands
    of tiny groups; the partial/combine plan shuffles one partial row per
    (doc, batch) instead)."""
    from ray.data.aggregate import Max, Sum

    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        rule = t["attach_rule"]
        sel = pa.table({
            "doc_id": t["doc_id"],
            "depth": t["depth"],
            "is_redirect": pc.cast(pc.equal(rule, "redirect"), pa.int64()),
            "is_external": pc.cast(pc.starts_with(rule, "external_"), pa.int64()),
            "is_fallback": pc.cast(pc.starts_with(rule, "fallback_"), pa.int64()),
        })
        g = sel.group_by("doc_id").aggregate(
            [("doc_id", "count"), ("depth", "max"), ("is_redirect", "sum"),
             ("is_external", "sum"), ("is_fallback", "sum")]
        )
        return g.rename_columns(["doc_id", "n", "d", "r", "e", "f"])

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(edges_ds.map_batches(partial, batch_format="pyarrow"))
    agg = partials.groupby("doc_id").aggregate(
        Sum("n", alias_name="n_nodes"),
        Max("d", alias_name="tree_depth"),
        Sum("r", alias_name="n_redirect_edges"),
        Sum("e", alias_name="n_external_edges"),
        Sum("f", alias_name="n_fallback_edges"),
    )

    def cast(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t["doc_id"],
            "n_nodes": pc.cast(t["n_nodes"], pa.int64()),
            "tree_depth": pc.cast(t["tree_depth"], pa.int64()),
            "n_redirect_edges": pc.cast(t["n_redirect_edges"], pa.int64()),
            "n_external_edges": pc.cast(t["n_external_edges"], pa.int64()),
            "n_fallback_edges": pc.cast(t["n_fallback_edges"], pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow")
