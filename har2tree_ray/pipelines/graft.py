"""Capture-level tree graft + redirect-chain resolution.

* ``redirect_chain`` / ``landing`` — the initial redirect chain walk and
  final-redirect resolution (J10/J11 — /root/reference/har2tree/
  har2tree.py:198-221,268-302): per document, follow ``@redirect`` targets
  from the root span; the landing URL is the last hop.  SQL-checkable
  (recursive CTE in the oracle).
* ``graft_edges`` — the CrawledTree forest join (J9 — parser.py:43-72):
  within a capture, a document whose root ``@referer`` equals another
  document's landing URL (or root URL) is grafted under it.  The only
  inter-document join in the reference; here a ``groupby(capture_id)``
  co-partition — captures are small (1-4 docs), so the group state is tiny.

``capture_id`` is the doc_id prefix before the last '.' (synth convention
``cap<idx>.<j>`` — the capture_uuid analog).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MAX_HOPS = 16


import re as _re

_ORIGIN_RE = _re.compile(r"^(https?://[^/?#]+)")


def _walk_chain(urls: list[str], redirects: list[str]) -> list[str]:
    """Offset-ordered redirect-chain walk over parallel (url, target) lists;
    forward-only scan (har2tree.py:268-302), no cycles, ≤ MAX_HOPS.
    Path-absolute targets (``/p/q.html`` — M21) resolve against the current
    hop's origin, mirroring the SQL oracle's CASE rewrite."""
    by_url_first: dict[str, int] = {}
    for i, u in enumerate(urls):
        by_url_first.setdefault(u, i)
    chain = [urls[0]]
    cur = 0
    for _ in range(MAX_HOPS):
        target = redirects[cur]
        if (target and target not in by_url_first
                and target.startswith("/") and not target.startswith("//")):
            m = _ORIGIN_RE.match(urls[cur])
            if m:
                target = m.group(1) + target
        if not target or target not in by_url_first:
            break
        nxt = by_url_first[target]
        if nxt <= cur:
            break
        chain.append(urls[nxt])
        cur = nxt
    return chain


def _doc_chain(df: pd.DataFrame) -> list[str]:
    """Offset-ordered redirect-chain URLs for one doc's flat spans."""
    df = df.sort_values("offset", kind="mergesort")
    return _walk_chain(df["media_ref"].tolist(), df["redirect_url"].tolist())


def _row_chain(spans: list[dict]) -> tuple[list[dict], list[str]]:
    """One interleaved row's spans → (offset-sorted spans, chain urls)."""
    from ..functions import parse

    spans = sorted(spans, key=lambda s: s["offset"])
    urls = [s["media_ref"] for s in spans]
    redirects = [parse.first(parse.RE_REDIRECT, s["text"])
                 if "@redirect=" in s["text"] else "" for s in spans]
    return spans, _walk_chain(urls, redirects)


def redirect_chain(parsed_ds):
    """Per-doc chain hops: (doc_id, hop, url)."""

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        chain = _doc_chain(df)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].iloc[0],
                "hop": pd.array(range(len(chain)), dtype="int64"),
                "url": chain,
            }
        )

    slim = parsed_ds.select_columns(["doc_id", "offset", "media_ref", "redirect_url"])
    return slim.groupby("doc_id").map_groups(per_doc, batch_format="pandas")


def landing(parsed_ds):
    """Per-doc final redirect: (doc_id, root_url, landing_url, n_hops)."""

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        chain = _doc_chain(df)
        return pd.DataFrame(
            [{
                "doc_id": df["doc_id"].iloc[0],
                "root_url": chain[0],
                "landing_url": chain[-1],
                "n_hops": len(chain) - 1,
            }]
        )

    slim = parsed_ds.select_columns(["doc_id", "offset", "media_ref", "redirect_url"])
    return slim.groupby("doc_id").map_groups(per_doc, batch_format="pandas")


def redirect_chain_interleaved(interleaved_ds, batch_size: int = 256):
    """Zero-shuffle per-doc chain hops (doc_id, hop, url) straight off the
    doc-grouped interleaved rows — no doc-keyed groupby at any scale."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out_doc, out_hop, out_url = [], [], []
        for did, spans in zip(ids, spans_col):
            if not spans:  # empty capture (e.g. a HAR with no entries)
                continue
            _, chain = _row_chain(spans)
            out_doc.extend([did] * len(chain))
            out_hop.extend(range(len(chain)))
            out_url.extend(chain)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.string()),
            "hop": pa.array(out_hop, pa.int64()),
            "url": pa.array(out_url, pa.string()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def landing_interleaved(interleaved_ds, batch_size: int = 256):
    """Zero-shuffle per-doc final redirect
    (doc_id, root_url, landing_url, n_hops)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {"doc_id": [], "root_url": [], "landing_url": [], "n_hops": []}
        for did, spans in zip(ids, spans_col):
            if not spans:
                continue
            _, chain = _row_chain(spans)
            out["doc_id"].append(did)
            out["root_url"].append(chain[0])
            out["landing_url"].append(chain[-1])
            out["n_hops"].append(len(chain) - 1)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "root_url": pa.array(out["root_url"], pa.string()),
            "landing_url": pa.array(out["landing_url"], pa.string()),
            "n_hops": pa.array(out["n_hops"], pa.int64()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def resolve_final_redirect(urls: list[str], lr: str) -> tuple[str, bool]:
    """The reference's progressive address-bar-URL search
    (``_search_final_redirect``, har2tree.py:198-222): scan entry URLs in
    order for an exact match or a ``lr + '?'`` prefix match; on failure
    strip the fragment, then the query, and retry.  Returns (final URL —
    the matched span URL, or the last stripped candidate on failure,
    resolved?)."""
    while True:
        for u in urls:
            if u == lr:
                return lr, True
            if u.startswith(lr + "?"):
                return u, True
        if "#" in lr:
            lr = lr.split("#", 1)[0]
        elif "?" in lr:
            lr = lr.split("?", 1)[0]
        else:
            return lr, False


def landing_validated(interleaved_ds, batch_size: int = 256):
    """J10 sidecar validation: per doc with a ``last_redirect`` sidecar,
    resolve the address-bar URL against the doc's span URLs
    (offset-ordered, unquote_plus'd — har2tree.py:127-140,198-222).
    Zero-shuffle: the sidecar column and spans share the interleaved row.

    (doc_id, last_redirect, final_url, resolved).  The engine unquotes
    span URLs for real-HAR parity; the SQL oracle compares raw — equal on
    the synth vocabulary (escape-free URLs), documented like posted_data."""
    from urllib.parse import unquote_plus

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        lrs = batch["last_redirect"].to_pylist()
        out = {"doc_id": [], "last_redirect": [], "final_url": [],
               "resolved": []}
        for did, spans, lr in zip(ids, spans_col, lrs):
            if lr is None or not spans:
                continue
            ordered = sorted(spans, key=lambda s: s["offset"])
            urls = [unquote_plus(s["media_ref"]) for s in ordered
                    if s["media_ref"]]
            final, ok = resolve_final_redirect(urls, lr)
            out["doc_id"].append(did)
            out["last_redirect"].append(lr)
            out["final_url"].append(final)
            out["resolved"].append(ok)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "last_redirect": pa.array(out["last_redirect"], pa.string()),
            "final_url": pa.array(out["final_url"], pa.string()),
            "resolved": pa.array(out["resolved"], pa.bool_()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def add_capture_id(ds):
    def f(t: pa.Table) -> pa.Table:
        cap = pc.replace_substring_regex(t["doc_id"], r"\.\d+$", "")
        return t.append_column("capture_id", cap)

    return ds.map_batches(f, batch_format="pyarrow")


def doc_summaries(parsed_ds):
    """Per-doc (capture_id, doc_id, root_url, landing_url, root_referer) —
    the graft join's entire state, one row per document.  Pre-aggregated
    BEFORE the capture shuffle: only these summary rows cross the exchange,
    never the spans (combiner-before-groupby, SURVEY §4)."""

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        chain = _doc_chain(df)
        root = df.sort_values("offset", kind="mergesort").iloc[0]
        return pd.DataFrame([{
            "doc_id": df["doc_id"].iloc[0],
            "root_url": chain[0],
            "landing_url": chain[-1],
            "root_referer": root["referer"],
        }])

    slim = parsed_ds.select_columns(
        ["doc_id", "offset", "media_ref", "redirect_url", "referer"])
    return add_capture_id(slim.groupby("doc_id").map_groups(
        per_doc, batch_format="pandas"))


def doc_summaries_interleaved(interleaved_ds, batch_size: int = 256):
    """Zero-shuffle doc summaries straight off the doc-grouped interleaved
    rows (chain walk + root referer per row)."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {"doc_id": [], "root_url": [], "landing_url": [], "root_referer": []}
        for did, spans in zip(ids, spans_col):
            if not spans:
                continue
            spans, chain = _row_chain(spans)
            t0 = spans[0]["text"]
            out["doc_id"].append(did)
            out["root_url"].append(chain[0])
            out["landing_url"].append(chain[-1])
            out["root_referer"].append(
                parse.first(parse.RE_REFERER, t0) if "@referer=" in t0 else "")
        return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})

    return add_capture_id(interleaved_ds.map_batches(
        per_batch, batch_format="pyarrow", batch_size=batch_size))


def graft_edges(parsed_ds):
    """Capture forest join → (capture_id, child_doc, parent_doc, attach_url).

    A child tree attaches to the parent whose landing (or root) URL equals
    the child's root referer; unmatched docs get parent_doc = '' (forest
    roots), mirroring find_parents/join_trees (parser.py:43-72).

    Two-level plan: per-doc summaries (doc-keyed groupby over spans) → tiny
    capture-keyed shuffle of one row per doc → per-capture join.
    """
    return _graft_from_summaries(doc_summaries(parsed_ds))


def graft_edges_interleaved(interleaved_ds):
    """Same join, zero-shuffle summaries: the only exchange moves ONE summary
    row per document (the combiner-before-shuffle plan at its extreme)."""
    return _graft_from_summaries(doc_summaries_interleaved(interleaved_ds))


def _graft_from_summaries(summaries, n_parts: int | None = None):
    """Per-capture forest join without per-capture dispatch: captures are
    co-located by a COARSE hash-range of capture_id (``n_parts`` groups, not
    one Ray group per capture — ~8k tiny pandas dispatches at sf0.1 cost
    more than the join itself), and the join inside each group is one
    vectorized pandas merge.  ``n_parts`` defaults to cluster width ×8 so a
    group's summary rows (one per doc) stay far below a worker's heap.

    Parent semantics preserved exactly: the parent is the MIN doc_id in the
    capture (≠ child) whose landing OR root URL equals the child's root
    referer (the reference scans candidates in sorted order and takes the
    first match — parser.py:43-72)."""
    import numpy as np

    if n_parts is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_parts = max(64, cpus * 8)

    def add_part(t: pa.Table) -> pa.Table:
        from ..util import key_partition_ids

        return t.append_column(
            "cap_part", pa.array(key_partition_ids(t["capture_id"], n_parts)))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cands = pd.concat([
            df[["capture_id", "doc_id", "landing_url"]]
            .rename(columns={"landing_url": "url"}),
            df[["capture_id", "doc_id", "root_url"]]
            .rename(columns={"root_url": "url"}),
        ])
        ch = df[df["root_referer"] != ""]
        m = ch[["capture_id", "doc_id", "root_referer"]].merge(
            cands, left_on=["capture_id", "root_referer"],
            right_on=["capture_id", "url"], suffixes=("", "_p"))
        m = m[m["doc_id_p"] != m["doc_id"]]
        best = m.groupby("doc_id")["doc_id_p"].min()
        out = df[["capture_id", "doc_id"]].copy()
        out["parent_doc"] = out["doc_id"].map(best).fillna("")
        out["attach_url"] = np.where(
            out["parent_doc"] != "",
            out["doc_id"].map(df.set_index("doc_id")["root_referer"]), "")
        out = out.rename(columns={"doc_id": "child_doc"})
        return out.sort_values(["capture_id", "child_doc"],
                               kind="mergesort").reset_index(drop=True)

    from ..util import pre_shuffle_coalesce

    # summaries arrive as hundreds of tiny per-task blocks; coalesce to
    # cluster width before the sort-based shuffle (tiny-block bookkeeping
    # dominated the round-1 9 s graft_edges measurement)
    parts = pre_shuffle_coalesce(
        summaries.map_batches(add_part, batch_format="pyarrow"))
    return parts.groupby("cap_part").map_groups(per_part, batch_format="pandas")
