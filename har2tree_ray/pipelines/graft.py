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


def _doc_chain(df: pd.DataFrame) -> list[str]:
    """Offset-ordered redirect-chain URLs for one doc's flat spans."""
    df = df.sort_values("offset", kind="mergesort")
    urls = df["media_ref"].tolist()
    redirects = df["redirect_url"].tolist()
    # first span with a min offset is the chain start
    by_url_first: dict[str, int] = {}
    for i, u in enumerate(urls):
        by_url_first.setdefault(u, i)
    chain = [urls[0]]
    cur = 0
    for _ in range(MAX_HOPS):
        target = redirects[cur]
        if not target or target not in by_url_first:
            break
        nxt = by_url_first[target]
        if nxt <= cur:  # forward-only scan (har2tree.py:268-302); no cycles
            break
        chain.append(urls[nxt])
        cur = nxt
    return chain


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


def doc_summaries_interleaved(interleaved_ds, batch_size: int = 64):
    """Zero-shuffle doc summaries straight off the doc-grouped interleaved
    rows (chain walk + root referer per row)."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {"doc_id": [], "root_url": [], "landing_url": [], "root_referer": []}
        for did, spans in zip(ids, spans_col):
            spans = sorted(spans, key=lambda s: s["offset"])
            urls = [s["media_ref"] for s in spans]
            redirects = [
                parse.first(parse.RE_REDIRECT, s["text"])
                if "@redirect=" in s["text"] else "" for s in spans]
            by_url_first: dict[str, int] = {}
            for i, u in enumerate(urls):
                by_url_first.setdefault(u, i)
            chain = [urls[0]]
            cur = 0
            for _ in range(MAX_HOPS):
                target = redirects[cur]
                if not target or target not in by_url_first:
                    break
                nxt = by_url_first[target]
                if nxt <= cur:
                    break
                chain.append(urls[nxt])
                cur = nxt
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


def _graft_from_summaries(summaries):
    def per_capture(df: pd.DataFrame) -> pd.DataFrame:
        cap = df["capture_id"].iloc[0]
        df = df.sort_values("doc_id", kind="mergesort")
        landings = {r.doc_id: (r.root_url, r.landing_url)
                    for r in df.itertuples(index=False)}
        rows = []
        for r in df.itertuples(index=False):
            ref = r.root_referer
            parent, attach_url = "", ""
            if ref:
                for cand in sorted(landings):
                    if cand == r.doc_id:
                        continue
                    root_url, land = landings[cand]
                    if ref in (land, root_url):
                        parent, attach_url = cand, ref
                        break
            rows.append({"capture_id": cap, "child_doc": r.doc_id,
                         "parent_doc": parent, "attach_url": attach_url})
        return pd.DataFrame(rows)

    return summaries.groupby("capture_id").map_groups(
        per_capture, batch_format="pandas")
