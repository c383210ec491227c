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


def graft_edges(parsed_ds):
    """Capture forest join → (capture_id, child_doc, parent_doc, attach_url).

    A child tree attaches to the parent whose landing (or root) URL equals
    the child's root referer; unmatched docs get parent_doc = '' (forest
    roots), mirroring find_parents/join_trees (parser.py:43-72).
    """
    slim = parsed_ds.select_columns(
        ["doc_id", "offset", "media_ref", "redirect_url", "referer"]
    )
    slim = add_capture_id(slim)

    def per_capture(df: pd.DataFrame) -> pd.DataFrame:
        cap = df["capture_id"].iloc[0]
        rows = []
        landings: dict[str, tuple[str, str]] = {}  # doc -> (root_url, landing)
        root_ref: dict[str, str] = {}
        for doc_id, g in df.groupby("doc_id", sort=True):
            chain = _doc_chain(g)
            landings[doc_id] = (chain[0], chain[-1])
            root = g.sort_values("offset", kind="mergesort").iloc[0]
            root_ref[doc_id] = root["referer"]
        for doc_id in sorted(landings):
            ref = root_ref[doc_id]
            parent, attach_url = "", ""
            if ref:
                for cand in sorted(landings):
                    if cand == doc_id:
                        continue
                    root_url, land = landings[cand]
                    if ref in (land, root_url):
                        parent, attach_url = cand, ref
                        break
            rows.append(
                {"capture_id": cap, "child_doc": doc_id,
                 "parent_doc": parent, "attach_url": attach_url}
            )
        return pd.DataFrame(rows)

    return slim.groupby("capture_id").map_groups(per_capture, batch_format="pandas")
