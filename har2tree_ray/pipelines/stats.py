"""Per-document and global span statistics.

Recast of `Har2Tree.stats` (A1 — /root/reference/har2tree/har2tree.py:504-528)
minus the tree-shape fields (depth/redirect-chain live in pipelines.tree,
which needs the edge table).

Scale shape: one interleaved row == one document, so per-document aggregates
are a pure ``map_batches`` — **no shuffle at any scale**.  The global
kind-rollup pre-aggregates inside each batch (partial combine) and only
shuffles the tiny partials (SURVEY.md §4 / ray_guide "Aggregation at scale").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from ..stages.normalize import flatten_normalize


def _doc_stats_batch(batch: pa.Table) -> pa.Table:
    flat = flatten_normalize(batch)
    df = flat.select(
        ["doc_id", "media_ref", "hostname", "status", "text_len", "offset", "text"]
    ).to_pandas()
    df["is_redirect"] = df["text"].str.contains("@redirect=", regex=False)
    g = df.groupby("doc_id", sort=False)
    out = pd.DataFrame(
        {
            "n_spans": g.size(),
            "n_unique_urls": g["media_ref"].nunique(),
            "n_unique_hostnames": g["hostname"].apply(lambda s: s[s != ""].nunique()),
            "n_redirects": g["is_redirect"].sum().astype(np.int64),
            "n_status0": g["status"].apply(lambda s: int((s <= 0).sum())),
            "total_text_chars": g["text_len"].sum(),
            "max_offset": g["offset"].max().astype(np.int64),
        }
    ).reset_index()
    for c in ("n_spans", "n_unique_urls", "n_unique_hostnames", "n_status0"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def doc_stats(interleaved_ds):
    """Per-doc stats — map-only (docs never split across rows)."""
    return interleaved_ds.map_batches(_doc_stats_batch, batch_format="pyarrow")


def _kind_partial(batch: pa.Table) -> pa.Table:
    flat = flatten_normalize(batch)
    t = flat.group_by("kind").aggregate([("text_len", "sum"), ("kind", "count")])
    return t.rename_columns(["kind", "partial_chars", "partial_n"])


def kind_rollup(interleaved_ds):
    """Global per-kind rollup: per-batch partial aggregate → tiny shuffle."""
    partials = interleaved_ds.map_batches(_kind_partial, batch_format="pyarrow")
    out = partials.groupby("kind").aggregate(
        Sum("partial_n", alias_name="n_spans"),
        Sum("partial_chars", alias_name="total_text_chars"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "kind": t["kind"],
                "n_spans": pc.cast(t["n_spans"], pa.int64()),
                "total_text_chars": pc.cast(t["total_text_chars"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
