"""Hostname tree — level-wise group-by-hostname projection of the URL tree.

Recast of ``make_hostname_tree`` (/root/reference/har2tree/har2tree.py:
680-708) and the HostNode rollups (A3 — nodes.py:735-760,802-835).

Engine semantics (documented recast): a host node is the pair
``(host_level, hostname)`` where ``host_level`` is the URL-tree depth; a
host edge exists for every distinct ``(parent host node → child host node)``
pair observed among URL edges, with ``n_urls`` = number of URL nodes that
contributed.  This keeps the projection a *pure aggregation over the edge
table* — no object graph, derivable by groupby alone.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum



def host_edges(edges_ds):
    """URL-edge Dataset → HOST_EDGE_SCHEMA Dataset.

    (doc_id, hosts) composite keys are mostly UNIQUE (a handful of edges
    per key), so a native 5-key aggregate pays sort/merge bookkeeping on
    near-singleton groups (measured 17.6 s → ~3 s at sf0.1).  ONE fused
    map_batches builds the in-batch partials AND their partition key
    (vectorized — dictionary-encode + crc32-of-uniques via
    ``util.key_partition_ids``, replacing the per-row Python crc32 loop
    that dominated this query); the partials shuffle once on
    ``dpart = hash(doc_id) % n_parts`` — every doc entirely inside one
    range — and each range resolves with one Arrow group_by."""
    from ..util import key_partition_ids, pre_shuffle_coalesce

    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    n_parts = max(8, cpus)
    keys = ["doc_id", "host_level", "hostname", "parent_level", "parent_hostname"]

    def project(t: pa.Table) -> pa.Table:
        lvl = pc.cast(t["depth"], pa.int32())
        plvl = pc.cast(pc.subtract(t["depth"], 1), pa.int32())
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "host_level": lvl,
                "hostname": t["child_hostname"],
                "parent_level": plvl,
                "parent_hostname": t["parent_hostname"],
            }
        )
        g = out.group_by(keys).aggregate([("hostname", "count")])
        g = g.rename_columns(keys + ["partial_n"])
        return g.append_column(
            "dpart", pa.array(key_partition_ids(g["doc_id"], n_parts)))

    def per_range(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("partial_n", "sum")])
        return pa.table({**{k: g[k] for k in keys},
                         "n_urls": pc.cast(g["partial_n_sum"], pa.int64())})

    partials = pre_shuffle_coalesce(
        edges_ds.map_batches(project, batch_format="pyarrow"))
    return partials.groupby("dpart").map_groups(per_range, batch_format="pyarrow")


def host_edges_interleaved(interleaved_ds, batch_size: int = 64):
    """Shuffle-free host edges: every HOST_EDGE key contains ``doc_id`` and
    an interleaved row holds a whole document, so the 5-key aggregate
    FINALIZES inside the batch — the ``host_edges()`` exchange exists only
    for flat edge tables that may split a doc across blocks.  One pass:
    cascade + host projection + batch-local group_by (measured 4.1 → ~1.5 s
    at sf0.1; same plan shape as ``host_rollup_interleaved``)."""
    from .tree import doc_edge_rows

    keys = ["doc_id", "host_level", "hostname", "parent_level",
            "parent_hostname"]

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {k: [] for k in keys}
        for did, spans in zip(ids, spans_col):
            for e in doc_edge_rows(spans):
                out["doc_id"].append(did)
                out["host_level"].append(e["depth"])
                out["hostname"].append(e["child_hostname"])
                out["parent_level"].append(e["depth"] - 1)
                out["parent_hostname"].append(e["parent_hostname"])
        t = pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "host_level": pa.array(out["host_level"], pa.int32()),
            "hostname": pa.array(out["hostname"], pa.string()),
            "parent_level": pa.array(out["parent_level"], pa.int32()),
            "parent_hostname": pa.array(out["parent_hostname"], pa.string()),
        })
        g = t.group_by(keys).aggregate([("hostname", "count")])
        g = g.rename_columns(keys + ["n_urls"])
        return pa.table({**{k: g[k] for k in keys},
                         "n_urls": pc.cast(g["n_urls"], pa.int64())})

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def host_rollup_interleaved(interleaved_ds, batch_size: int = 64):
    """Shuffle-free host rollup: the (doc, hostname) key is doc-local, and
    interleaved rows already hold whole documents — aggregate inside the
    batch, emit final rows directly.  Keep ``host_rollup`` for flat inputs."""
    from ..functions import parse
    from ..functions.urls import split_url

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        cols: dict[str, list] = {k: [] for k in [
            "doc_id", "hostname", "n_spans", "n_unique_urls", "n_status0",
            "has_document", "min_offset"]}
        for did, spans in zip(ids, spans_col):
            agg: dict[str, list] = {}
            for s in spans:
                _, host, _ = split_url(s["media_ref"])
                if not host:
                    continue
                a = agg.get(host)
                if a is None:
                    a = agg[host] = [0, set(), 0, False, s["offset"]]
                a[0] += 1
                a[1].add(s["media_ref"])
                if parse.parse_status(s["text"]) <= 0:
                    a[2] += 1
                if s["kind"] == "document":
                    a[3] = True
                if s["offset"] < a[4]:
                    a[4] = s["offset"]
            for host, a in agg.items():
                cols["doc_id"].append(did)
                cols["hostname"].append(host)
                cols["n_spans"].append(a[0])
                cols["n_unique_urls"].append(len(a[1]))
                cols["n_status0"].append(a[2])
                cols["has_document"].append(a[3])
                cols["min_offset"].append(a[4])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "hostname": pa.array(cols["hostname"], pa.string()),
            "n_spans": pa.array(cols["n_spans"], pa.int64()),
            "n_unique_urls": pa.array(cols["n_unique_urls"], pa.int64()),
            "n_status0": pa.array(cols["n_status0"], pa.int64()),
            "has_document": pa.array(cols["has_document"], pa.bool_()),
            "min_offset": pa.array(cols["min_offset"], pa.int64()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


def host_rollup(flat_ds):
    """Per-(doc, hostname) rollups over spans (A3 recast, SQL-checkable):
    url counts, distinct urls, status-0 count, container presence, min
    offset.  Pure partial-agg → groupby; no tree needed."""

    def partial(t: pa.Table) -> pa.Table:
        sel = pa.table(
            {
                "doc_id": t["doc_id"],
                "hostname": t["hostname"],
                "media_ref": t["media_ref"],
                "is0": pc.cast(pc.less_equal(t["status"], 0), pa.int64()),
                "is_doc": pc.cast(pc.equal(t["kind"], "document"), pa.int64()),
                "offset": pc.cast(t["offset"], pa.int64()),
            }
        )
        sel = sel.filter(pc.not_equal(sel["hostname"], ""))
        g = sel.group_by(["doc_id", "hostname", "media_ref"]).aggregate(
            [("is0", "sum"), ("is_doc", "sum"), ("offset", "min"), ("media_ref", "count")]
        )
        return g.rename_columns(
            ["doc_id", "hostname", "media_ref", "n_status0", "n_doc", "min_off", "n"]
        )

    partials = flat_ds.map_batches(partial, batch_format="pyarrow")

    # shuffle 1 (native vectorized aggregate — NOT map_groups; per-group
    # Python dispatch over 100k+ tiny groups was the dominant cost):
    # one row per (doc, host, url)
    from ray.data.aggregate import Min as AggMin
    per_url = partials.groupby(["doc_id", "hostname", "media_ref"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("n_status0", alias_name="n_status0"),
        Sum("n_doc", alias_name="n_doc"),
        AggMin("min_off", alias_name="min_off"),
    )

    def partial2(t: pa.Table) -> pa.Table:
        # local pre-agg to (doc, host); each (doc,host,url) row is globally
        # unique after shuffle 1, so a row count = distinct-url count
        g = t.group_by(["doc_id", "hostname"]).aggregate(
            [("n", "sum"), ("media_ref", "count"), ("n_status0", "sum"),
             ("n_doc", "sum"), ("min_off", "min")]
        )
        return g.rename_columns(
            ["doc_id", "hostname", "n_spans", "n_urls", "n_status0", "n_doc", "min_off"]
        )

    p2 = per_url.map_batches(partial2, batch_format="pyarrow")
    agg = p2.groupby(["doc_id", "hostname"]).aggregate(
        Sum("n_spans", alias_name="n_spans"),
        Sum("n_urls", alias_name="n_unique_urls"),
        Sum("n_status0", alias_name="n_status0"),
        Sum("n_doc", alias_name="n_doc"),
        AggMin("min_off", alias_name="min_offset"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "hostname": t["hostname"],
                "n_spans": pc.cast(t["n_spans"], pa.int64()),
                "n_unique_urls": pc.cast(t["n_unique_urls"], pa.int64()),
                "n_status0": pc.cast(t["n_status0"], pa.int64()),
                "has_document": pc.greater(t["n_doc"], 0),
                "min_offset": pc.cast(t["min_offset"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
