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

from ray.data.aggregate import Sum

from ..stages.normalize import _HOST_RE, _flat_base, flatten_normalize


def _doc_stats_batch(batch: pa.Table) -> pa.Table:
    """Pruned + vectorized: Arrow kernels derive only the five fields the
    rollup needs (no sha256/IDNA/unquote of the full ``flatten_normalize``),
    then one pandas groupby with native reductions — no per-group Python."""
    base = _flat_base(batch)
    host_m = pc.extract_regex(base["media_ref"], _HOST_RE)
    status_m = pc.extract_regex(base["text"], r"@status=(?P<st>-?\d+)")
    t = pa.table({
        "doc_id": base["doc_id"],
        "media_ref": base["media_ref"],
        # '' → NaN so nunique(dropna) counts only real hostnames
        "hostname": pc.struct_field(host_m, "host"),
        "is_status0": pc.less_equal(pc.fill_null(
            pc.cast(pc.struct_field(status_m, "st"), pa.int32()), 200), 0),
        "is_redirect": pc.match_substring(base["text"], "@redirect="),
        "text_len": pc.cast(pc.utf8_length(base["text"]), pa.int64()),
        "offset": base["offset"],
    })
    df = t.to_pandas()
    g = df.groupby("doc_id", sort=False)
    out = pd.DataFrame(
        {
            "n_spans": g.size(),
            "n_unique_urls": g["media_ref"].nunique(),
            "n_unique_hostnames": g["hostname"].nunique(),
            "n_redirects": g["is_redirect"].sum().astype(np.int64),
            "n_status0": g["is_status0"].sum().astype(np.int64),
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
    # Arrow-kernel explode of ONLY (kind, text length) — the full-fat
    # flatten_normalize (sha256 body hash, URL split, idna) was 80% waste
    # for a 7-key rollup (4.7 s → 1.5 s at sf0.1)
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    t = pa.table({
        "kind": pc.struct_field(flat, "kind"),
        "text_len": pc.cast(pc.utf8_length(pc.struct_field(flat, "text")),
                            pa.int64()),
    }).group_by("kind").aggregate([("text_len", "sum"), ("kind", "count")])
    return t.rename_columns(["kind", "partial_chars", "partial_n"])


def kind_rollup(interleaved_ds):
    """Global per-kind rollup: per-batch partial aggregate → coalesce →
    tiny shuffle (without the coalesce, the sort-based groupby paid block
    bookkeeping on ~240 seven-row partials — 5.4 s → 1.5 s at sf0.1)."""
    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(
        interleaved_ds.map_batches(_kind_partial, batch_format="pyarrow"))
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


def doc_durations(interleaved_ds):
    """Per-doc duration rollup over the M8 ``@dur`` directive (the
    reference's entry ``time``/timedelta fields, nodes.py:230-231):
    (doc_id, total_ms, max_ms, n_timed).  Pure map — Arrow regex kernel +
    one pandas groupby per batch, no shuffle."""

    def per_batch(batch: pa.Table) -> pa.Table:
        base = _flat_base(batch)
        m = pc.extract_regex(base["text"], r"@dur=(?P<d>\d+)")
        dur = pc.fill_null(pc.cast(pc.struct_field(m, "d"), pa.int64()), -1)
        df = pa.table({"doc_id": base["doc_id"], "dur": dur}).to_pandas()
        timed = df[df["dur"] >= 0]
        g = timed.groupby("doc_id", sort=False)["dur"]
        out = pd.DataFrame({
            "total_ms": g.sum().astype(np.int64),
            "max_ms": g.max().astype(np.int64),
            "n_timed": g.size().astype(np.int64),
        })
        # docs whose spans carry no @dur at all still get a row (zeros)
        all_ids = pd.Index(df["doc_id"].unique(), name="doc_id")
        out = out.reindex(all_ids).fillna(0).astype(np.int64).reset_index()
        return pa.Table.from_pandas(
            out[["doc_id", "total_ms", "max_ms", "n_timed"]],
            preserve_index=False)

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow")


def doc_durations_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), d AS (
    SELECT doc_id,
           TRY_CAST(regexp_extract(s.text, '@dur=(\\d+)', 1) AS BIGINT) AS dur
    FROM ex
)
SELECT doc_id,
       CAST(COALESCE(SUM(dur), 0) AS BIGINT) AS total_ms,
       CAST(COALESCE(MAX(dur), 0) AS BIGINT) AS max_ms,
       CAST(COUNT(dur) AS BIGINT) AS n_timed
FROM d GROUP BY doc_id
"""


def capture_stats(interleaved_ds, n_parts: int | None = None):
    """Per-capture rollup (the CrawledTree analog of A1): docs, spans,
    distinct hostnames.

    Plan: per-doc marker rows (one stats row per doc + one deduped row per
    (doc, host)) → ONE shuffle keyed on a coarse crc32 range of capture_id
    → vectorized pandas rollup per range.  The previous two-stage
    groupby((capture,host)) → groupby(capture) plan sorted ~one marker row
    per span-host through TWO exchanges; (capture, host) pairs are mostly
    unique, so the native-aggregate pre-combine never shrank them
    (same lesson as span_hash_groups)."""
    import zlib

    import pandas as pd
    import pyarrow.compute as pc2

    from ..stages.normalize import _flat_base, _HOST_RE

    if n_parts is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_parts = max(64, cpus * 8)

    def per_doc_partial(batch: pa.Table) -> pa.Table:
        base = _flat_base(batch)
        m = pc2.extract_regex(base["media_ref"], _HOST_RE)
        host = pc2.fill_null(pc2.struct_field(m, "host"), "")
        # marker-row layout so the whole rollup stays in NATIVE aggregates
        # (a map_groups over every capture pays per-group dispatch):
        # one stats row per doc (hostname='') + one row per (doc, host) —
        # built with vectorized pandas ops, no per-span Python loop
        df = pa.table({"doc_id": base["doc_id"], "hostname": host}).to_pandas()
        spans_per_doc = df.groupby("doc_id", sort=False).size()
        stats = pd.DataFrame({
            "doc_id": spans_per_doc.index,
            "hostname": "",
            "n_spans": spans_per_doc.to_numpy(),
            "n_docs": 1,
        })
        hosts = (df[df["hostname"] != ""].drop_duplicates()
                 .assign(n_spans=0, n_docs=0))
        allr = pd.concat([stats, hosts], ignore_index=True)
        allr["capture_id"] = allr["doc_id"].str.replace(
            r"\.\d+$", "", regex=True)
        allr["cap_part"] = [zlib.crc32(c.encode()) % n_parts
                            for c in allr["capture_id"]]
        return pa.table({
            "capture_id": pa.array(allr["capture_id"].tolist(), pa.string()),
            "hostname": pa.array(allr["hostname"].tolist(), pa.string()),
            "n_spans": pa.array(allr["n_spans"].astype(np.int64), pa.int64()),
            "n_docs": pa.array(allr["n_docs"].astype(np.int64), pa.int64()),
            "cap_part": pa.array(allr["cap_part"], pa.int32()),
        })

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        caps = df.groupby("capture_id", sort=False)
        out = pd.DataFrame({
            "n_docs": caps["n_docs"].sum().astype(np.int64),
            "n_spans": caps["n_spans"].sum().astype(np.int64),
        })
        h = df[df["hostname"] != ""].drop_duplicates(["capture_id", "hostname"])
        out["n_hosts"] = (h.groupby("capture_id").size()
                          .reindex(out.index).fillna(0).astype(np.int64))
        return out.reset_index()[["capture_id", "n_docs", "n_spans", "n_hosts"]]

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(
        interleaved_ds.map_batches(per_doc_partial, batch_format="pyarrow"))
    return partials.groupby("cap_part").map_groups(
        per_part, batch_format="pandas")


def capture_stats_sql(flat_path: str) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), f AS (
    SELECT regexp_replace(doc_id, '\\.\\d+$', '') AS capture_id, doc_id,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS hostname
    FROM ex
)
SELECT capture_id,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT CASE WHEN hostname <> '' THEN hostname END) AS BIGINT) AS n_hosts
FROM f GROUP BY capture_id
"""


def doc_sample(interleaved_ds, pct: int = 10):
    """Deterministic hash-based document sample (engine addition — the
    reference has no sampling, SURVEY §2.6): keep docs whose md5(doc_id)
    bucket < pct.  Content-addressed, so the sample is stable across runs
    and partitionings and the SQL oracle reproduces it exactly."""
    import hashlib

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keep = [
            (int(hashlib.md5(d.encode()).hexdigest()[:8], 16) % 100) < pct
            for d in ids
        ]
        return batch.filter(pa.array(keep)).select(["doc_id"])

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow")


def doc_sample_sql(flat_path: str, pct: int = 10) -> str:
    # md5 hex → int via per-nibble ascii arithmetic (DuckDB lacks strtol);
    # ascii('0'..'9')=48..57, ascii('a'..'f')=97..102 → value = a - 48 - 39*(a>=97)
    nib = ("CAST(ascii(substr(h, {i}, 1)) - 48 - 39 * "
           "CAST(ascii(substr(h, {i}, 1)) >= 97 AS INTEGER) AS BIGINT)")
    expr = " + ".join(
        f"{nib.format(i=i)} * CAST({16 ** (8 - i)} AS BIGINT)" for i in range(1, 9))
    return f"""
WITH d AS (
    SELECT DISTINCT doc_id, md5(doc_id) AS h
    FROM read_parquet('{flat_path}/*.parquet')
)
SELECT doc_id FROM d WHERE ({expr}) % 100 < {pct}
"""


def top_hosts(interleaved_ds, k: int = 10):
    """Global top-k hostnames by span count — partial counts per batch →
    tiny groupby merge → driver-side sort of the (bounded) host table.
    Ties broken by hostname ascending (deterministic)."""
    import pyarrow.compute as pc2

    from ray.data.aggregate import Sum

    from ..stages.normalize import _HOST_RE, _flat_base

    def partial(batch: pa.Table) -> pa.Table:
        # media_ref straight off the list column — no doc_id take, no text
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        refs = pc2.struct_field(pc2.list_flatten(spans), "media_ref")
        m = pc2.extract_regex(refs, _HOST_RE)
        host = pc2.fill_null(pc2.struct_field(m, "host"), "")
        t = pa.table({"hostname": host})
        t = t.filter(pc2.not_equal(t["hostname"], ""))
        g = t.group_by("hostname").aggregate([("hostname", "count")])
        return g.rename_columns(["hostname", "part_n"])

    from ..util import pre_shuffle_coalesce

    agg = (pre_shuffle_coalesce(
               interleaved_ds.map_batches(partial, batch_format="pyarrow"))
           .groupby("hostname").aggregate(Sum("part_n", alias_name="n_spans")))
    df = agg.to_pandas()  # bounded: one row per distinct hostname
    df = df.sort_values(["n_spans", "hostname"], ascending=[False, True],
                        kind="mergesort").head(k).reset_index(drop=True)
    df["rank"] = range(1, len(df) + 1)
    df["n_spans"] = df["n_spans"].astype("int64")
    return pa.Table.from_pandas(df[["rank", "hostname", "n_spans"]],
                                preserve_index=False)


def top_hosts_sql(flat_path: str, k: int = 10) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), h AS (
    SELECT regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1) AS hostname
    FROM ex WHERE regexp_matches(s.media_ref, '^https?://')
), c AS (
    SELECT hostname, CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM h GROUP BY hostname
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_spans DESC, hostname) AS BIGINT) AS rank,
       hostname, n_spans
FROM c ORDER BY n_spans DESC, hostname LIMIT {k}
"""


def host_topk_urls(interleaved_ds, k: int = 3, n_parts: int | None = None):
    """Distributed top-k-per-GROUP window: the k most-referenced URLs of
    every hostname (rank by span count, ties by media_ref ascending) — the
    per-key generalization of ``top_hosts``' global top-k.

    Scale shape: per-(host, url) batch-local partial counts (the combiner
    bounds a hot host to its distinct urls per batch) → ONE crc32
    host-range shuffle so every host's rows land in exactly one range →
    per-range vectorized pandas pass (sum, mergesort rank, head-k per
    host).  No per-key dispatch, no global sort; output is k rows per
    hostname regardless of skew."""
    import pyarrow.compute as pc2

    from ..stages.normalize import _HOST_RE
    from ..util import default_n_parts, key_partition_ids, pre_shuffle_coalesce

    if n_parts is None:
        n_parts = default_n_parts()

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        refs = pc2.struct_field(pc2.list_flatten(spans), "media_ref")
        m = pc2.extract_regex(refs, _HOST_RE)
        host = pc2.fill_null(pc2.struct_field(m, "host"), "")
        t = pa.table({"hostname": host, "media_ref": refs})
        t = t.filter(pc2.not_equal(t["hostname"], ""))
        g = t.group_by(["hostname", "media_ref"]).aggregate(
            [("media_ref", "count")])
        g = g.rename_columns(["hostname", "media_ref", "part_n"])
        return g.append_column(
            "gpart", pa.array(key_partition_ids(g["hostname"], n_parts)))

    def per_range(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .groupby(["hostname", "media_ref"], as_index=False)["part_n"].sum()
              .rename(columns={"part_n": "n"}))
        df = df.sort_values(["hostname", "n", "media_ref"],
                            ascending=[True, False, True], kind="mergesort")
        df["rank"] = df.groupby("hostname").cumcount() + 1
        df = df[df["rank"] <= k]
        return pa.table({
            "hostname": pa.array(df["hostname"], pa.string()),
            "rank": pa.array(df["rank"].astype("int64"), pa.int64()),
            "media_ref": pa.array(df["media_ref"], pa.string()),
            "n": pa.array(df["n"].astype("int64"), pa.int64()),
        })

    parts = pre_shuffle_coalesce(
        interleaved_ds.map_batches(partial, batch_format="pyarrow"))
    return parts.groupby("gpart").map_groups(per_range, batch_format="pyarrow")


def host_topk_urls_sql(flat_path: str, k: int = 3) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), h AS (
    SELECT regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1) AS hostname,
           s.media_ref AS media_ref
    FROM ex WHERE regexp_matches(s.media_ref, '^https?://')
), c AS (
    SELECT hostname, media_ref, CAST(COUNT(*) AS BIGINT) AS n
    FROM h WHERE hostname <> '' GROUP BY 1, 2
), r AS (
    SELECT hostname, media_ref, n,
           ROW_NUMBER() OVER (PARTITION BY hostname
                              ORDER BY n DESC, media_ref) AS rank
    FROM c
)
SELECT hostname, CAST(rank AS BIGINT) AS rank, media_ref, n
FROM r WHERE rank <= {k}
"""
