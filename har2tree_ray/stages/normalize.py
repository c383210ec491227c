"""Flatten + normalize the interleaved table → flat span table.

Stage A of the engine lifecycle (SURVEY.md §3.1): a stateless
``map_batches(..., batch_format="pyarrow")`` transform.  List flattening and
struct-field access are zero-copy pyarrow kernels; the URL split and
directive scans are compiled-regex / stdlib scalar UDFs over the batch
(the reference's M3-M11, M13, M16-M17, M26-M27 — SURVEY.md §2.2).

Cross-document independence means this stage never needs a shuffle; it
streams block-by-block with backpressure.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import parse, urls
from ..schema import FLAT_SPAN_SCHEMA


def flatten_normalize(batch: pa.Table) -> pa.Table:
    """interleaved (doc_id, spans) batch → FLAT_SPAN_SCHEMA batch."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent_idx = pc.list_parent_indices(spans)
    doc_id = pc.take(batch.column("doc_id"), parent_idx)
    flat = pc.list_flatten(spans)
    kind = pc.struct_field(flat, "kind")
    text = pc.struct_field(flat, "text")
    media_ref = pc.struct_field(flat, "media_ref")
    offset = pc.struct_field(flat, "offset")

    refs = media_ref.to_pylist()
    texts = text.to_pylist()
    n = len(refs)
    scheme = [""] * n
    hostname = [""] * n
    filename = [""] * n
    name = [""] * n
    nofrag = [""] * n
    is_ip = [False] * n
    idna = [""] * n
    status = [200] * n
    lat = [0.0] * n
    lng = [0.0] * n
    bhash = [""] * n
    for i in range(n):
        u = refs[i]
        s, h, f = urls.split_url(u)
        scheme[i], hostname[i], filename[i] = s, h, f
        name[i] = urls.unquote_name(u)
        nofrag[i] = urls.strip_fragment(u)
        is_ip[i] = urls.is_ip_hostname(h)
        idna[i] = urls.idna_decode(h)
        t = texts[i]
        status[i] = parse.parse_status(t)
        lat[i], lng[i] = parse.parse_geo(t)
        bhash[i] = hashlib.sha256(t.encode("utf-8")).hexdigest()

    return pa.table(
        {
            "doc_id": doc_id,
            "offset": offset,
            "kind": kind,
            "media_ref": media_ref,
            "text": text,
            "scheme": pa.array(scheme, pa.string()),
            "hostname": pa.array(hostname, pa.string()),
            "filename": pa.array(filename, pa.string()),
            "name": pa.array(name, pa.string()),
            "url_nofrag": pa.array(nofrag, pa.string()),
            "is_ip": pa.array(is_ip, pa.bool_()),
            "idna_hostname": pa.array(idna, pa.string()),
            "status": pa.array(status, pa.int32()),
            "lat": pa.array(lat, pa.float64()),
            "lng": pa.array(lng, pa.float64()),
            "text_len": pc.cast(pc.utf8_length(text), pa.int64()),
            "body_hash": pa.array(bhash, pa.string()),
            # M8 duration + M16 empty-body flag — pure Arrow kernels
            "duration_ms": pc.fill_null(pc.cast(pc.struct_field(
                pc.extract_regex(text, r"@dur=(?P<d>\d+)"), "d"), pa.int64()), 0),
            "empty_response": pc.match_substring_regex(text, r"^@geo=\S+$"),
        },
        schema=FLAT_SPAN_SCHEMA,
    )


def flat_spans(interleaved_ds, drop_text: bool = False):
    """Dataset of interleaved docs → Dataset of flat normalized spans."""
    ds = interleaved_ds.map_batches(flatten_normalize, batch_format="pyarrow")
    if drop_text:
        ds = ds.drop_columns(["text"])
    return ds


_HOST_RE = r"^https?://(?P<host>[^/?#]+)"


def _flat_base(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent_idx = pc.list_parent_indices(spans)
    doc_id = pc.take(batch.column("doc_id"), parent_idx)
    flat = pc.list_flatten(spans)
    return pa.table({
        "doc_id": doc_id,
        "offset": pc.struct_field(flat, "offset"),
        "kind": pc.struct_field(flat, "kind"),
        "media_ref": pc.struct_field(flat, "media_ref"),
        "text": pc.struct_field(flat, "text"),
    })


def explode_spans(interleaved_ds, columns: list[str]):
    """Column-pruned span explode — the cheap sibling of ``flat_spans`` for
    pipelines that need only a couple of derived fields.  The flatten and
    the ``hostname`` derivation are pure Arrow kernels (zero Python rows);
    ``lat``/``lng``/``body_hash`` run their scalar UDF only when requested.

    Supported columns: doc_id, offset, kind, media_ref, text, hostname,
    status, lat, lng, body_hash.
    """
    want = set(columns)

    def per_batch(batch: pa.Table) -> pa.Table:
        base = _flat_base(batch)
        out: dict[str, pa.Array | pa.ChunkedArray] = {}
        for c in ("doc_id", "offset", "kind", "media_ref", "text"):
            if c in want:
                out[c] = base[c]
        if "status" in want:
            # same semantics as parse.parse_status: missing/unparsable → 200
            m = pc.extract_regex(base["text"], r"@status=(?P<st>-?\d+)")
            out["status"] = pc.fill_null(
                pc.cast(pc.struct_field(m, "st"), pa.int32()), 200)
        if "hostname" in want:
            # same definition the oracle uses (and urlparse agrees with on
            # http(s) URLs): netloc of an http(s) ref, else ''
            m = pc.extract_regex(base["media_ref"], _HOST_RE)
            out["hostname"] = pc.fill_null(pc.struct_field(m, "host"), "")
        if "lat" in want or "lng" in want:
            # vectorized: Arrow C++ regex + cast, no Python row loop.  The
            # cast parses decimal text to the same IEEE double as float().
            m = pc.extract_regex(base["text"],
                                 r"@geo=(?P<glat>-?\d+\.\d+),(?P<glng>-?\d+\.\d+)")
            if "lat" in want:
                out["lat"] = pc.fill_null(
                    pc.cast(pc.struct_field(m, "glat"), pa.float64()), 0.0)
            if "lng" in want:
                out["lng"] = pc.fill_null(
                    pc.cast(pc.struct_field(m, "glng"), pa.float64()), 0.0)
        if "body_hash" in want:
            texts = base["text"].to_pylist()
            out["body_hash"] = pa.array(
                [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts],
                pa.string())
        return pa.table({c: out[c] for c in columns})

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow")
