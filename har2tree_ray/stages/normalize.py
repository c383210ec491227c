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
        },
        schema=FLAT_SPAN_SCHEMA,
    )


def flat_spans(interleaved_ds, drop_text: bool = False):
    """Dataset of interleaved docs → Dataset of flat normalized spans."""
    ds = interleaved_ds.map_batches(flatten_normalize, batch_format="pyarrow")
    if drop_text:
        ds = ds.drop_columns(["text"])
    return ds
