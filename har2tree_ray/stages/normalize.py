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


_HTTP_PARTS = r"^(?P<scheme>https?)://(?P<host>[^/?#]+)(?P<path>[^?#]*)"


def _scalar_fallback(values, mask: pa.Array, fn):
    """Apply scalar ``fn`` only to the rows flagged by ``mask`` (boolean
    Arrow array), replacing them in ``values`` — the rare-row escape hatch
    that keeps the batch path on Arrow kernels."""
    import numpy as np

    m = mask.to_numpy(zero_copy_only=False)
    if not m.any():
        return values
    idx = np.flatnonzero(m)
    src = values.take(pa.array(idx))
    repl = pa.array([fn(v) for v in src.to_pylist()], values.type)
    return pc.replace_with_mask(values, mask, repl)


def flatten_normalize(batch: pa.Table) -> pa.Table:
    """interleaved (doc_id, spans) batch → FLAT_SPAN_SCHEMA batch.

    All per-span derivations run as Arrow C++ kernels; Python scalar UDFs
    run only behind rarity guards (non-http(s) schemes for the URL split,
    ``%``/``+`` for unquote, ``:``/leading-digit hostnames for the IP
    check, ``xn--`` for IDNA) — differential-tested against the scalar
    functions they replace (tests/test_normalize_vectorized.py)."""
    import numpy as np

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
    n = len(media_ref)

    # --- URL split (M5): http(s) fast path in one extract_regex ---
    parts = pc.extract_regex(media_ref, _HTTP_PARTS)
    scheme = pc.fill_null(pc.struct_field(parts, "scheme"), "")
    hostname = pc.fill_null(pc.struct_field(parts, "host"), "")
    path = pc.struct_field(parts, "path")
    base = pc.struct_field(pc.extract_regex(path, r"/(?P<fn>[^/]*)$"), "fn")
    filename = pc.if_else(
        pc.is_valid(parts),
        pc.if_else(pc.equal(pc.fill_null(base, ""), ""), "file.bin", pc.fill_null(base, "")),
        "")
    # non-http(s), non-empty refs (file:/blob:/data:/odd/relative) take the
    # scalar split — rare by construction in web corpora
    fb = pc.and_(pc.is_null(parts), pc.not_equal(media_ref, ""))
    fbm = fb.to_numpy(zero_copy_only=False)
    if fbm.any():
        idx = np.flatnonzero(fbm)
        trip = [urls.split_url(u)
                for u in media_ref.take(pa.array(idx)).to_pylist()]
        scheme = pc.replace_with_mask(
            scheme, fb, pa.array([t[0] for t in trip], pa.string()))
        hostname = pc.replace_with_mask(
            hostname, fb, pa.array([t[1] for t in trip], pa.string()))
        filename = pc.replace_with_mask(
            filename, fb, pa.array([t[2] for t in trip], pa.string()))

    # --- display name (M4): identity unless quoted chars present ---
    name = _scalar_fallback(
        media_ref,
        pc.or_(pc.match_substring(media_ref, "%"),
               pc.match_substring(media_ref, "+")),
        urls.unquote_name)

    # --- fragment strip (M6): pure kernel, '#'-free rows pass through ---
    nofrag = pc.struct_field(
        pc.extract_regex(media_ref, r"^(?P<nf>[^#]*)"), "nf")

    # --- IP hostname (M9): only ':'-bearing or digit-leading candidates ---
    ip_cand = pc.or_(pc.match_substring(hostname, ":"),
                     pc.match_substring_regex(hostname, r"^[0-9]"))
    is_ip_np = np.zeros(n, dtype=bool)
    cm = ip_cand.to_numpy(zero_copy_only=False)
    if cm.any():
        idx = np.flatnonzero(cm)
        checks = [urls.is_ip_hostname(h)
                  for h in hostname.take(pa.array(idx)).to_pylist()]
        is_ip_np[idx] = checks
    is_ip = pa.array(is_ip_np)

    # --- IDNA (M10): only 'xn--' hostnames ---
    idna = pc.if_else(pc.match_substring(hostname, "xn--"), hostname, "")
    idna = _scalar_fallback(idna, pc.not_equal(idna, ""), urls.idna_decode)

    # --- body hash (M17): sha256 is C either way; straight comprehension ---
    bhash = pa.array(
        [hashlib.sha256(t.encode("utf-8")).hexdigest()
         for t in text.to_pylist()], pa.string())

    geo = pc.extract_regex(
        text, r"@geo=(?P<glat>-?\d+\.\d+),(?P<glng>-?\d+\.\d+)")
    return pa.table(
        {
            "doc_id": doc_id,
            "offset": offset,
            "kind": kind,
            "media_ref": media_ref,
            "text": text,
            "scheme": scheme,
            "hostname": hostname,
            "filename": filename,
            "name": name,
            "url_nofrag": nofrag,
            "is_ip": is_ip,
            "idna_hostname": idna,
            # same semantics as parse.parse_status: missing/unparsable → 200
            "status": pc.fill_null(pc.cast(pc.struct_field(
                pc.extract_regex(text, r"@status=(?P<st>-?\d+)"), "st"),
                pa.int32()), 200),
            "lat": pc.fill_null(
                pc.cast(pc.struct_field(geo, "glat"), pa.float64()), 0.0),
            "lng": pc.fill_null(
                pc.cast(pc.struct_field(geo, "glng"), pa.float64()), 0.0),
            "text_len": pc.cast(pc.utf8_length(text), pa.int64()),
            "body_hash": bhash,
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
