"""Arrow schemas for the engine.

The authoritative input shape (BASELINE.json ``input_hint``) is a Lance/Parquet
table of interleaved text+media documents::

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

This replaces the reference's HAR-dict data model (one JSON per capture,
entries sorted by ``startedDateTime`` — /root/reference/har2tree/har2tree.py:108-183).
``offset`` is the per-document order key; spans may be stored in any physical
order inside the list and must be re-sorted by ``offset`` per document
(reference: entry sort, har2tree/har2tree.py:181-183).

Everything downstream is a *flat* columnar table keyed by ``(doc_id, offset)``
— trees are edge tables, not object graphs (SURVEY.md §1.4).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

INTERLEAVED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        # S2 sidecar columns — the recast of the reference's per-capture
        # sidecar files (<stem>.data downloaded blob, .data.filename,
        # rendered .html — /root/reference/har2tree/har2tree.py:158-179):
        # nullable document-level columns instead of extra files.
        pa.field("downloaded_filename", pa.string()),
        pa.field("downloaded_b64", pa.string()),
        pa.field("rendered_html", pa.string()),
        # <stem>.last_redirect.txt — the address-bar URL at capture end
        # (har2tree.py:127-140); validated against span URLs by
        # pipelines.graft.landing_validated (J10, har2tree.py:198-222).
        pa.field("last_redirect", pa.string()),
        # <stem>.cookies.json — the browser's final cookie jar at capture
        # end (har2tree.py:142-148), kept as the raw JSON array string.
        # Drives the reference's D4 set algebra (locally_created /
        # locally_created_not_sent — har2tree.py:362-387) in
        # pipelines.webmeta.cookies_locally_created.
        pa.field("cookies_json", pa.string()),
    ]
)

# Flattened + normalized span table (output of stages.normalize).
# One row per span; mirrors URLNode feature extraction
# (/root/reference/har2tree/nodes.py:172-641) on the recast vocabulary.
FLAT_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("text", pa.string()),
        pa.field("scheme", pa.string()),
        pa.field("hostname", pa.string()),
        pa.field("filename", pa.string()),
        pa.field("name", pa.string()),          # unquote_plus(media_ref) — nodes.py:176
        pa.field("url_nofrag", pa.string()),    # fragment-stripped — nodes.py:220
        pa.field("is_ip", pa.bool_()),          # nodes.py:233-238
        pa.field("idna_hostname", pa.string()),  # nodes.py:240-247 ('' if same)
        pa.field("status", pa.int32()),
        pa.field("lat", pa.float64()),
        pa.field("lng", pa.float64()),
        pa.field("text_len", pa.int64()),
        pa.field("body_hash", pa.string()),     # sha256 hex of text — nodes.py:555 analog
        pa.field("duration_ms", pa.int64()),    # M8 entry duration (@dur=, 0 if absent)
        pa.field("empty_response", pa.bool_()),  # M16 empty-body flag (nodes.py:545-553)
    ]
)

# URL-tree edge table — a tree is rows sharing doc_id (SURVEY.md §1.4).
EDGE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("child_offset", pa.int32()),
        pa.field("parent_offset", pa.int32()),  # -1 for the root
        pa.field("attach_rule", pa.string()),
        pa.field("depth", pa.int32()),
    ]
)

# Hostname-tree edge table (level-wise host grouping of the URL tree —
# /root/reference/har2tree/har2tree.py:680-708).
HOST_EDGE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("host_level", pa.int32()),
        pa.field("hostname", pa.string()),
        pa.field("parent_level", pa.int32()),
        pa.field("parent_hostname", pa.string()),
        pa.field("n_urls", pa.int64()),
    ]
)

TILE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("res", pa.int32()),
        pa.field("cell_x", pa.int64()),
        pa.field("cell_y", pa.int64()),
        pa.field("cell_id", pa.int64()),
        pa.field("parent_cell_id", pa.int64()),
    ]
)
