"""Readers.

The engine's primary source is the interleaved text+media document table
(Lance in the north star; this environment has no Lance bindings, so the
on-disk format is Parquet with the identical Arrow schema — the reader is
the single place that would switch to ``ray.data.read_lance``).

Reference counterparts: S1/S4 HAR + multi-file capture loaders
(/root/reference/har2tree/har2tree.py:108-119, parser.py:30-41).  Broken
files there are logged and skipped; here unreadable fragments surface as Ray
task retries, and per-row validity is a column, never an exception.
"""

from __future__ import annotations

import ray.data as rd

from ..synth import ensure_interleaved


def read_interleaved(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read (synthesizing on first use) the interleaved table for a tier.

    ``columns`` prunes at the read (parquet column projection).  The default
    is ``(doc_id, spans)`` — NOT the full schema — so the sidecar payload
    columns (downloaded blob, rendered html) never leave storage unless a
    pipeline asks for them explicitly (doc_sidecars passes its own list).
    """
    path = ensure_interleaved(sf_dir)
    return rd.read_parquet(path, columns=columns or ["doc_id", "spans"])


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one of the driver-provided parquet tables (documents, embeddings,
    events, lineitem, ...) with column pruning."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
