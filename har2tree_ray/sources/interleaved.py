"""Readers.

The engine's primary source is the interleaved text+media document table
(Lance in the north star; this environment has no Lance bindings, so the
on-disk format is Parquet with the identical Arrow schema).  ``_read``
routes ``.lance`` paths through ``ray.data.read_lance`` behind an
import-try — the format switch is this one function.

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

    ``columns`` prunes at the read (column projection pushed to storage).
    The default is ``(doc_id, spans)`` — NOT the full schema — so the
    sidecar payload columns (downloaded blob, rendered html) never leave
    storage unless a pipeline asks for them explicitly (doc_sidecars passes
    its own list).

    A ``.lance`` dataset directory routes through ``ray.data.read_lance``
    (the north-star storage format) when the binding is importable; this
    sandbox has no Lance wheel, so the synthesized tier tables are Parquet
    with the identical Arrow schema and take the parquet branch.
    """
    path = ensure_interleaved(sf_dir)
    return _read(path, columns or ["doc_id", "spans"])


def _read(path: str, columns: list[str] | None) -> rd.Dataset:
    if str(path).endswith(".lance"):
        try:
            import lance  # noqa: F401  (optional north-star binding)
        except ImportError as e:
            raise ImportError(
                "Lance dataset given but the 'lance' binding is not "
                "installed in this environment") from e
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one of the driver-provided tables (documents, embeddings,
    events, lineitem, ...) with column pruning; a ``<name>.lance`` dataset
    takes precedence when present (see ``read_interleaved``)."""
    import os

    lance_path = f"{sf_dir}/{name}.lance"
    if os.path.isdir(lance_path):
        return _read(lance_path, columns)
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
