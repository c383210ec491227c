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

    The span table is the engine's compute-carrying source (parse +
    cascade run over it), so the small-input block override keeps a floor
    of one block per cluster CPU — bytes say "few blocks" at small tiers,
    but the per-row work still wants every core (see ``_auto_blocks``).
    """
    path = ensure_interleaved(sf_dir)
    return _read(path, columns or ["doc_id", "spans"],
                 min_blocks=_span_block_floor(path))


# Blocks under this size carry too little cascade work to amortize task
# dispatch, so the straggler-overlap headroom below is byte-gated at half
# the target block size (_TARGET_BLOCK_BYTES below): 2x headroom only when
# the doubled split still yields >= 4 MB per block (~0.1-0.3 s of cascade
# compute each).
_MIN_COMPUTE_BLOCK_BYTES = 4 << 20


def _span_block_floor(path: str) -> int:
    """Block floor for the compute-carrying span read: one block per CPU
    slot, with 2x straggler-overlap headroom (Ray's own default ratio)
    ONLY when the bytes keep each block above _MIN_COMPUTE_BLOCK_BYTES.
    Measured at sf0.5/32 CPUs: 2x headroom cuts `edges` 7.2 -> 6.2 s
    (pair efficiency 0.68 -> 0.81) because with exactly one block per slot
    the slowest task gates the stage; at sf0.1 the same 2x floor REGRESSES
    (64 near-empty 125 KB blocks: edges 1.5 -> 1.8 s), hence the byte gate.
    Env knob GRAFT_READ_BLOCKS_PER_CPU forces the factor for A/B runs."""
    import os

    cpus = _cluster_cpus()
    forced = os.environ.get("GRAFT_READ_BLOCKS_PER_CPU")
    if forced:
        try:
            return cpus * max(1, int(forced))
        except ValueError:
            pass
    total = _total_bytes(path)
    if total is not None and total >= 2 * cpus * _MIN_COMPUTE_BLOCK_BYTES:
        return cpus * 2
    return cpus


# Small-input read sizing.  Ray's default read split floors the task count
# at ~2 x cluster CPUs regardless of input size, so a 600 KB single-file
# table fans out into 64 near-empty read tasks whose dispatch overhead
# dominates the query (measured at sf0.1: a trivial read+map over
# documents.parquet runs 1.2-2.7 s at 64 blocks vs 0.21 s at 1 block).
# _auto_blocks overrides the split ONLY when the input is small enough that
# the default split would produce blocks under the target size; for big
# inputs it returns None and Ray's own splitting (which is correct at
# scale — far MORE blocks than CPU slots, for pipelining and spill) is
# untouched, so the override is self-disabling at 100 TB.  Sizes come from
# local stat; non-local paths (s3://...) skip the probe and keep defaults.
_TARGET_BLOCK_BYTES = 8 << 20
# kill switch (A/B harness + escape hatch): when False, every read keeps
# Ray's default split exactly as before this optimization
AUTO_BLOCKS_ENABLED = True


def _cluster_cpus() -> int:
    import ray

    try:
        return max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _total_bytes(path: str) -> int | None:
    import os

    try:
        if os.path.isdir(path):
            return sum(e.stat().st_size for e in os.scandir(path)
                       if e.name.endswith(".parquet"))
        return os.path.getsize(path)
    except OSError:
        return None


def _auto_blocks(path: str, min_blocks: int = 1) -> int | None:
    import math

    if not AUTO_BLOCKS_ENABLED:
        return None
    default_split = 2 * _cluster_cpus()
    total = _total_bytes(path)
    if total is None or total >= _TARGET_BLOCK_BYTES * default_split:
        return None  # big (or unprobeable) input: Ray's default split wins
    return max(min_blocks,
               min(default_split, math.ceil(total / _TARGET_BLOCK_BYTES)))


def _read(path: str, columns: list[str] | None,
          min_blocks: int = 1) -> rd.Dataset:
    if str(path).endswith(".lance"):
        try:
            import lance  # noqa: F401  (optional north-star binding)
        except ImportError as e:
            raise ImportError(
                "Lance dataset given but the 'lance' binding is not "
                "installed in this environment") from e
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=_auto_blocks(path, min_blocks))


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               min_blocks: int = 1) -> rd.Dataset:
    """Read one of the driver-provided tables (documents, embeddings,
    events, lineitem, ...) with column pruning; a ``<name>.lance`` dataset
    takes precedence when present (see ``read_interleaved``).

    ``min_blocks`` is the compute hint for small-byte inputs whose per-row
    work is heavy (shingle hashing, embedding matmuls): it floors the
    size-based split so those stages keep their parallelism even when the
    bytes alone would say one block."""
    import os

    lance_path = f"{sf_dir}/{name}.lance"
    if os.path.isdir(lance_path):
        return _read(lance_path, columns, min_blocks)
    return _read(f"{sf_dir}/{name}.parquet", columns, min_blocks)
