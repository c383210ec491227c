"""Small execution utilities shared by the pipelines."""

from __future__ import annotations

from collections import OrderedDict


def pre_shuffle_coalesce(ds, blocks: int | None = None):
    """Coalesce a pre-aggregated partials Dataset to ~cluster-width blocks
    before a groupby.

    Batch-local pre-aggregation leaves one small partial block per input
    block; a sort-based shuffle then pays per-block overhead on hundreds of
    tiny blocks (measured: a 23 MB partials table across 240 blocks spent
    7 of 9 seconds on sort bookkeeping).  Coalescing to one block per CPU
    keeps the shuffle overhead proportional to the cluster, not to the
    input block count.  On a multi-node cluster the CPU count scales with
    the cluster, so this stays a cluster-width coalesce, never a driver
    bottleneck."""
    if blocks is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        blocks = max(8, cpus)
    return ds.repartition(blocks)


#: per-worker-process instance memo for ``worker_cached_stage`` — Ray reuses
#: worker processes across tasks and datasets, so an entry built for one
#: query execution is warm for the next.  Bounded LRU: stages keyed on a
#: per-execution ObjectRef (e.g. CoveringIndex's broadcast boxes) mint a NEW
#: key every execution, and without eviction a long-lived worker would
#: accumulate one dead compiled index per past query until OOM.
_WORKER_STAGE_CACHE = OrderedDict()
_WORKER_STAGE_CACHE_MAX = 32


def task_concurrency(concurrency) -> dict:
    """``concurrency`` kwargs for a map_batches over a PLAIN FUNCTION stage.

    Ray Data rejects the actor-pool tuple form ``(min, max)`` for non-class
    callables; callers that held a tuple from the actor-pool era get its
    upper bound as the task cap.  None → no kwarg (Ray sizes to the
    cluster)."""
    if concurrency is None:
        return {}
    if isinstance(concurrency, tuple):
        concurrency = concurrency[1]
    return {"concurrency": concurrency}


def worker_cached_stage(cls, *args, cache_key=None, **kwargs):
    """Deploy a callable-class stage as plain TASKS with a per-worker
    instance memo instead of an actor pool.

    The actor-pool contract (build state in ``__init__``, use it per
    ``__call__``) is right when setup is genuinely heavy — a model, a
    codec (``media.MediaDecoder`` keeps it when a real codec is
    importable).  But for cheap-to-build state
    (compiled regexes, a small randn matrix, a broadcast-side index) the
    pool's spin-up cost dominates: cpus//2 fresh actor processes per
    Dataset execution measured 3-6 s, paid again by EVERY query, while
    plain tasks run on Ray's long-lived reusable workers.  This wrapper
    keeps the setup-once property — the instance is built on first use per
    worker process and memoized — with zero spin-up.  State must be
    deterministic from the constructor args (same key ⇒ interchangeable
    instance on any worker).

    ``cache_key`` overrides the memo key when an arg is unhashable or
    identity-ambiguous (e.g. pass the hex of an ObjectRef)."""
    key = (cls.__module__, cls.__qualname__,
           cache_key if cache_key is not None
           else (args, tuple(sorted(kwargs.items()))))

    def stage(batch):
        inst = _WORKER_STAGE_CACHE.get(key)
        if inst is None:
            inst = _WORKER_STAGE_CACHE[key] = cls(*args, **kwargs)
            while len(_WORKER_STAGE_CACHE) > _WORKER_STAGE_CACHE_MAX:
                _WORKER_STAGE_CACHE.popitem(last=False)
        else:
            _WORKER_STAGE_CACHE.move_to_end(key)
        return inst(batch)

    return stage


def key_partition_ids(col, n_parts: int):
    """Vectorized deterministic partition ids for a (non-null) key column.

    Integers hash with one numpy multiplicative-hash pass; strings
    dictionary-encode per chunk and crc32 ONLY the uniques (keys repeat
    heavily in partial tables — the per-row Python crc32 loop this replaces
    was the dominant cost of host_edges at sf0.1).  Partition choice only
    affects co-location, never results, so the two families need not agree."""
    import zlib

    import numpy as np
    import pyarrow as pa

    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return (((v * np.uint64(2654435761)) % np.uint64(1 << 32))
                % np.uint64(n_parts)).astype(np.int32)
    out = np.empty(len(col), dtype=np.int32)
    pos = 0
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for ch in chunks:
        enc = ch.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        h = np.fromiter((zlib.crc32(str(u).encode("utf-8")) for u in uniq),
                        dtype=np.int64, count=len(uniq)) % n_parts
        if len(ch):
            idx = enc.indices.to_numpy(zero_copy_only=False)
            out[pos:pos + len(ch)] = h[idx]
        pos += len(ch)
    return out


def user_range_groupby(ds, per_range, key: str = "user_id",
                       n_parts: int | None = None,
                       batch_format: str = "pandas"):
    """One coarse hash-range shuffle for per-KEY logic over NUMEROUS keys.

    ``groupby(key).map_groups(fn)`` dispatches one Python call per key —
    fine for dozens of keys, hostile for user-scale cardinality.  This
    shuffles ONCE on ``key_partition_ids(key) % n_parts`` (every key's rows
    land in exactly one range) and calls ``per_range`` once per range with
    ALL its keys' rows; ``per_range`` must therefore handle multiple keys
    in a vectorized pass (grouped cumsum / hash group-by, never a per-key
    loop).  n_parts defaults to cluster width — scale with the cluster."""
    import pyarrow as pa

    if n_parts is None:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        n_parts = max(8, cpus)

    def add_part(t: pa.Table) -> pa.Table:
        gp = key_partition_ids(t[key], n_parts)
        return t.append_column("_kpart", pa.array(gp))

    def run(chunk):
        out = per_range(chunk.drop(columns=["_kpart"])
                        if hasattr(chunk, "drop") else chunk.drop_columns(["_kpart"]))
        return out

    parts = pre_shuffle_coalesce(ds.map_batches(add_part, batch_format="pyarrow"))
    return parts.groupby("_kpart").map_groups(run, batch_format=batch_format)


def hash_join(left_ds, right_ds, left_on: str, right_on: str,
              n_parts: int | None = None):
    """Distributed equi-join of two LARGE tables on int64 keys — the shuffle
    join the broadcast pattern can't cover when neither side fits a worker.

    Plan: tag each side, schema-harmonize with typed nulls, co-partition
    BOTH sides on a multiplicative hash range of the key, and merge
    batch-locally (vectorized pandas) inside each range group — one
    sort-based exchange total, group size O((|L|+|R|) / n_parts) with
    ``n_parts`` scaling with cluster width.  Pre-project both sides to the
    columns the consumer needs before calling (the join moves every
    surviving column once)."""
    import numpy as np
    import pyarrow as pa

    if n_parts is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_parts = max(64, cpus * 8)

    lschema, rschema = left_ds.schema(), right_ds.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    if set(lcols) & set(rcols):
        raise ValueError("hash_join requires disjoint column names")
    types = {**dict(zip(lschema.names, lschema.types)),
             **dict(zip(rschema.names, rschema.types))}

    def tag(side: int, key: str, missing: list[str]):
        def f(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
            # Knuth multiplicative hash: uniform ranges even for
            # sequential keys
            part = ((k * np.uint64(2654435761)) % np.uint64(1 << 32)
                    ) % np.uint64(n_parts)
            t = t.append_column("_part", pa.array(part.astype(np.int32)))
            t = t.append_column("_side", pa.array(
                np.full(t.num_rows, side, dtype=np.int8)))
            for c in missing:
                t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
            return t.select(["_part", "_side"] + lcols + rcols)

        return f

    both = (left_ds.map_batches(tag(0, left_on, rcols), batch_format="pyarrow")
            .union(right_ds.map_batches(tag(1, right_on, lcols),
                                        batch_format="pyarrow")))

    # Split the sides IN ARROW before any pandas conversion: the typed-null
    # union makes every column nullable, and a whole-group to_pandas would
    # coerce int64 keys/values to float64 (exact only below 2^53 — silent
    # key collisions at scale).  Filtering on _side first leaves each side's
    # own columns null-free, so they stay int64 through the merge.
    out_schema = pa.schema([(c, types[c]) for c in lcols + rcols])

    def per_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        l = t.filter(pc.equal(t["_side"], 0)).select(lcols).to_pandas()
        r = t.filter(pc.equal(t["_side"], 1)).select(rcols).to_pandas()
        merged = l.merge(r, left_on=left_on, right_on=right_on, how="inner")
        return pa.Table.from_pandas(merged[lcols + rcols], schema=out_schema,
                                    preserve_index=False)

    return pre_shuffle_coalesce(both).groupby("_part").map_groups(
        per_part, batch_format="pyarrow")


def salted_groupby_sum(ds, key_cols: list[str], sum_cols: list[str],
                       salt_buckets: int = 16):
    """Two-stage salted sum for skewed keys (SURVEY §4 hot-host handling).

    Stage 1 groups on (keys + salt) so one hot key's rows land on
    ``salt_buckets`` reducers instead of one; stage 2 merges the per-salt
    partials on the bare keys (tiny input: ≤ salt_buckets rows per key).
    The salt is derived from a row counter, so it is deterministic per
    block but irrelevant to the result — sums are associative."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def add_salt(t: pa.Table) -> pa.Table:
        salt = np.arange(t.num_rows, dtype=np.int64) % salt_buckets
        return t.append_column("_salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    stage1 = salted.groupby(key_cols + ["_salt"]).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols])
    stage2 = stage1.drop_columns(["_salt"]).groupby(key_cols).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols])
    return stage2


def default_n_parts(minimum: int = 8) -> int:
    """Cluster-width default for coarse hash-range shuffles: one range per
    CPU (multi-node: scales with the cluster), floored at ``minimum`` so
    tiny local sessions still spread skew."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(minimum, cpus)
