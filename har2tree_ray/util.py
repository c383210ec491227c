"""Small execution utilities shared by the pipelines."""

from __future__ import annotations


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
