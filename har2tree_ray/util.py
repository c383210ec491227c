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
