"""Execution utilities: salted aggregation, coalesce."""

import pandas as pd


def test_salted_groupby_sum_matches_direct():
    import ray.data as rd

    from har2tree_ray.util import salted_groupby_sum
    from tests.oracle_utils import canon, to_pandas

    # one pathologically hot key + a long tail
    rows = [{"k": "hot", "v": i} for i in range(5000)]
    rows += [{"k": f"cold{i}", "v": i} for i in range(200)]
    ds = rd.from_items(rows)
    got = canon(to_pandas(salted_groupby_sum(ds, ["k"], ["v"], salt_buckets=8)))
    df = pd.DataFrame(rows)
    want = canon(df.groupby("k", as_index=False)["v"].sum())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_task_concurrency_coerces_tuple():
    """Actor-pool-era (min, max) tuples become the task cap; None → no kwarg
    (plain-function map_batches rejects tuple concurrency)."""
    from har2tree_ray.util import task_concurrency

    assert task_concurrency(None) == {}
    assert task_concurrency(4) == {"concurrency": 4}
    assert task_concurrency((2, 8)) == {"concurrency": 8}


def test_worker_stage_cache_bounded():
    """Per-execution ObjectRef keys must not grow the memo unboundedly."""
    from har2tree_ray import util

    class Stage:
        def __init__(self, tag):
            self.tag = tag

        def __call__(self, batch):
            return batch

    before = len(util._WORKER_STAGE_CACHE)
    for i in range(util._WORKER_STAGE_CACHE_MAX * 2):
        util.worker_cached_stage(Stage, i, cache_key=f"k{i}")({"x": [1]})
    assert len(util._WORKER_STAGE_CACHE) <= util._WORKER_STAGE_CACHE_MAX
    assert len(util._WORKER_STAGE_CACHE) >= min(
        util._WORKER_STAGE_CACHE_MAX, before + 1)
