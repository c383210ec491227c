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
