"""Broadcast hash-join rollup vs relational oracle."""

from tests.oracle_utils import assert_matches_oracle


def test_orders_by_nation():
    assert_matches_oracle("orders_by_nation", "/root/testdata/sf0.001")


def test_hash_join_inner_semantics():
    """Shuffle hash join: inner semantics with duplicate keys (cartesian
    within key) and unmatched rows dropped, regardless of partition count."""
    import pandas as pd
    import ray.data as rd

    from har2tree_ray.util import hash_join

    left = rd.from_items([{"k": 1, "a": "x"}, {"k": 1, "a": "y"},
                          {"k": 2, "a": "z"}, {"k": 9, "a": "w"}])
    right = rd.from_items([{"r": 1, "b": 10}, {"r": 1, "b": 20},
                           {"r": 2, "b": 30}, {"r": 7, "b": 40}])
    out = hash_join(left, right, "k", "r", n_parts=5).to_pandas()
    got = sorted(map(tuple, out[["k", "a", "b"]].itertuples(index=False)))
    assert got == [(1, "x", 10), (1, "x", 20), (1, "y", 10), (1, "y", 20),
                   (2, "z", 30)]


def test_hash_join_keys_above_2pow53_stay_integral():
    """The typed-null union makes every column nullable; a whole-group
    pandas conversion would coerce int64 keys to float64, which is exact
    only below 2^53.  Keys that differ only beyond float64 precision must
    still join distinctly and round-trip bit-exact."""
    import ray.data as rd

    from har2tree_ray.util import hash_join

    k1, k2 = (1 << 60) + 1, (1 << 60) + 2  # identical after float64 rounding
    left = rd.from_items([{"k": k1, "a": "one"}, {"k": k2, "a": "two"}])
    right = rd.from_items([{"r": k1, "b": 111}, {"r": k2, "b": 222}])
    out = hash_join(left, right, "k", "r", n_parts=3).to_pandas()
    assert out["k"].dtype.kind == "i" and out["b"].dtype.kind == "i"
    got = sorted(map(tuple, out[["k", "a", "b"]].itertuples(index=False)))
    assert got == [(k1, "one", 111), (k2, "two", 222)]


def test_oracle_parity_revenue():
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle("revenue_by_month", "/root/testdata/sf0.001")


def test_orders_by_nation_size_routes():
    """Both routes — broadcast searchsorted probe and hash_join shuffle —
    must produce identical rollups; broadcast_max=0 forces the shuffle
    route (customer row count from parquet metadata exceeds 0)."""
    import pandas as pd

    from har2tree_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"

    def canon(d):
        return (d[sorted(d.columns)]
                .sort_values(by=sorted(d.columns), kind="mergesort")
                .reset_index(drop=True))

    bc = canon(relational.orders_by_nation(sf).to_pandas())
    hj = canon(relational.orders_by_nation(sf, broadcast_max=0).to_pandas())
    pd.testing.assert_frame_equal(bc, hj, check_dtype=False)
    assert_matches_oracle("orders_by_nation", sf)
