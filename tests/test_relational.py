"""Broadcast hash-join rollup vs relational oracle."""

from tests.oracle_utils import assert_matches_oracle


def test_orders_by_nation():
    assert_matches_oracle("orders_by_nation", "/root/testdata/sf0.001")
