"""Driver-style DuckDB oracle parity at sf0.001 for every SQL-checkable query."""

import pytest

from .oracle_utils import assert_matches_oracle

SQL_CHECKED = [
    "flatten_spans",
    "doc_stats",
    "kind_rollup",
    "span_dedup",
    "tile_assign",
    "tile_rollup",
    "tile_vectorize",
    "redirect_chain",
    "landing",
    "host_rollup",
    "cookie_events",
    "cookie_asof",
    "knn_referrer",
    "pip_media_in_host",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_parity(name):
    assert_matches_oracle(name, "/root/testdata/sf0.001")
