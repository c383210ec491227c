"""Driver-style DuckDB oracle parity at sf0.001 for every SQL-checkable query."""

import pytest

from .oracle_utils import assert_matches_oracle

SQL_CHECKED = [
    "flatten_spans",
    "doc_stats",
    "doc_durations",
    "kind_rollup",
    "span_dedup",
    "tile_assign",
    "tile_rollup",
    "tile_vectorize",
    "tile_pyramid",
    "tile_neighbor_density",
    "tile_compact",
    "tile_outline",
    "tile_zorder",
    "tile_rasterize",
    "tile_share",
    "range_join",
    "host_rank",
    "redirect_chain",
    "landing",
    "host_rollup",
    "cookie_events",
    "cookie_asof",
    "cookies_never_sent",
    "cookies_locally_created",
    "knn_referrer",
    "pip_media_in_host",
    "pip_media_outside_host",
    "doc_trajectory",
    "host_topk_urls",
    "inverted_index",
    "tile_zonal_stats",
    "host_triangles",
    "tile_host_hll",
    "host_clustering",
    "event_running_total",
    "doc_chunk",
    "host_boxes",
    "host_octagon",
    "nn_media_host",
    "boundary_overlap",
    "grid_dbscan",
    "doc_bm25",
    "event_window_distinct",
    "tile_topk_hosts",
    "host_reciprocity",
    "event_burst_windows",
    "trajectory_od",
    "tile_hhi",
    "event_topk_users",
    "tile_morans",
    "event_rfm",
    "host_assortativity",
    "doc_term_cooccur",
    "event_session_histogram",
    "rendered_urls_canonical",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_parity(name):
    assert_matches_oracle(name, "/root/testdata/sf0.001")


def test_fast_paths_match_shuffle_paths():
    """Zero-shuffle interleaved implementations must equal the general
    flat+groupby implementations row-for-row."""
    import pandas as pd

    from har2tree_ray.pipelines import cookies, hosttree, spatial
    from har2tree_ray.sources.interleaved import read_interleaved
    from har2tree_ray.stages.normalize import flat_spans
    from tests.oracle_utils import canon, cookie_asof_flat_oracle, to_pandas

    sf = "/root/testdata/sf0.001"
    inter = read_interleaved(sf)
    flat = flat_spans(read_interleaved(sf))
    pairs = [
        (hosttree.host_rollup_interleaved(inter), hosttree.host_rollup(flat)),
        (cookies.cookie_asof_interleaved(inter),
         cookie_asof_flat_oracle(flat_spans(read_interleaved(sf)))),
        (spatial.knn_referrer_interleaved(inter),
         spatial.knn_referrer(flat_spans(read_interleaved(sf), drop_text=True))),
    ]
    for fast, slow in pairs:
        pd.testing.assert_frame_equal(
            canon(to_pandas(fast)), canon(to_pandas(slow)), check_dtype=False)


def test_graft_fast_path_matches_shuffle_path():
    import pandas as pd

    from har2tree_ray.pipelines import graft
    from har2tree_ray.queries import _parsed_light
    from har2tree_ray.sources.interleaved import read_interleaved
    from tests.oracle_utils import canon, to_pandas

    sf = "/root/testdata/sf0.001"
    fast = canon(to_pandas(graft.graft_edges_interleaved(read_interleaved(sf))))
    slow = canon(to_pandas(graft.graft_edges(_parsed_light(sf))))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_sampling_and_topk_oracle_parity():
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle("doc_sample", "/root/testdata/sf0.001")
    assert_matches_oracle("top_hosts", "/root/testdata/sf0.001")
