import numpy as np

from har2tree_ray import geo


def test_cell_xy_bounds():
    lat = np.array([90.0, -90.0, 0.0, 89.999, -200.0, 200.0])
    lng = np.array([-180.0, 179.999, 0.0, 180.0, -999.0, 999.0])
    ix, iy = geo.cell_xy(lat, lng, 4)
    assert (ix >= 0).all() and (ix <= 15).all()
    assert (iy >= 0).all() and (iy <= 15).all()
    # north pole row 0, south pole bottom row
    assert iy[0] == 0 and iy[1] == 15


def test_cell_id_roundtrip():
    rs = np.random.RandomState(0)
    lat = rs.uniform(-90, 90, 1000)
    lng = rs.uniform(-180, 180, 1000)
    res = 8
    ix, iy = geo.cell_xy(lat, lng, res)
    cid = geo.cell_id(ix, iy, res)
    n = 1 << res
    assert ((cid // n) == iy).all() and ((cid % n) == ix).all()
    pid = geo.parent_cell_id(ix, iy, res)
    assert ((pid // (n // 2)) == iy // 2).all()


def test_parent_contains_child_bounds():
    res = 6
    ix = np.array([10]); iy = np.array([20])
    lo_lng, lo_lat, hi_lng, hi_lat = geo.cell_bounds(ix, iy, res)
    plo_lng, plo_lat, phi_lng, phi_lat = geo.cell_bounds(ix >> 1, iy >> 1, res - 1)
    assert plo_lng <= lo_lng and phi_lng >= hi_lng
    assert plo_lat <= lo_lat and phi_lat >= hi_lat


def test_k_ring_wrap():
    res = 3  # 8x8 grid
    ring = geo.k_ring(0, 4, res, 1)
    xs = {x for x, _ in ring}
    assert 7 in xs and 1 in xs  # wrapped west neighbor
    assert len(ring) == 9
    # lat clamps at the pole
    ring_top = geo.k_ring(3, 0, res, 1)
    assert len(ring_top) == 6


def test_chebyshev_wrap():
    d = geo.chebyshev_cell_distance(
        np.array([0]), np.array([3]), np.array([7]), np.array([3]), 3
    )
    assert d[0] == 1


def test_point_in_polygon_square():
    poly = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    lat = np.array([5.0, 15.0, 5.0])
    lng = np.array([5.0, 5.0, 15.0])
    inside = geo.point_in_polygon(lat, lng, poly)
    assert inside.tolist() == [True, False, False]


def test_point_in_polygon_concave():
    # L-shape: notch excludes (7,7)
    poly = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], dtype=float)
    lat = np.array([2.0, 7.0, 7.0])
    lng = np.array([2.0, 7.0, 2.0])
    inside = geo.point_in_polygon(lat, lng, poly)
    assert inside.tolist() == [True, False, True]


def test_tile_host_kmv_matches_oracle():
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle("tile_host_kmv", "/root/testdata/sf0.001")


def test_kmv_estimator_accuracy():
    """The (k-1)/frac(kth) estimator derived from the sketch rows lands
    within ~3/sqrt(k) of the true distinct count on a synthetic cell —
    the sketch is a usable cardinality primitive, not just stored rows."""
    import hashlib

    import numpy as np

    k = 64  # tighter k for the accuracy check than the engine default
    hosts = [f"host{i}.example" for i in range(5000)]
    hs = sorted(hashlib.md5(h.encode()).hexdigest() for h in hosts)
    kth_frac = int(hs[k - 1], 16) / 16 ** 32
    est = (k - 1) / kth_frac
    assert abs(est - 5000) / 5000 < 3 / np.sqrt(k)
