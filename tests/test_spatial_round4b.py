"""Brute-force unit tests for the round-4 continuation spatial additions:
host_octagon (8-DOP boundary), nn_media_host (nearest-boundary join),
boundary_overlap (box-overlap self-join), grid_dbscan (density clustering).

Each checks against an independent in-process implementation; driver-style
DuckDB parity for the same ops runs in test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
import pandas as pd

from har2tree_ray import geo
from har2tree_ray.pipelines import spatial, tiling
from har2tree_ray.stages.normalize import explode_spans
from har2tree_ray.sources.interleaved import read_interleaved

SF = "/root/testdata/sf0.001"


def _flat(cols):
    return explode_spans(read_interleaved(SF), cols).to_pandas()


def test_host_octagon_matches_bruteforce():
    cols = ["kind", "hostname", "lat", "lng"]
    got = spatial.host_octagon(
        explode_spans(read_interleaved(SF), cols)).to_pandas()
    df = _flat(cols)
    d = df[(df.kind == "document") & (df.hostname != "")].copy()
    d["su"] = d["lat"] + d["lng"]
    d["di"] = d["lat"] - d["lng"]
    want = d.groupby("hostname").agg(
        min_lat=("lat", "min"), max_lat=("lat", "max"),
        min_lng=("lng", "min"), max_lng=("lng", "max"),
        min_sum=("su", "min"), max_sum=("su", "max"),
        min_diff=("di", "min"), max_diff=("di", "max")).reset_index()
    got_s = got.sort_values("hostname").reset_index(drop=True)[want.columns]
    pd.testing.assert_frame_equal(got_s, want, check_dtype=False)
    # the octagon is contained in (and at least as tight as) the bbox
    assert (got_s["min_sum"] >= got_s["min_lat"] + got_s["min_lng"] - 1e-9).all()


def test_nn_media_host_matches_bruteforce():
    cols = ["doc_id", "offset", "kind", "hostname", "lat", "lng"]
    got = spatial.nn_media_host(
        explode_spans(read_interleaved(SF), cols)).to_pandas()
    df = _flat(cols)
    boxes = (df[(df.kind == "document") & (df.hostname != "")]
             .groupby("hostname")
             .agg(min_lat=("lat", "min"), max_lat=("lat", "max"),
                  min_lng=("lng", "min"), max_lng=("lng", "max"))
             .reset_index().sort_values("hostname").reset_index(drop=True))
    for c in ("min_lat", "min_lng"):
        boxes[c] -= spatial.PIP_EPS
    for c in ("max_lat", "max_lng"):
        boxes[c] += spatial.PIP_EPS
    media = df[df.kind.isin(spatial.QUERY_KINDS)].reset_index(drop=True)
    lat, lng = media["lat"].to_numpy(), media["lng"].to_numpy()
    dlat = np.maximum(np.maximum(
        boxes["min_lat"].to_numpy()[None, :] - lat[:, None],
        lat[:, None] - boxes["max_lat"].to_numpy()[None, :]), 0.0)
    dlng = np.maximum(np.maximum(
        boxes["min_lng"].to_numpy()[None, :] - lng[:, None],
        lng[:, None] - boxes["max_lng"].to_numpy()[None, :]), 0.0)
    d2 = dlat * dlat + dlng * dlng
    nn = np.argmin(d2, axis=1)
    want = pd.DataFrame({
        "doc_id": media["doc_id"], "offset": media["offset"],
        "nn_host": boxes["hostname"].to_numpy()[nn],
        "d2": d2[np.arange(len(nn)), nn]})
    key = ["doc_id", "offset"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s[got_s.columns],
                                  check_dtype=False)
    assert (got_s["d2"] == 0).any()   # some media inside a boundary


def test_boundary_overlap_matches_bruteforce():
    cols = ["kind", "hostname", "lat", "lng"]
    got = spatial.boundary_overlap(
        explode_spans(read_interleaved(SF), cols)).to_pandas()
    df = _flat(cols)
    eps = spatial.OV_EPS
    boxes = (df[(df.kind == "document") & (df.hostname != "")]
             .groupby("hostname")
             .agg(min_lat=("lat", "min"), max_lat=("lat", "max"),
                  min_lng=("lng", "min"), max_lng=("lng", "max"))
             .reset_index())
    boxes["min_lat"] -= eps
    boxes["max_lat"] += eps
    boxes["min_lng"] -= eps
    boxes["max_lng"] += eps
    rows = []
    b = boxes.to_dict("records")
    for i in range(len(b)):
        for j in range(i + 1, len(b)):
            a_, b_ = b[i], b[j]
            if a_["hostname"] > b_["hostname"]:
                a_, b_ = b_, a_
            w = min(a_["max_lng"], b_["max_lng"]) - max(a_["min_lng"], b_["min_lng"])
            h = min(a_["max_lat"], b_["max_lat"]) - max(a_["min_lat"], b_["min_lat"])
            if w > 0 and h > 0:
                rows.append({
                    "host_a": a_["hostname"], "host_b": b_["hostname"],
                    "inter_area": w * h,
                    "area_a": (a_["max_lng"] - a_["min_lng"]) * (a_["max_lat"] - a_["min_lat"]),
                    "area_b": (b_["max_lng"] - b_["min_lng"]) * (b_["max_lat"] - b_["min_lat"])})
    want = pd.DataFrame(rows)
    key = ["host_a", "host_b"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    # report-once dedup: every intersecting pair appears exactly once
    assert not got_s.duplicated(key).any()
    pd.testing.assert_frame_equal(got_s, want_s[got_s.columns],
                                  check_dtype=False)


def test_grid_dbscan_matches_bfs_bruteforce():
    cols = ["lat", "lng"]
    res = tiling.DEFAULT_RES
    got = tiling.grid_dbscan(
        explode_spans(read_interleaved(SF), cols), res).to_pandas()
    df = _flat(cols)
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    cid = geo.cell_id(ix, iy, res)
    uniq, counts = np.unique(cid, return_counts=True)
    core = {int(c): int(k) for c, k in zip(uniq, counts)
            if k >= tiling.DBSCAN_MINPTS}
    n = 1 << res
    # BFS connected components over 8-connectivity with lng wrap
    label = {}
    for start in sorted(core):
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            c = stack.pop()
            comp.append(c)
            x, y = c % n, c // n
            for dy in (-1, 0, 1):
                yy = y + dy
                if yy < 0 or yy >= n:
                    continue
                for dx in (-1, 0, 1):
                    nb = yy * n + (x + dx) % n
                    if nb in core and nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
        m = min(comp)
        for c in comp:
            label[c] = m
    want = pd.DataFrame({
        "cell_id": sorted(core),
        "cluster_id": [label[c] for c in sorted(core)],
        "n_spans": [core[c] for c in sorted(core)]})
    got_s = got.sort_values("cell_id").reset_index(drop=True)
    assert len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[want.columns], want, check_dtype=False)
    # at least one multi-cell cluster exercises the union path
    assert (got_s.groupby("cluster_id").size() > 1).any()


def test_grid_dbscan_wraparound_union():
    """Two dense cells on opposite lng edges of the SAME row must merge
    (x-wrap adjacency), and an isolated dense cell must self-label."""
    import ray.data as rd

    res = 4
    n = 1 << res
    rows = []
    # cell (x=0, y=3) and (x=n-1, y=3): adjacent via wrap
    for _ in range(tiling.DBSCAN_MINPTS):
        rows.append({"lat": 90.0 - (3.5 / n) * 180.0, "lng": -180.0 + (0.5 / n) * 360.0})
        rows.append({"lat": 90.0 - (3.5 / n) * 180.0, "lng": -180.0 + ((n - 0.5) / n) * 360.0})
        rows.append({"lat": 90.0 - (8.5 / n) * 180.0, "lng": 0.0})  # isolated
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = tiling.grid_dbscan(ds, res, minpts=tiling.DBSCAN_MINPTS).to_pandas()
    out = out.sort_values("cell_id").reset_index(drop=True)
    assert len(out) == 3
    wrap_pair = out[out.cell_id.isin([3 * n + 0, 3 * n + (n - 1)])]
    assert wrap_pair["cluster_id"].nunique() == 1
    iso = out[~out.cell_id.isin([3 * n + 0, 3 * n + (n - 1)])]
    assert (iso["cluster_id"] == iso["cell_id"]).all()


def test_tile_topk_hosts_matches_bruteforce():
    cols = ["hostname", "lat", "lng"]
    res = tiling.DEFAULT_RES
    got = tiling.tile_topk_hosts(
        explode_spans(read_interleaved(SF), cols), res).to_pandas()
    df = _flat(cols)
    df = df[df["hostname"] != ""].copy()
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    df["cell_id"] = geo.cell_id(ix, iy, res)
    c = (df.groupby(["cell_id", "hostname"]).size().reset_index(name="n"))
    c = c.sort_values(["cell_id", "n", "hostname"],
                      ascending=[True, False, True], kind="mergesort")
    c["rank"] = c.groupby("cell_id").cumcount() + 1
    want = c[c["rank"] <= 3].reset_index(drop=True)
    key = ["cell_id", "rank"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[["cell_id", "rank", "hostname", "n"]],
                                  want_s[["cell_id", "rank", "hostname", "n"]],
                                  check_dtype=False)


def test_trajectory_od_matches_bruteforce():
    got = tiling.trajectory_od(read_interleaved(SF)).to_pandas()
    res = tiling.DEFAULT_RES
    df = _flat(["doc_id", "offset", "lat", "lng"])
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    df = df.assign(cell=geo.cell_id(ix, iy, res)).sort_values(
        ["doc_id", "offset"], kind="mergesort")
    first = df.groupby("doc_id")["cell"].first()
    last = df.groupby("doc_id")["cell"].last()
    want = (pd.DataFrame({"o_cell": first, "d_cell": last})
            .groupby(["o_cell", "d_cell"]).size().reset_index(name="n_docs"))
    key = ["o_cell", "d_cell"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[want_s.columns.tolist()], want_s,
                                  check_dtype=False)
    # trips sum to the document count
    assert got_s["n_docs"].sum() == df["doc_id"].nunique()


def test_tile_hhi_matches_bruteforce():
    cols = ["hostname", "lat", "lng"]
    res = tiling.DEFAULT_RES
    got = tiling.tile_hhi(
        explode_spans(read_interleaved(SF), cols), res).to_pandas()
    df = _flat(cols)
    df = df[df["hostname"] != ""].copy()
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    df["cell_id"] = geo.cell_id(ix, iy, res)
    h = df.groupby(["cell_id", "hostname"]).size().reset_index(name="n")
    want = h.groupby("cell_id").agg(
        n_total=("n", "sum"), n_hosts=("n", "size"),
        sum_sq=("n", lambda s: int((s.to_numpy() ** 2).sum()))).reset_index()
    got_s = got.sort_values("cell_id").reset_index(drop=True)
    want_s = want.sort_values("cell_id").reset_index(drop=True)
    assert len(got_s) == len(want_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s[want_s.columns.tolist()], want_s,
                                  check_dtype=False)
    # HHI components sane: sum_sq between n_total (all distinct) and n_total^2
    assert (got_s["sum_sq"] >= got_s["n_total"]).all()
    assert (got_s["sum_sq"] <= got_s["n_total"] ** 2).all()


def test_grid_dbscan_empty_when_no_core():
    """minpts above every cell count → empty output (no crash on the
    column access that an all-filtered to_pandas would otherwise hit).
    Note: Ray Data's to_pandas drops the schema of a fully-empty Dataset,
    so only row emptiness is assertable here; the engine-side return is
    still a TYPED empty block (stable schema for downstream Ray stages)."""
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"lat": [0.0, 10.0], "lng": [0.0, 10.0]}))
    out_ds = tiling.grid_dbscan(ds, 8, minpts=99)
    assert out_ds.schema().names == ["cell_id", "cluster_id", "n_spans"]
    assert len(out_ds.to_pandas()) == 0


def test_tile_morans_matches_bruteforce():
    res = tiling.DEFAULT_RES
    got = tiling.tile_morans(
        explode_spans(read_interleaved(SF), ["lat", "lng"]), res).to_pandas()
    df = _flat(["lat", "lng"])
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    cid = geo.cell_id(ix, iy, res)
    uniq, counts = np.unique(cid, return_counts=True)
    x = {int(c): int(k) for c, k in zip(uniq, counts)}
    n = 1 << res
    sum_w = sum_wxy = 0
    for c, xc in x.items():
        cx, cy = c % n, c // n
        for dx, dy in ((-1, -1), (0, -1), (1, -1), (-1, 0),
                       (1, 0), (-1, 1), (0, 1), (1, 1)):
            yy = cy + dy
            if yy < 0 or yy >= n:
                continue
            nb = yy * n + (cx + dx) % n
            if nb in x:
                sum_w += 1
                sum_wxy += xc * x[nb]
    row = got.iloc[0]
    assert row["n_cells"] == len(x)
    assert row["sum_x"] == sum(x.values())
    assert row["sum_x2"] == sum(v * v for v in x.values())
    assert row["sum_w"] == sum_w
    assert row["sum_wxy"] == sum_wxy


def test_low_res_neighbor_aliasing_guarded():
    """res <= 1 wraps dx=-1 and dx=+1 onto the same mod-n cell, which would
    double-count adjacency vs the wrapped-Chebyshev oracles — tile_morans
    and grid_dbscan must refuse exactly like range_join does."""
    import pytest
    import ray.data as rd

    from har2tree_ray.pipelines import tiling

    ds = rd.from_items([{"hostname": "a.ex", "lat": 0.0, "lng": 0.0}])
    for res in (0, 1):
        with pytest.raises(ValueError, match="res >= 2"):
            tiling.grid_dbscan(ds, res=res)
        with pytest.raises(ValueError, match="res >= 2"):
            tiling.tile_morans(ds, res=res)


def test_tile_compact_roundtrip_and_minimality():
    """H3-compact invariants against the real corpus: (1) expanding every
    emitted cell back to res-R leaves reproduces EXACTLY the covered set
    (lossless); (2) no emitted cell's four siblings are all present — i.e.
    the cover is minimal (anything promotable was promoted); (3) emitted
    cells are pairwise disjoint (no emitted cell is an ancestor of
    another)."""
    res = tiling.DEFAULT_RES
    got = tiling.tile_compact(explode_spans(read_interleaved(SF),
                                            ["lat", "lng"]), res)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got

    df = _flat(["lat", "lng"])
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    covered = set(geo.cell_id(ix, iy, res).tolist())

    # (1) lossless expansion
    leaves = set()
    for r, cid in zip(got["res"], got["cell_id"]):
        x, y = int(cid) % (1 << r), int(cid) >> r
        s = res - int(r)
        for dy in range(1 << s):
            for dx in range(1 << s):
                leaves.add(((y << s) + dy) * (1 << res) + (x << s) + dx)
    assert leaves == covered

    # (2) minimality: at every level, no parent has all 4 children emitted
    for r, grp in got.groupby("res"):
        if r == 0:
            continue
        x = grp["cell_id"].to_numpy(np.int64) % (1 << r)
        y = grp["cell_id"].to_numpy(np.int64) >> r
        pk = (y >> 1) * (1 << (r - 1)) + (x >> 1)
        _, counts = np.unique(pk, return_counts=True)
        assert (counts < 4).all()

    # (3) disjoint: no emitted cell is an ancestor of another emitted cell
    emitted = set(zip(got["res"].astype(int), got["cell_id"].astype(int)))
    for r, cid in emitted:
        x, y = cid % (1 << r), cid >> r
        for up in range(1, r + 1):
            anc = ((y >> up) << (r - up)) + (x >> up)
            assert (r - up, anc) not in emitted


def test_tile_compact_deep_promotion():
    """A fully-covered 4x4 block at res R must compact through TWO levels
    into one res-(R-2) cell; a lone extra cell stays at res R."""
    import ray.data as rd

    res = 4
    n = 1 << res
    rows = []
    # cover cells (ix, iy) for ix in 0..3, iy in 0..3 -> one res-2 cell 0
    for cx in range(4):
        for cy in range(4):
            lng = (cx + 0.5) / n * 360.0 - 180.0
            lat = 90.0 - (cy + 0.5) / n * 180.0
            rows.append({"lat": lat, "lng": lng})
    # lone cell at (8, 8): sibling set incomplete at every level
    rows.append({"lat": 90.0 - 8.5 / n * 180.0, "lng": 8.5 / n * 360.0 - 180.0})
    out = tiling.tile_compact(rd.from_items(rows), res)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    got = sorted(zip(out["res"].astype(int), out["cell_id"].astype(int)))
    assert got == [(2, 0), (4, 8 * n + 8)]


def test_tile_outline_matches_bruteforce():
    """Edge set equals a set-based reimplementation over the corpus's
    covered cells; Euler-style sanity: every covered cell contributes
    4 - (#covered neighbors) edges."""
    res = tiling.DEFAULT_RES
    n = 1 << res
    got = tiling.tile_outline(explode_spans(read_interleaved(SF),
                                            ["lat", "lng"]), res)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got

    df = _flat(["lat", "lng"])
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    cov = set(geo.cell_id(ix, iy, res).tolist())
    want = set()
    for c in cov:
        x, y = c % n, c // n
        if y == 0 or (y - 1) * n + x not in cov:
            want.add((c, "N"))
        if y == n - 1 or (y + 1) * n + x not in cov:
            want.add((c, "S"))
        if y * n + (x + 1) % n not in cov:
            want.add((c, "E"))
        if y * n + (x - 1) % n not in cov:
            want.add((c, "W"))
    assert set(zip(got["cell_id"].astype(int), got["side"])) == want
    assert len(got) == len(want)


def test_tile_outline_wrap_and_geometry():
    """A lone cell emits 4 edges; an E/W pair across the antimeridian
    (ix = n-1 and ix = 0, same iy) suppresses BOTH shared edges via the
    longitude wrap; endpoint doubles follow the cell_bounds forms."""
    import ray.data as rd

    res = 4
    n = 1 << res
    mk = lambda cx, cy: {"lat": 90.0 - (cy + 0.5) / n * 180.0,
                         "lng": (cx + 0.5) / n * 360.0 - 180.0}
    lone = tiling.tile_outline(rd.from_items([mk(5, 5)]), res)
    lone = lone.to_pandas() if hasattr(lone, "to_pandas") else lone
    assert sorted(lone["side"]) == ["E", "N", "S", "W"]
    north = lone[lone["side"] == "N"].iloc[0]
    assert north["x0"] == 5 / n * 360.0 - 180.0
    assert north["y0"] == 90.0 - 5 / n * 180.0
    assert north["x1"] == 6 / n * 360.0 - 180.0

    pair = tiling.tile_outline(rd.from_items([mk(n - 1, 7), mk(0, 7)]), res)
    pair = pair.to_pandas() if hasattr(pair, "to_pandas") else pair
    sides = set(zip(pair["cell_id"].astype(int), pair["side"]))
    # the edge between them (E of n-1, W of 0) wraps: suppressed both ways
    assert (7 * n + (n - 1), "E") not in sides
    assert (7 * n + 0, "W") not in sides
    assert len(pair) == 6


def test_tile_polygonize_invariants():
    """Rings partition the outline edge set exactly; every ring is closed
    (cyclic successor returns to start) with length >= 4; the SIGNED
    shoelace areas over unwrapped grid coords sum to exactly
    ±covered-cell count (outer rings and holes cancel to the raster
    area — the polygonizer's exactness contract)."""
    res = tiling.DEFAULT_RES
    flat = explode_spans(read_interleaved(SF), ["lat", "lng"])
    rings = tiling.tile_polygonize(flat, res)
    rings = rings.to_pandas() if hasattr(rings, "to_pandas") else rings
    outline = tiling.tile_outline(explode_spans(read_interleaved(SF),
                                                ["lat", "lng"]), res)
    outline = outline.to_pandas() if hasattr(outline, "to_pandas") else outline

    df = _flat(["lat", "lng"])
    ix, iy = geo.cell_xy(df["lat"].to_numpy(), df["lng"].to_numpy(), res)
    n_covered = len(np.unique(geo.cell_id(ix, iy, res)))

    assert len(rings) == len(outline)          # edge partition: one vertex/edge
    total_area = 0.0
    for _, g in rings.groupby("ring_id"):
        g = g.sort_values("seq")
        assert len(g) >= 4
        x = g["vx"].to_numpy(np.int64)
        y = g["vy"].to_numpy(np.int64)
        # closure: every step (cyclic) moves exactly one grid unit
        dx = np.diff(np.append(x, x[0]))
        dy = np.diff(np.append(y, y[0]))
        assert (np.abs(dx) + np.abs(dy) == 1).all()
        total_area += float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2.0
    assert abs(abs(total_area) - n_covered) < 1e-9


def test_tile_polygonize_hole_and_corner_touch():
    """A 3x3 block with its center missing yields an outer ring (area 9,
    one sign) plus a hole ring (area 1, opposite sign), net ±8; two
    corner-touching cells resolve into TWO simple 4-edge rings (the
    left-turn marching-squares rule), never one figure-eight."""
    import ray.data as rd

    res = 4
    n = 1 << res
    mk = lambda cx, cy: {"lat": 90.0 - (cy + 0.5) / n * 180.0,
                         "lng": (cx + 0.5) / n * 360.0 - 180.0}
    block = [mk(x, y) for x in range(4, 7) for y in range(4, 7)
             if not (x == 5 and y == 5)]
    out = tiling.tile_polygonize(rd.from_items(block), res)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    areas = []
    for _, g in out.groupby("ring_id"):
        g = g.sort_values("seq")
        x, y = g["vx"].to_numpy(float), g["vy"].to_numpy(float)
        areas.append(float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2.0)
    assert sorted(round(abs(a)) for a in areas) == [1, 9]
    assert abs(abs(sum(areas)) - 8) < 1e-9

    touch = tiling.tile_polygonize(rd.from_items([mk(2, 2), mk(3, 3)]), res)
    touch = touch.to_pandas() if hasattr(touch, "to_pandas") else touch
    sizes = touch.groupby("ring_id").size().tolist()
    assert sorted(sizes) == [4, 4]


def test_tile_polygonize_pinched_hole_convention():
    """Foreground-4-connectivity saddle convention (planar duality): two
    DIAGONALLY touching uncovered pockets inside a covered block are one
    8-connected hole — ONE ring that revisits the pinch vertex exactly
    twice, touching but not crossing (every step still unit-length, area
    contract still exact: |Σ signed areas| = 16 - 2 = 14)."""
    import ray.data as rd

    res = 4
    n = 1 << res
    mk = lambda cx, cy: {"lat": 90.0 - (cy + 0.5) / n * 180.0,
                         "lng": (cx + 0.5) / n * 360.0 - 180.0}
    # 4x4 covered block minus two diagonal pockets sharing one vertex
    block = [mk(x, y) for x in range(4, 8) for y in range(4, 8)
             if (x, y) not in ((6, 5), (5, 6))]
    out = tiling.tile_polygonize(rd.from_items(block), res)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    areas, ring_lens, pinch_revisits = [], [], 0
    for _, g in out.groupby("ring_id"):
        g = g.sort_values("seq")
        x = g["vx"].to_numpy(np.int64)
        y = g["vy"].to_numpy(np.int64)
        dx = np.diff(np.append(x, x[0]))
        dy = np.diff(np.append(y, y[0]))
        assert (np.abs(dx) + np.abs(dy) == 1).all()   # closed, unit steps
        areas.append(float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2.0)
        ring_lens.append(len(g))
        pinch_revisits += int(np.sum((x == 6) & (y == 6)))
    # one outer 16-edge ring + ONE merged 8-edge hole ring (not two 4-rings)
    assert sorted(ring_lens) == [8, 16]
    assert pinch_revisits == 2 + 0  # hole ring visits (6,6) twice; outer never
    assert abs(abs(sum(areas)) - 14) < 1e-9
