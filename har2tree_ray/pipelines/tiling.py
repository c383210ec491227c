"""Tile encoding, rollup, and raster→vector materialization.

The north rule's spatial core: batched cell encoding of span coordinates
(recast of hostname grouping → HostNode, /root/reference/har2tree/
har2tree.py:680-708), per-cell aggregation with hot-cell salting, and
vector-tile materialization (recast of the d3js hostname-tree render,
har2tree/har2tree.py:676-678).

All math lives in har2tree_ray.geo (pure numpy, SQL-replicable); stages here
are ``map_batches(batch_format="pyarrow")`` + partial-aggregate shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from .. import geo
from ..util import pre_shuffle_coalesce

DEFAULT_RES = 8


def _encode_batch(batch: pa.Table, res: int, keep: tuple[str, ...] = ()) -> pa.Table:
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    ix, iy = geo.cell_xy(lat, lng, res)
    cid = geo.cell_id(ix, iy, res)
    pid = geo.parent_cell_id(ix, iy, res)
    cols = {
        "doc_id": batch["doc_id"],
        "offset": batch["offset"],
        "res": pa.array(np.full(len(cid), res, dtype=np.int32)),
        "cell_x": pa.array(ix),
        "cell_y": pa.array(iy),
        "cell_id": pa.array(cid),
        "parent_cell_id": pa.array(pid),
    }
    for c in keep:
        cols[c] = batch[c]
    return pa.table(cols)


def tile_assign(flat_ds, res: int = DEFAULT_RES, keep: tuple[str, ...] = ()):
    """Flat span Dataset → TILE_SCHEMA Dataset (map-only).  ``keep`` passes
    extra input columns through (e.g. ``hostname`` so a checkpointed assign
    output can feed the full rollup without re-flattening the source)."""
    return flat_ds.map_batches(lambda b: _encode_batch(b, res, keep),
                               batch_format="pyarrow")


def _rollup_partial(batch: pa.Table, res: int) -> pa.Table:
    """Batch-local partial per-(cell, doc, host) counts.  Distinct counts are
    not plain sums, so the composite key survives to the final reduce; a hot
    cell is naturally spread across reducers because doc_id/hostname vary
    within it (composite-key salting — SURVEY.md §4 skew handling)."""
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    ix, iy = geo.cell_xy(lat, lng, res)
    cid = geo.cell_id(ix, iy, res)
    t = pa.table(
        {
            "cell_id": pa.array(cid),
            "doc_id": batch["doc_id"],
            "hostname": batch["hostname"],
        }
    )
    g = t.group_by(["cell_id", "doc_id", "hostname"]).aggregate([("cell_id", "count")])
    return g.rename_columns(["cell_id", "doc_id", "hostname", "partial_n"])


def _finalize_cells(t: pa.Table) -> pa.Table:
    # one whole cell_id group per call: exact distincts over the partials
    g = t.group_by("cell_id").aggregate(
        [("partial_n", "sum"), ("doc_id", "count_distinct"), ("hostname", "count_distinct")]
    )
    g = g.rename_columns(["cell_id", "n_spans", "n_docs", "n_hosts"])
    return pa.table(
        {
            "cell_id": g["cell_id"],
            "n_spans": pc.cast(g["n_spans"], pa.int64()),
            "n_docs": pc.cast(g["n_docs"], pa.int64()),
            "n_hosts": pc.cast(g["n_hosts"], pa.int64()),
        }
    )


def tile_rollup(flat_ds, res: int = DEFAULT_RES):
    """Per-cell rollup: n_spans, n_docs, n_hosts.

    Two-level reduce: batch-local ``(cell, doc, host)`` partials → shuffle on
    the composite key → final per-cell merge over the much smaller partials.
    """
    partials = flat_ds.map_batches(
        lambda b: _rollup_partial(b, res), batch_format="pyarrow"
    )

    # single shuffle over pre-combined partials (coalesced to cluster-width
    # blocks first); groups are whole cells so the count_distincts are exact.
    return pre_shuffle_coalesce(partials).groupby("cell_id").map_groups(
        _finalize_cells, batch_format="pyarrow")


def tile_rollup_from_assign(assign_ds):
    """Per-cell rollup from already-encoded assign rows — the RESUME path:
    reads the checkpointed ``tile_assign(keep=("hostname",))`` output, so
    none of the flatten/normalize/encode work is redone after a restart."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["cell_id", "doc_id", "hostname"]).group_by(
            ["cell_id", "doc_id", "hostname"]).aggregate([("cell_id", "count")])
        return g.rename_columns(["cell_id", "doc_id", "hostname", "partial_n"])

    partials = assign_ds.map_batches(partial, batch_format="pyarrow")
    return pre_shuffle_coalesce(partials).groupby("cell_id").map_groups(
        _finalize_cells, batch_format="pyarrow")


def tile_pyramid(flat_ds, res: int = DEFAULT_RES, levels: int = 3):
    """Multi-resolution raster pyramid: span counts per cell at ``res`` and
    every coarser level down to ``res - levels`` (parent cells are integer
    halvings of the grid coordinates — the H3/S2 parent chain analog).

    One batch pass emits partial counts for ALL levels (each span folds into
    levels+1 cells), then a single native Sum over the bounded
    (res, cell_id) domain — the pyramid costs one shuffle, not one per
    level.  Output: (res, cell_id, n_spans)."""
    import numpy as np

    lo = max(0, res - levels)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        out_r, out_c, out_n = [], [], []
        for r in range(res, lo - 1, -1):
            s = res - r
            cid = geo.cell_id(ix >> s, iy >> s, r)
            uniq, counts = np.unique(cid, return_counts=True)
            out_r.append(np.full(len(uniq), r, dtype=np.int32))
            out_c.append(uniq)
            out_n.append(counts.astype(np.int64))
        return pa.table({
            "res": pa.array(np.concatenate(out_r)),
            "cell_id": pa.array(np.concatenate(out_c)),
            "partial_n": pa.array(np.concatenate(out_n)),
        })

    agg = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow")
    ).groupby(["res", "cell_id"]).aggregate(Sum("partial_n", alias_name="n_spans"))
    return agg.map_batches(
        lambda t: pa.table({
            "res": pc.cast(t["res"], pa.int32()),
            "cell_id": t["cell_id"],
            "n_spans": pc.cast(t["n_spans"], pa.int64()),
        }),
        batch_format="pyarrow")


def tile_neighbor_density(flat_ds, res: int = DEFAULT_RES):
    """3×3 neighborhood density per cell — raster convolution expressed as
    scatter + native Sum: every occupied cell SCATTERS its count to its nine
    (x-wrapped, y-clamped) neighbors, then one bounded groupby(cell) sums
    the contributions.  Output: (cell_id, n_spans, neighbor_spans) for every
    cell receiving any contribution (n_spans = 0 for unoccupied cells inside
    an occupied neighborhood).  Both shuffles run over the bounded cell
    domain, never over spans."""
    import numpy as np

    n = np.int64(1) << res
    counts = pre_shuffle_coalesce(
        flat_ds.map_batches(lambda b: _cell_count_partial(b, res),
                            batch_format="pyarrow")
    ).groupby("cell_id").aggregate(Sum("partial_n", alias_name="n_spans"))

    def scatter(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["n_spans"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy, ix = cid // n, cid % n
        out_c, out_self, out_nb = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                x2 = (ix + dx) % n          # x wraps (longitude)
                y2 = iy + dy                # y clamps (poles)
                ok = (y2 >= 0) & (y2 < n)
                out_c.append(y2[ok] * n + x2[ok])
                out_self.append(cnt[ok] if dx == 0 and dy == 0
                                else np.zeros(ok.sum(), dtype=np.int64))
                out_nb.append(cnt[ok])
        return pa.table({
            "cell_id": pa.array(np.concatenate(out_c)),
            "self_n": pa.array(np.concatenate(out_self)),
            "nb_n": pa.array(np.concatenate(out_nb)),
        })

    agg = counts.map_batches(scatter, batch_format="pyarrow").groupby(
        "cell_id").aggregate(Sum("self_n", alias_name="n_spans"),
                             Sum("nb_n", alias_name="neighbor_spans"))
    return agg.map_batches(
        lambda t: pa.table({
            "cell_id": t["cell_id"],
            "n_spans": pc.cast(t["n_spans"], pa.int64()),
            "neighbor_spans": pc.cast(t["neighbor_spans"], pa.int64()),
        }),
        batch_format="pyarrow")


def tile_vectorize(flat_ds, res: int = DEFAULT_RES):
    """Raster→vector: every occupied cell → its polygon corners + density.

    Output: cell_id, n_spans, min_lng, min_lat, max_lng, max_lat (doubles are
    exact binary fractions of the grid — bit-identical to the SQL oracle).
    """
    enc = flat_ds.map_batches(
        lambda b: _cell_count_partial(b, res), batch_format="pyarrow"
    )
    agg = pre_shuffle_coalesce(enc).groupby("cell_id").aggregate(
        Sum("partial_n", alias_name="n_spans"))

    def corners(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.int64(1) << res
        iy, ix = cid // n, cid % n
        min_lng, min_lat, max_lng, max_lat = geo.cell_bounds(ix, iy, res)
        return pa.table(
            {
                "cell_id": pa.array(cid),
                "n_spans": pc.cast(t["n_spans"], pa.int64()),
                "min_lng": pa.array(min_lng),
                "min_lat": pa.array(min_lat),
                "max_lng": pa.array(max_lng),
                "max_lat": pa.array(max_lat),
            }
        )

    return agg.map_batches(corners, batch_format="pyarrow")


def _cell_count_partial(batch: pa.Table, res: int) -> pa.Table:
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    ix, iy = geo.cell_xy(lat, lng, res)
    cid = geo.cell_id(ix, iy, res)
    uniq, counts = np.unique(cid, return_counts=True)
    return pa.table({"cell_id": pa.array(uniq), "partial_n": pa.array(counts.astype(np.int64))})


def tile_compact(flat_ds, res: int = DEFAULT_RES):
    """H3/S2-style covering COMPACTION: the minimal mixed-resolution cell
    set whose union equals the covered res-``res`` cells — a parent
    replaces its four children iff ALL FOUR are fully covered, applied
    recursively up to res 0 (the ``h3.compact`` / S2 covering
    normalization primitive; the cheap storage/transmission form of a
    covering, inverse of expanding every cell to res-``res`` leaves).

    Scale shape: the only corpus-sized work is the reduction to DISTINCT
    covered cells (per-batch uniques → the ONE bounded-key shuffle every
    tile_* rollup pays); that set is bounded by the GRID (≤ 4^res rows —
    a constant in the corpus size, the ST5 small-side contract), so the
    log-depth promote loop runs vectorized on the driver over ≤ 4^res
    int64 pairs.  Output: (res, cell_id) — cell ids in each emitted
    cell's OWN resolution (iy·2^r + ix)."""
    from ray.data.aggregate import Sum

    partials = pre_shuffle_coalesce(flat_ds.map_batches(
        lambda b: _cell_count_partial(b, res), batch_format="pyarrow"))
    counts = partials.groupby("cell_id").aggregate(
        Sum("partial_n", alias_name="_n"))
    df = counts.to_pandas()   # ≤ 4^res rows by construction
    cells = (df["cell_id"].to_numpy(dtype=np.int64) if len(df)
             else np.array([], np.int64))

    n = np.int64(1) << res
    ix = cells & (n - 1)
    iy = cells >> res
    out_res, out_cid = [], []
    for r in range(res, 0, -1):
        half = np.int64(1) << (r - 1)
        pk = (iy >> 1) * half + (ix >> 1)
        uniq, inv, cnt = np.unique(pk, return_inverse=True,
                                   return_counts=True)
        keep = cnt[inv] < 4              # siblings incomplete: emit at r
        kept_cid = (iy[keep] << r) + ix[keep]
        out_res.append(np.full(len(kept_cid), r, np.int32))
        out_cid.append(kept_cid)
        promoted = uniq[cnt == 4]        # fully-covered parents: recurse
        ix = promoted & (half - 1)
        iy = promoted >> (r - 1)
    out_res.append(np.zeros(len(ix), np.int32))   # res-0 grid is 1×1
    out_cid.append(iy + ix)
    return pa.table({
        "res": pa.array(np.concatenate(out_res), pa.int32()),
        "cell_id": pa.array(np.concatenate(out_cid), pa.int64()),
    })


def _morton_key(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Vectorized Morton (Z-order) key: bit-interleave of (ix, iy) — x bits
    at even positions, y at odd.  Integer arithmetic only, so the SQL
    oracle reproduces it as a 2·res-term sum."""
    z = np.zeros(len(ix), np.int64)
    for b in range(res):
        z |= ((ix >> b) & 1) << (2 * b)
        z |= ((iy >> b) & 1) << (2 * b + 1)
    return z


def tile_zorder(flat_ds, res: int = DEFAULT_RES):
    """Space-filling-curve locality key per span: the Morton (Z-order)
    index of its res-``res`` cell.  THE co-location partitioning key of a
    100 TB tiling run: every 4^k-aligned zkey range is exactly one
    quadtree cell (``zkey >> 2`` IS the parent's zkey), so range-
    partitioning the corpus by zkey keeps spatially adjacent cells in the
    same shard and every tile_* rollup after one zkey sort is
    range-local — the whole tile family amortizes a single shuffle.
    Map-only, zero shuffle here.  Output: (doc_id, offset, cell_id,
    zkey)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        return pa.table({
            "doc_id": batch["doc_id"],
            "offset": batch["offset"],
            "cell_id": pa.array(geo.cell_id(ix, iy, res)),
            "zkey": pa.array(_morton_key(ix, iy, res)),
        })

    return flat_ds.map_batches(per_batch, batch_format="pyarrow")


def tile_outline(flat_ds, res: int = DEFAULT_RES):
    """Raster→vector BOUNDARY extraction: the oriented edge set of the
    covered-cell region — a cell edge is a boundary segment iff the cell
    across it is NOT covered (longitude wraps; beyond the poles counts as
    outside).  The marching-squares / polygonize primitive: downstream,
    chaining these segments yields the region's vector outline, which is
    what a vector-tile sink ships instead of the raster.  Output:
    (cell_id, side ∈ N/S/E/W, x0, y0, x1, y1) with endpoints in exact
    binary-fraction degrees (``geo.cell_bounds`` forms — bit-identical to
    the SQL oracle's arithmetic, the ``tile_vectorize`` parity contract).

    Scale shape: identical to ``tile_compact`` — the corpus reduces to
    DISTINCT covered cells via the one bounded-key shuffle every tile
    rollup pays; the neighbor tests then run vectorized (sorted-array
    ``searchsorted`` membership) over the grid-bounded (≤ 4^res) set."""
    from ray.data.aggregate import Sum

    partials = pre_shuffle_coalesce(flat_ds.map_batches(
        lambda b: _cell_count_partial(b, res), batch_format="pyarrow"))
    counts = partials.groupby("cell_id").aggregate(
        Sum("partial_n", alias_name="_n"))
    df = counts.to_pandas()   # ≤ 4^res rows by construction
    cells = np.sort(df["cell_id"].to_numpy(dtype=np.int64)) if len(df) \
        else np.array([], np.int64)

    n = np.int64(1) << res
    ix = cells & (n - 1)
    iy = cells >> res

    def _covered(nid: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(cells, nid)
        pos = np.minimum(pos, len(cells) - 1) if len(cells) else pos
        return (cells[pos] == nid) if len(cells) else np.zeros(len(nid), bool)

    # neighbor ids per side; pole rows have no N/S neighbor (outside)
    b_n = np.where(iy > 0, ~_covered(((iy - 1) << res) + ix), True)
    b_s = np.where(iy < n - 1, ~_covered(((iy + 1) << res) + ix), True)
    b_e = ~_covered((iy << res) + ((ix + 1) % n))
    b_w = ~_covered((iy << res) + ((ix - 1) % n))

    fx = ix.astype(np.float64)
    fy = iy.astype(np.float64)
    nf = float(n)
    min_lng = fx / nf * 360.0 - 180.0
    max_lng = (fx + 1.0) / nf * 360.0 - 180.0
    max_lat = 90.0 - fy / nf * 180.0
    min_lat = 90.0 - (fy + 1.0) / nf * 180.0

    sides = [
        ("N", b_n, min_lng, max_lat, max_lng, max_lat),
        ("S", b_s, min_lng, min_lat, max_lng, min_lat),
        ("E", b_e, max_lng, min_lat, max_lng, max_lat),
        ("W", b_w, min_lng, min_lat, min_lng, max_lat),
    ]
    out = {"cell_id": [], "side": [], "x0": [], "y0": [], "x1": [], "y1": []}
    for name, mask, x0, y0, x1, y1 in sides:
        out["cell_id"].append(cells[mask])
        out["side"].append(np.full(int(mask.sum()), name, dtype=object))
        out["x0"].append(x0[mask])
        out["y0"].append(y0[mask])
        out["x1"].append(x1[mask])
        out["y1"].append(y1[mask])
    return pa.table({
        "cell_id": pa.array(np.concatenate(out["cell_id"]), pa.int64()),
        "side": pa.array(np.concatenate(out["side"]), pa.string()),
        "x0": pa.array(np.concatenate(out["x0"]), pa.float64()),
        "y0": pa.array(np.concatenate(out["y0"]), pa.float64()),
        "x1": pa.array(np.concatenate(out["x1"]), pa.float64()),
        "y1": pa.array(np.concatenate(out["y1"]), pa.float64()),
    })


def tile_polygonize(flat_ds, res: int = DEFAULT_RES):
    """Raster→vector POLYGONIZE: chain the boundary edge set of the
    covered region (``tile_outline``) into closed rings — the actual
    vector-tile geometry a tile sink ships (outer rings + holes).  Edges
    are directed interior-on-the-LEFT; at saddle vertices (a diagonal
    cell pair) the walk takes the leftmost turn — the FOREGROUND-4-
    CONNECTED marching-squares convention: two diagonally touching
    covered cells stay two separate simple rings, and (by planar
    duality) two diagonally touching uncovered pockets are ONE
    8-connected hole whose single ring revisits the pinch vertex —
    touching itself there but never crossing (both pinned by pytest;
    the dual convention is impossible to satisfy on both sides of a
    saddle at once).  Ring ids are assigned in scan order of each
    ring's canonical (min (vy, vx)) start vertex; vertex coordinates are
    emitted both as UNWRAPPED grid integers (vx may leave [0, n) when a
    ring crosses the antimeridian — signed shoelace over (vx, vy) is then
    exact, summing to ±covered-cell count) and as degrees.

    Scale shape: the edge set is grid-bounded (≤ 4·4^res — the ST5
    small-side contract, same as tile_compact/tile_outline), so the chain
    walk runs on the driver; the corpus-sized work remains the one
    distinct-cell shuffle.  Rows-only (ring chaining is not expressible
    in SQL); invariants pytest-checked: edge partition, closure, and
    |Σ signed ring areas| == covered-cell count."""
    from ray.data.aggregate import Sum

    partials = pre_shuffle_coalesce(flat_ds.map_batches(
        lambda b: _cell_count_partial(b, res), batch_format="pyarrow"))
    counts = partials.groupby("cell_id").aggregate(
        Sum("partial_n", alias_name="_n"))
    df = counts.to_pandas()
    cells = np.sort(df["cell_id"].to_numpy(dtype=np.int64)) if len(df) \
        else np.array([], np.int64)

    n = int(1) << res
    ix = (cells & (n - 1)).astype(int)
    iy = (cells >> res).astype(int)

    def cov(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        nid = (cy.astype(np.int64) << res) + cx
        if not len(cells):
            return np.zeros(len(nid), bool)
        pos = np.minimum(np.searchsorted(cells, nid), len(cells) - 1)
        return (cells[pos] == nid) & (cy >= 0) & (cy < n)

    # directed boundary edges, interior on the left (vertex grid: (vx, vy),
    # vy positive southward; cell (ix, iy) corners TL=(ix,iy) TR=(ix+1,iy)
    # BL=(ix,iy+1) BR=(ix+1,iy+1))
    b_n = ~cov(ix, iy - 1)
    b_s = ~cov(ix, iy + 1)
    b_e = ~cov((ix + 1) % n, iy)
    b_w = ~cov((ix - 1) % n, iy)
    edges = {}   # (vx_mod, vy, dir) -> (end_vx_delta, end_vy)
    DIRS = {"N": (-1, 0), "S": (1, 0), "E": (0, -1), "W": (0, 1)}
    for side, mask, sx, sy in (
            ("N", b_n, ix + 1, iy), ("S", b_s, ix, iy + 1),
            ("E", b_e, ix + 1, iy + 1), ("W", b_w, ix, iy)):
        d = DIRS[side]
        for vx, vy in zip(sx[mask], sy[mask]):
            edges[(int(vx) % n, int(vy), d)] = True

    out_by_vertex: dict[tuple[int, int], list] = {}
    for (vx, vy, d) in edges:
        out_by_vertex.setdefault((vx, vy), []).append(d)

    def left(d):
        return (d[1], -d[0])

    def right(d):
        return (-d[1], d[0])

    rings = []
    unused = set(edges)
    # canonical start order: scan by (vy, vx, dir) for determinism
    for start in sorted(unused, key=lambda e: (e[1], e[0], e[2])):
        if start not in unused:
            continue
        ring = []
        vx_u, vy = start[0], start[1]      # unwrapped vx
        cur = start
        while True:
            unused.discard(cur)
            d = cur[2]
            ring.append((vx_u, vy))
            vx_u, vy = vx_u + d[0], vy + d[1]
            nxt_v = ((vx_u % n + n) % n, vy)
            cands = [c for c in out_by_vertex.get(nxt_v, ())
                     if (nxt_v[0], nxt_v[1], c) in unused]
            if not cands:
                break                       # ring closed (start consumed)
            for pref in (left(d), d, right(d)):
                if pref in cands:
                    nd = pref
                    break
            else:
                nd = cands[0]
            cur = (nxt_v[0], nxt_v[1], nd)
        rings.append(ring)

    out = {"ring_id": [], "seq": [], "vx": [], "vy": [],
           "lng": [], "lat": []}
    for rid, ring in enumerate(rings):
        for seq, (vx_u, vy) in enumerate(ring):
            out["ring_id"].append(rid)
            out["seq"].append(seq)
            out["vx"].append(vx_u)
            out["vy"].append(vy)
            out["lng"].append(((vx_u % n + n) % n) / float(n) * 360.0 - 180.0)
            out["lat"].append(90.0 - vy / float(n) * 180.0)
    return pa.table({
        "ring_id": pa.array(out["ring_id"], pa.int64()),
        "seq": pa.array(out["seq"], pa.int32()),
        "vx": pa.array(out["vx"], pa.int64()),
        "vy": pa.array(out["vy"], pa.int64()),
        "lng": pa.array(out["lng"], pa.float64()),
        "lat": pa.array(out["lat"], pa.float64()),
    })


# ------------------------------------------------------------- KMV sketch


KMV_K = 8


def tile_host_kmv(flat_ds, res: int = DEFAULT_RES, k: int = KMV_K):
    """Per-tile KMV (k-minimum-values) distinct-hostname sketch — the
    mergeable cardinality primitive for tiles too hot to count exactly
    (Bar-Yossef et al. 2002, public): keep the ``k`` smallest
    ``md5(hostname)`` values per cell.  The distinct-count estimate is
    derived downstream as ``(k-1) / frac(kth_hash)``; the ENGINE emits only
    the sketch rows ``(cell_id, rank, h)`` — deterministic strings/ints, so
    the DuckDB oracle is exact (no float estimator crosses the compare).

    Mergeable by construction: the union of per-batch k-min sets is a
    superset of the global k-min set, so partials shrink to ≤ k rows per
    (batch, cell) before the one bounded-key shuffle (cells are the tile
    domain, like every tile_* rollup)."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        cid = geo.cell_id(ix, iy, res)
        df = pd.DataFrame({"cell_id": cid,
                           "hostname": batch["hostname"].to_pylist()})
        df = df[df["hostname"] != ""].drop_duplicates()
        if not len(df):
            return pa.table({"cell_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.string())})
        # hostnames repeat heavily across cells — md5 only the uniques
        uniq = {s: hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in set(df["hostname"])}
        df["h"] = df["hostname"].map(uniq)
        df = df.sort_values(["cell_id", "h"], kind="mergesort")
        df = df[df.groupby("cell_id").cumcount() < k]
        return pa.Table.from_pandas(df[["cell_id", "h"]], preserve_index=False)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates().sort_values(
            ["cell_id", "h"], kind="mergesort")
        df = df[df.groupby("cell_id").cumcount() < k].reset_index(drop=True)
        df["rank"] = (df.groupby("cell_id").cumcount() + 1).astype("int64")
        return pa.Table.from_pandas(df[["cell_id", "rank", "h"]],
                                    preserve_index=False)

    from ..util import pre_shuffle_coalesce

    parts = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow"))
    return parts.groupby("cell_id").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------- hierarchical parent share


def tile_share(flat_ds, res: int = DEFAULT_RES):
    """Pyramid-level self-join: per res-``res`` cell, its span count AND its
    parent cell's span count (the hierarchical density-share primitive —
    downstream a heat-map normalizes child/parent; kept as exact int64
    numerator/denominator so the oracle compares bit-for-bit).

    ONE shuffle: the partial counts carry BOTH keys (cell, parent), and the
    exchange is keyed on the PARENT hash-range — every child of a parent
    co-lives in one range, so the parent total is a range-local sum and the
    join never moves data twice.
    """
    import numpy as np

    from ..util import user_range_groupby

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        t = pa.table({"cell_id": pa.array(geo.cell_id(ix, iy, res)),
                      "parent_id": pa.array(geo.parent_cell_id(ix, iy, res))})
        g = t.group_by(["parent_id", "cell_id"]).aggregate([("cell_id", "count")])
        return g.rename_columns(["parent_id", "cell_id", "part_n"])

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["parent_id", "cell_id"], sort=False)["part_n"]
             .sum().reset_index())
        par = g.groupby("parent_id", sort=False)["part_n"].transform("sum")
        return pd.DataFrame({
            "cell_id": g["cell_id"].astype(np.int64),
            "parent_cell_id": g["parent_id"].astype(np.int64),
            "n_spans": g["part_n"].astype(np.int64),
            "parent_n_spans": par.astype(np.int64),
        })

    partials = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow"))
    return user_range_groupby(partials, per_range, key="parent_id")


def tile_share_sql(flat_path: str, res: int = DEFAULT_RES) -> str:
    n = 1 << res
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), flat AS (
    SELECT COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1) AS DOUBLE), 0.0) AS lat,
           COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2) AS DOUBLE), 0.0) AS lng
    FROM ex
), cells AS (
    SELECT LEAST(GREATEST(CAST(FLOOR((lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS cell_x,
           LEAST(GREATEST(CAST(FLOOR((90.0 - lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS cell_y
    FROM flat
), c AS (
    SELECT cell_y * {n} + cell_x AS cell_id,
           (cell_y // 2) * {n // 2} + (cell_x // 2) AS parent_cell_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM cells GROUP BY 1, 2
)
SELECT cell_id, parent_cell_id, n_spans,
       CAST(SUM(n_spans) OVER (PARTITION BY parent_cell_id) AS BIGINT)
           AS parent_n_spans
FROM c
"""


# ------------------------------------------------ vector -> raster


def tile_rasterize(flat_ds, res: int = DEFAULT_RES, eps: float | None = None):
    """Vector→raster materialization — the inverse of ``tile_vectorize``:
    rasterize the per-host boundary boxes (ε-expanded bboxes of document
    spans, the same vector side ``spatial.host_boxes`` broadcasts) onto the
    resolution-``res`` grid, producing per-cell box-coverage counts.

    Fully streaming (no driver gather, unlike the broadcast-side builder):
    partial per-batch min/max per hostname → one bounded groupby (one row
    per hostname) → map-only rasterize (vectorized repeat/arange cell
    enumeration; per-box fan-out is bounded by the box area in cells, ~6
    cells for the synth ε=0.25 boxes at res 8 and ≤ 4^res always) → one
    Sum shuffle on cell_id (cells-touched cardinality).

    Float parity: box edges are MIN/MAX of input doubles ± eps and the cell
    math is the shared ``geo.cell_xy`` formula, both bit-identical to the
    DuckDB oracle's expressions.
    """
    if eps is None:
        from .spatial import PIP_EPS as eps

    def partial(t: pa.Table) -> pa.Table:
        sel = t.filter(
            pc.and_(pc.equal(t["kind"], "document"), pc.not_equal(t["hostname"], ""))
        )
        g = sel.select(["hostname", "lat", "lng"]).group_by("hostname").aggregate(
            [("lat", "min"), ("lat", "max"), ("lng", "min"), ("lng", "max")]
        )
        return g.rename_columns(["hostname", "lat_min", "lat_max", "lng_min", "lng_max"])

    from ray.data.aggregate import Max, Min

    boxes = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow")
    ).groupby("hostname").aggregate(
        Min("lat_min", alias_name="min_lat"),
        Max("lat_max", alias_name="max_lat"),
        Min("lng_min", alias_name="min_lng"),
        Max("lng_max", alias_name="max_lng"),
    )

    def rasterize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cell_id": pa.array([], pa.int64()),
                             "partial_n": pa.array([], pa.int64())})
        min_lat = t["min_lat"].to_numpy(zero_copy_only=False) - eps
        max_lat = t["max_lat"].to_numpy(zero_copy_only=False) + eps
        min_lng = t["min_lng"].to_numpy(zero_copy_only=False) - eps
        max_lng = t["max_lng"].to_numpy(zero_copy_only=False) + eps
        x0, y0 = geo.cell_xy(max_lat, min_lng, res)   # top-left cell
        x1, y1 = geo.cell_xy(min_lat, max_lng, res)   # bottom-right cell
        w = x1 - x0 + 1
        h = y1 - y0 + 1
        area = w * h
        total = int(area.sum())
        rep_x0 = np.repeat(x0, area)
        rep_y0 = np.repeat(y0, area)
        rep_w = np.repeat(w, area)
        k = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(area) - area, area)
        x = rep_x0 + k % rep_w
        y = rep_y0 + k // rep_w
        cells = pa.table({"cell_id": pa.array((y << res) + x)})
        g = cells.group_by("cell_id").aggregate([("cell_id", "count")])
        return g.rename_columns(["cell_id", "partial_n"])

    rastered = pre_shuffle_coalesce(
        boxes.map_batches(rasterize, batch_format="pyarrow"))
    agg = rastered.groupby("cell_id").aggregate(Sum("partial_n", alias_name="n_boxes"))
    return agg


# ----------------------------------------------------- per-doc trajectory


def doc_trajectory(interleaved_ds, res: int = DEFAULT_RES, batch_size: int = 256):
    """Per-document cell trajectory: spans ordered by offset, encoded to
    grid cells, consecutive same-cell runs collapsed to one step, each kept
    step numbered (``seq``) and annotated with the wrapped-Chebyshev cell
    distance from the previous kept step (``step_dist``; 0 on the first).

    The geospatial recast of the reference's per-document URL sequence (M1
    entry order, har2tree.py:195-215 sorting by start_time): a capture is a
    *path* through cell space, the building block of dwell/movement
    analytics.  Interleaved rows hold whole documents, so the whole op is
    ONE map-only pass — flatten-in-batch (Arrow ``list_flatten`` +
    ``list_parent_indices``), one vectorized regex for the geo field, one
    ``np.lexsort`` per batch; no shuffle at any scale.  Step distance uses
    the same longitude wraparound as ``geo.k_ring``."""

    def per_batch(batch: pa.Table) -> pa.Table:
        col = batch["spans"].combine_chunks()
        flat = pc.list_flatten(col)
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        off = pc.struct_field(flat, "offset").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = pc.extract_regex(pc.struct_field(flat, "text"),
                             r"@geo=(?P<glat>-?\d+\.\d+),(?P<glng>-?\d+\.\d+)")
        lat = pc.fill_null(pc.cast(pc.struct_field(m, "glat"), pa.float64()),
                           0.0).to_numpy(zero_copy_only=False)
        lng = pc.fill_null(pc.cast(pc.struct_field(m, "glng"), pa.float64()),
                           0.0).to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        cid = geo.cell_id(ix, iy, res)
        if len(parent) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "seq": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int64()),
                "cell_id": pa.array([], pa.int64()),
                "step_dist": pa.array([], pa.int64()),
            })
        order = np.lexsort((off, parent))
        p, o, c = parent[order], off[order], cid[order]
        x, y = ix[order], iy[order]
        first = np.r_[True, p[1:] != p[:-1]]
        keep = first | np.r_[False, c[1:] != c[:-1]]
        kidx = np.flatnonzero(keep)
        kp, kx, ky = p[kidx], x[kidx], y[kidx]
        kfirst = np.r_[True, kp[1:] != kp[:-1]]
        pos = np.arange(len(kp), dtype=np.int64)
        gstart = np.maximum.accumulate(np.where(kfirst, pos, 0))
        seq = pos - gstart
        px = np.r_[np.int64(0), kx[:-1]]
        py = np.r_[np.int64(0), ky[:-1]]
        step = geo.chebyshev_cell_distance(kx, ky, px, py, res)
        step[kfirst] = 0
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        return pa.table({
            "doc_id": pa.array(ids[kp], pa.string()),
            "seq": pa.array(seq, pa.int64()),
            "offset": pa.array(o[kidx], pa.int64()),
            "cell_id": pa.array(c[kidx], pa.int64()),
            "step_dist": pa.array(step, pa.int64()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


# ------------------------------------------------------- zonal statistics


class _ZonalIndex:
    """Compiled zone index over the broadcast boxes side (ST5 shape):
    box cell ranges at ``res`` plus a COVER_RES covering for candidate
    pruning.  Pruning is exact: cover cells are the res cells right-shifted
    (floor nesting), so a span whose res cell lies in a box's res range
    provably lies in the box's cover range too."""

    def __init__(self, boxes_ref, res: int, n_parts: int) -> None:
        import ray

        from .spatial import COVER_RES

        boxes = ray.get(boxes_ref)
        self.res, self.n_parts = res, n_parts
        self.hostnames = boxes["hostname"].to_numpy()
        z = np.zeros(len(boxes))
        self.x0, _ = geo.cell_xy(z, boxes["min_lng"].to_numpy(), res)
        self.x1, _ = geo.cell_xy(z, boxes["max_lng"].to_numpy(), res)
        _, self.y0 = geo.cell_xy(boxes["max_lat"].to_numpy(), z, res)
        _, self.y1 = geo.cell_xy(boxes["min_lat"].to_numpy(), z, res)
        # covering at min(COVER_RES, res): res below COVER_RES must not
        # produce a negative shift (the covering is then the grid itself)
        cover_res = min(COVER_RES, res)
        shift = res - cover_res
        self.shift = shift
        nc = np.int64(1) << cover_res
        cover: dict[int, list[int]] = {}
        for b in range(len(self.hostnames)):
            for yy in range(int(self.y0[b] >> shift), int(self.y1[b] >> shift) + 1):
                for xx in range(int(self.x0[b] >> shift), int(self.x1[b] >> shift) + 1):
                    cover.setdefault(int(yy * nc + xx), []).append(b)
        self.cover = {k: np.asarray(v) for k, v in cover.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import key_partition_ids

        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, self.res)
        cover_cells = ((iy >> self.shift) << (self.res - self.shift)) \
            + (ix >> self.shift)
        out_host: list[np.ndarray] = []
        out_cell: list[np.ndarray] = []
        order = np.argsort(cover_cells, kind="stable")
        sc = cover_cells[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        bounds = np.r_[starts, len(sc)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            cand = self.cover.get(int(sc[s]))
            if cand is None:
                continue
            rows = order[s:e]
            hit = ((ix[rows][:, None] >= self.x0[cand][None, :])
                   & (ix[rows][:, None] <= self.x1[cand][None, :])
                   & (iy[rows][:, None] >= self.y0[cand][None, :])
                   & (iy[rows][:, None] <= self.y1[cand][None, :]))
            ri, bi = np.nonzero(hit)
            out_host.append(self.hostnames[cand[bi]])
            out_cell.append((iy[rows[ri]] << self.res) + ix[rows[ri]])
        if out_host:
            hosts = np.concatenate(out_host)
            cells = np.concatenate(out_cell)
        else:
            hosts = np.array([], dtype=object)
            cells = np.array([], dtype=np.int64)
        t = pa.table({"hostname": pa.array(hosts, pa.string()),
                      "cell_id": pa.array(cells, pa.int64())})
        g = t.group_by(["hostname", "cell_id"]).aggregate([("cell_id", "count")])
        g = g.rename_columns(["hostname", "cell_id", "part_n"])
        return g.append_column(
            "hpart", pa.array(key_partition_ids(g["hostname"], self.n_parts)))


def tile_zonal_stats(flat_ds, res: int = DEFAULT_RES, n_parts: int | None = None):
    """Zonal statistics — the classic raster-analytics primitive: per host
    ZONE (its ε-expanded boundary box rasterized to a cell range), the
    covered-cell count (closed form from the range), the spans falling in
    the zone, the occupied-cell count and the hottest cell's span count.

    Scale shape: boxes are the broadcast small side (one row per hostname,
    ``ray.put`` once); the probe runs as worker-cached tasks emitting
    batch-local (host, cell) partial counts; ONE crc32 host-range shuffle
    resolves exact per-(host, cell) sums and per-host aggregates in a
    vectorized pandas pass.  Output is one row per hostname (bounded), so
    the final closed-form merge happens driver-side."""
    import ray

    from .spatial import host_boxes
    from ..util import default_n_parts, worker_cached_stage

    if n_parts is None:
        n_parts = default_n_parts()

    boxes = host_boxes(flat_ds)
    ref = ray.put(boxes)

    def per_range(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .groupby(["hostname", "cell_id"], as_index=False)["part_n"].sum())
        agg = df.groupby("hostname").agg(
            n_spans_in_zone=("part_n", "sum"),
            n_cells_occupied=("cell_id", "count"),
            max_cell_count=("part_n", "max")).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    slim = flat_ds.select_columns(["lat", "lng"])
    zonal = (pre_shuffle_coalesce(slim.map_batches(
                 worker_cached_stage(_ZonalIndex, ref, res, n_parts,
                                     cache_key=ref.hex() + "-zonal"),
                 batch_format="pyarrow", batch_size=4096))
             .groupby("hpart")
             .map_groups(per_range, batch_format="pyarrow")
             .to_pandas())  # bounded: one row per hostname

    z = np.zeros(len(boxes))
    x0, _ = geo.cell_xy(z, boxes["min_lng"].to_numpy(), res)
    x1, _ = geo.cell_xy(z, boxes["max_lng"].to_numpy(), res)
    _, y0 = geo.cell_xy(boxes["max_lat"].to_numpy(), z, res)
    _, y1 = geo.cell_xy(boxes["min_lat"].to_numpy(), z, res)
    out = pd.DataFrame({
        "hostname": boxes["hostname"].to_numpy(),
        "n_cells_covered": (x1 - x0 + 1) * (y1 - y0 + 1),
    })
    out = out.merge(zonal, on="hostname", how="left")
    for c in ["n_spans_in_zone", "n_cells_occupied", "max_cell_count"]:
        out[c] = out[c].fillna(0).astype("int64")
    out["n_cells_covered"] = out["n_cells_covered"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------ HLL register sketch

HLL_REGS = 256  # 2 hex digits of register address

# worker-level hostname → (reg, rho) memo: hot hostnames recur across
# batches, and the per-batch dict the explode used to build re-hashed them
# every batch.  Module-level = once per worker process (the
# _WORKER_STAGE_CACHE pattern); bounded, cleared wholesale on overflow.
_HLL_REG_CACHE: dict[str, str] = {}
_HLL_RHO_CACHE: dict[str, int] = {}
_HLL_CACHE_MAX = 2_000_000


def _hll_host_memo(hostnames):
    """Return (reg_map, rho_map) dicts covering ``hostnames``, md5-hashing
    only the ones this worker has never seen."""
    import hashlib

    if len(_HLL_REG_CACHE) > _HLL_CACHE_MAX:
        _HLL_REG_CACHE.clear()
        _HLL_RHO_CACHE.clear()
    for s in hostnames:
        if s not in _HLL_REG_CACHE:
            h = hashlib.md5(s.encode("utf-8")).hexdigest()
            _HLL_REG_CACHE[s] = h[:2]
            _HLL_RHO_CACHE[s] = 31 - len(h[2:32].lstrip("0"))
    return _HLL_REG_CACHE, _HLL_RHO_CACHE


def tile_host_hll(flat_ds, res: int = DEFAULT_RES):
    """Per-tile HyperLogLog-style distinct-hostname register sketch — the
    fixed-size mergeable companion to ``tile_host_kmv`` (Flajolet et al.
    2007, public).  Deterministic hex-base recast: register address = the
    first two hex digits of ``md5(hostname)`` (256 registers); observable
    ``rho`` = 1 + number of leading zero HEX digits of the next 30 (a
    base-16 geometric in place of the classic base-2 — same max-merge
    algebra, exactly replicable in ANSI SQL with string ops, no float).
    The engine emits only the registers ``(cell_id, reg, rho)``; the
    cardinality estimate is derived downstream, as with KMV.

    Mergeable by construction (register-wise MAX), so batch partials
    shrink to ≤ 256 rows per (batch, cell) before one bounded-key native
    Max aggregate — never a distinct-count over an unbounded domain."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        cid = geo.cell_id(ix, iy, res)
        df = pd.DataFrame({"cell_id": cid,
                           "hostname": batch["hostname"].to_pylist()})
        df = df[df["hostname"] != ""].drop_duplicates()
        if not len(df):
            return pa.table({"cell_id": pa.array([], pa.int64()),
                             "reg": pa.array([], pa.string()),
                             "part_rho": pa.array([], pa.int64())})
        reg_c, rho_c = _hll_host_memo(set(df["hostname"]))
        df = pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(),
            "reg": df["hostname"].map(reg_c).to_numpy(),
            "rho": df["hostname"].map(rho_c).to_numpy(),
        })
        g = df.groupby(["cell_id", "reg"], as_index=False)["rho"].max()
        return pa.table({"cell_id": pa.array(g["cell_id"], pa.int64()),
                         "reg": pa.array(g["reg"], pa.string()),
                         "part_rho": pa.array(g["rho"], pa.int64())})

    parts = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow"))
    agg = parts.groupby(["cell_id", "reg"]).aggregate(
        Max("part_rho", alias_name="rho"))
    return agg.map_batches(
        lambda t: pa.table({"cell_id": t["cell_id"], "reg": t["reg"],
                            "rho": pc.cast(t["rho"], pa.int64())}),
        batch_format="pyarrow")


# ------------------------------------------------- grid density clustering


DBSCAN_MINPTS = 32


def grid_dbscan(flat_ds, res: int = DEFAULT_RES, minpts: int = DBSCAN_MINPTS):
    """Density-based spatial clustering on the tile grid (grid-DBSCAN /
    GriT-DBSCAN family, public): cells holding >= ``minpts`` spans are CORE
    cells; 8-connected core cells (Chebyshev distance 1, longitude
    wrapping, latitude clamping — exactly ``geo.chebyshev_cell_distance``)
    merge into clusters labeled by their minimum cell_id.  The hotspot
    segmentation step of the tiling family — where ``tile_rollup`` counts,
    this SEGMENTS.

    Scale shape: per-batch cell-count partials → ONE bounded-key shuffle
    (the tile domain, like every tile_* rollup) → the core-cell table is
    bounded by the GRID (≤ 4^res rows — a constant in the corpus size, the
    ST5 small-side contract), so the connectivity resolve is a driver-side
    vectorized union-find over ≤ 8·4^res adjacency pairs; the documented
    escalation for an unbounded cell domain is the synchronous min-label
    propagation of ``webmeta.host_components`` over the same pairs.
    Min-label clustering is order-independent, hence exactly
    oracle-checkable (recursive-CTE reachability closure + MIN)."""
    if res < 2:
        # with n <= 2 the mod-n neighbor ring wraps dx=-1 and dx=+1 onto
        # the SAME cell, double-counting adjacency vs the oracle's
        # wrapped-Chebyshev (which counts each ordered pair once) — the
        # same aliasing range_join guards against
        raise ValueError("8-neighbor ring cells must be distinct: "
                         "res >= 2 required")
    from ray.data.aggregate import Sum

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(flat_ds.map_batches(
        lambda b: _cell_count_partial(b, res), batch_format="pyarrow"))
    counts = partials.groupby("cell_id").aggregate(
        Sum("partial_n", alias_name="n_spans"))
    core = counts.filter(expr=f"n_spans >= {minpts}").to_pandas()

    import ray.data as rd

    if not len(core):   # no cell reaches minpts: typed empty, stable schema
        # (an all-filtered Dataset loses its columns in to_pandas, so the
        # guard must precede any column access)
        return rd.from_arrow(pa.table({
            "cell_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "n_spans": pa.array([], pa.int64())}))

    core = core.sort_values("cell_id", kind="mergesort").reset_index(drop=True)

    ids = core["cell_id"].to_numpy(np.int64)
    n = np.int64(1) << res
    cx, cy = ids % n, ids // n

    # adjacency pairs: x wraps mod n, y clamps (vectorized neighbor lookup
    # against the sorted core-id array; <= 8 * |core| pairs total)
    pairs_a, pairs_b = [], []
    for dx, dy in ((-1, -1), (0, -1), (1, -1), (-1, 0),
                   (1, 0), (-1, 1), (0, 1), (1, 1)):
        ny = cy + dy
        src = np.nonzero((ny >= 0) & (ny < n))[0]
        nid = ny[src] * n + (cx[src] + dx) % n
        pos = np.searchsorted(ids, nid)
        ok = pos < len(ids)
        ok[ok] = ids[pos[ok]] == nid[ok]
        pairs_a.append(src[ok])
        pairs_b.append(pos[ok])
    pa_, pb_ = np.concatenate(pairs_a), np.concatenate(pairs_b)

    # classic union-find with min-root union; ids are ascending so the root
    # index is the component's minimum cell_id position
    parent = np.arange(len(ids), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]   # path halving
            i = int(parent[i])
        return i

    for i, j in zip(pa_.tolist(), pb_.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    roots = np.fromiter((find(i) for i in range(len(ids))),
                        dtype=np.int64, count=len(ids))
    cluster = ids[roots]

    return rd.from_pandas(pd.DataFrame({
        "cell_id": ids, "cluster_id": cluster,
        "n_spans": core["n_spans"].to_numpy(np.int64)}))


# ------------------------------------------------- top-k hosts per tile


def tile_topk_hosts(flat_ds, res: int = DEFAULT_RES, k: int = 3,
                    n_parts: int | None = None):
    """Distributed top-k-per-TILE: the ``k`` most-frequent hostnames of
    every grid cell (rank by span count, ties by hostname ascending) —
    the tile-domain sibling of ``stats.host_topk_urls``, i.e. "who
    dominates each map tile" for label rendering.

    Scale shape: batch-local (cell, host) partial counts (the combiner
    bounds a hot cell to its distinct hosts per batch) → ONE crc32
    cell-range shuffle (every cell's rows in exactly one range) →
    per-range vectorized pandas pass (sum, mergesort rank, head-k).  No
    per-key dispatch; k rows per cell regardless of skew."""
    from ..util import default_n_parts, key_partition_ids, pre_shuffle_coalesce

    if n_parts is None:
        n_parts = default_n_parts()

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        t = pa.table({"cell_id": pa.array(geo.cell_id(ix, iy, res)),
                      "hostname": batch["hostname"]})
        t = t.filter(pc.not_equal(t["hostname"], ""))
        g = t.group_by(["cell_id", "hostname"]).aggregate(
            [("hostname", "count")])
        g = g.rename_columns(["cell_id", "hostname", "part_n"])
        return g.append_column(
            "gpart", pa.array(key_partition_ids(g["cell_id"], n_parts)))

    def per_range(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .groupby(["cell_id", "hostname"], as_index=False)["part_n"].sum()
              .rename(columns={"part_n": "n"}))
        df = df.sort_values(["cell_id", "n", "hostname"],
                            ascending=[True, False, True], kind="mergesort")
        df["rank"] = df.groupby("cell_id").cumcount() + 1
        df = df[df["rank"] <= k]
        return pa.table({
            "cell_id": pa.array(df["cell_id"].astype("int64"), pa.int64()),
            "rank": pa.array(df["rank"].astype("int64"), pa.int64()),
            "hostname": pa.array(df["hostname"], pa.string()),
            "n": pa.array(df["n"].astype("int64"), pa.int64()),
        })

    parts = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow"))
    return parts.groupby("gpart").map_groups(per_range, batch_format="pyarrow")


# ------------------------------------------------- origin-destination flow


def trajectory_od(interleaved_ds, res: int = DEFAULT_RES,
                  batch_size: int = 256, n_parts: int | None = None):
    """Origin→destination flow matrix over document trajectories: each
    document contributes ONE trip from the cell of its FIRST span to the
    cell of its LAST span (offset order), counted per (o_cell, d_cell) —
    the classic geospatial OD-matrix aggregate, built on the same
    map-only flatten as ``doc_trajectory``.

    Scale shape: interleaved rows hold whole documents, so origin/dest
    extraction is map-only (one lexsort per batch, segment first/last);
    batch-local (o, d) partial counts then cross ONE coarse int-keyed
    range shuffle with a vectorized pandas sum — pair cardinality is
    bounded by occupied-cell² in the worst case but by corpus structure
    in practice; the key hashes uniformly either way."""
    from ..util import user_range_groupby

    def per_batch(batch: pa.Table) -> pa.Table:
        col = batch["spans"].combine_chunks()
        flat = pc.list_flatten(col)
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        off = pc.struct_field(flat, "offset").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = pc.extract_regex(pc.struct_field(flat, "text"),
                             r"@geo=(?P<glat>-?\d+\.\d+),(?P<glng>-?\d+\.\d+)")
        lat = pc.fill_null(pc.cast(pc.struct_field(m, "glat"), pa.float64()),
                           0.0).to_numpy(zero_copy_only=False)
        lng = pc.fill_null(pc.cast(pc.struct_field(m, "glng"), pa.float64()),
                           0.0).to_numpy(zero_copy_only=False)
        if len(parent) == 0:
            return pa.table({"o_cell": pa.array([], pa.int64()),
                             "d_cell": pa.array([], pa.int64()),
                             "part_n": pa.array([], pa.int64())})
        ix, iy = geo.cell_xy(lat, lng, res)
        cid = geo.cell_id(ix, iy, res)
        order = np.lexsort((off, parent))
        p, c = parent[order], cid[order]
        first = np.r_[True, p[1:] != p[:-1]]
        last = np.r_[p[1:] != p[:-1], True]
        od = pd.DataFrame({"o_cell": c[first], "d_cell": c[last]})
        g = od.groupby(["o_cell", "d_cell"], sort=False).size().reset_index(
            name="part_n")
        g["part_n"] = g["part_n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["o_cell", "d_cell"], sort=False)["part_n"].sum()
             .reset_index(name="n_docs"))
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    parts = interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                       batch_size=batch_size)
    return user_range_groupby(parts, merge, key="o_cell", n_parts=n_parts)


# ------------------------------------------------- host concentration (HHI)


def tile_hhi(flat_ds, res: int = DEFAULT_RES, n_parts: int | None = None):
    """Per-tile host CONCENTRATION in exact integers — the
    Herfindahl-Hirschman components: for every cell, the number of spans
    ``n_total``, the number of distinct hosts ``n_hosts``, and the sum of
    squared per-host span counts ``sum_sq`` (HHI = sum_sq / n_total² left
    to the consumer, keeping the compare integer-exact like
    host_clustering's ratio).  "Is this map tile one host's territory or
    contested ground" — the diversity analytics of the tile family.

    Scale shape: batch-local (cell, host) partial counts → ONE crc32
    cell-range shuffle (a cell's (host, n) rows co-locate; group size =
    hosts-per-cell, bounded by geography not corpus) → vectorized
    per-range squared-sum."""
    from ..util import user_range_groupby

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, res)
        t = pa.table({"cell_id": pa.array(geo.cell_id(ix, iy, res)),
                      "hostname": batch["hostname"]})
        t = t.filter(pc.not_equal(t["hostname"], ""))
        g = t.group_by(["cell_id", "hostname"]).aggregate(
            [("hostname", "count")])
        return g.rename_columns(["cell_id", "hostname", "part_n"])

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.groupby(["cell_id", "hostname"], sort=False)["part_n"].sum()
             .reset_index(name="n"))
        h["n"] = h["n"].astype("int64")
        g = h.groupby("cell_id", sort=False).agg(
            n_total=("n", "sum"), n_hosts=("n", "size"),
            sum_sq=("n", lambda s: int((s.to_numpy() ** 2).sum())))
        out = g.reset_index()
        for c in ("n_total", "n_hosts", "sum_sq"):
            out[c] = out[c].astype("int64")
        return out

    parts = flat_ds.map_batches(partial, batch_format="pyarrow")
    return user_range_groupby(parts, per_range, key="cell_id",
                              n_parts=n_parts)


def tile_hhi_sql(flat_path: str, res: int = DEFAULT_RES) -> str:
    n = 1 << res
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), f AS (
    SELECT COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1) AS DOUBLE), 0.0) AS lat,
           COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2) AS DOUBLE), 0.0) AS lng,
           CASE WHEN regexp_matches(s.media_ref, '^https?://')
                THEN regexp_extract(s.media_ref, '^https?://([^/?#]+)', 1)
                ELSE '' END AS hostname
    FROM ex
), c AS (
    SELECT LEAST(GREATEST(CAST(FLOOR((90.0 - lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) * {n}
         + LEAST(GREATEST(CAST(FLOOR((lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS cell_id,
           hostname
    FROM f WHERE hostname <> ''
), h AS (
    SELECT cell_id, hostname, CAST(COUNT(*) AS BIGINT) AS n
    FROM c GROUP BY 1, 2
)
SELECT cell_id, CAST(SUM(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n * n) AS BIGINT) AS sum_sq
FROM h GROUP BY cell_id
"""


# --------------------------------------------- spatial autocorrelation


def tile_morans(flat_ds, res: int = DEFAULT_RES, n_parts: int | None = None):
    """Global spatial-autocorrelation components (Moran's I numerator /
    denominator pieces) over the occupied-cell raster, in EXACT integers:
    one row ``(n_cells, sum_x, sum_x2, sum_w, sum_wxy)`` where x is the
    per-cell span count, w is 8-connectivity (lng wraps, lat clamps,
    binary weights), ``sum_w`` counts ordered adjacent occupied pairs and
    ``sum_wxy = Σ_adjacent x_i·x_j`` (ordered).  The float assembly
    ``I = (n/Σw)·(Σw(x-x̄)(y-x̄))/Σ(x-x̄)²`` expands into these integer
    moments, so the engine emits only BIGINTs (the host_clustering
    philosophy) and the oracle compare is exact.

    Scale shape: per-cell exact counts (one bounded-key shuffle) → each
    occupied cell SCATTERS its count to its 8 neighbors (the
    tile_neighbor_density pattern) → the scatter side co-partitions with
    the counts side on the cell key (ONE more bounded exchange); per-range
    products accumulate batch-locally and a final 1-row reduce sums five
    integers."""
    if res < 2:
        # the scatter emits dx=-1 and dx=+1 as the same wrapped cell when
        # n <= 2, double-counting sum_w / sum_wxy vs the oracle's
        # wrapped-Chebyshev adjacency — same aliasing range_join guards
        raise ValueError("8-neighbor scatter cells must be distinct: "
                         "res >= 2 required")
    from ..util import user_range_groupby

    # counts feeds BOTH union sides below; without materialize the whole
    # explode→count→aggregate upstream executes twice.  The table is
    # cell-cardinality (≤ 4^res rows — bounded by the grid, not the
    # corpus), so pinning it is the host_triangles working-set contract,
    # not a big-data materialize.  A/B at sf0.1: 8.9 → 3.0 s.
    counts = (pre_shuffle_coalesce(flat_ds.map_batches(
        lambda b: _cell_count_partial(b, res), batch_format="pyarrow")
    ).groupby("cell_id").aggregate(Sum("partial_n", alias_name="n_spans"))
    ).materialize()

    n = np.int64(1) << res

    def scatter(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["n_spans"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = cid % n, cid // n
        cells, vals = [], []
        for dx, dy in ((-1, -1), (0, -1), (1, -1), (-1, 0),
                       (1, 0), (-1, 1), (0, 1), (1, 1)):
            ny = cy + dy
            ok = (ny >= 0) & (ny < n)
            cells.append(ny[ok] * n + (cx[ok] + dx) % n)
            vals.append(cnt[ok])
        return pa.table({
            "cell_id": pa.array(np.concatenate(cells)),
            "x_nbr": pa.array(np.concatenate(vals)),
            "x_self": pa.array(np.zeros(sum(len(c) for c in cells), np.int64)),
        })

    def self_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "cell_id": t["cell_id"],
            "x_nbr": pa.array(np.zeros(t.num_rows, np.int64)),
            "x_self": t["n_spans"],
        })

    both = counts.map_batches(self_side, batch_format="pyarrow").union(
        counts.map_batches(scatter, batch_format="pyarrow"))

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell_id", sort=False).agg(
            x=("x_self", "sum"), s_nbr=("x_nbr", "sum"),
            w=("x_nbr", lambda s: int((s.to_numpy() > 0).sum())))
        g = g[g["x"] > 0]   # products only for OCCUPIED cells
        x = g["x"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_cells": [np.int64(len(g))],
            "sum_x": [np.int64(x.sum())],
            "sum_x2": [np.int64((x * x).sum())],
            "sum_w": [np.int64(g["w"].to_numpy(np.int64).sum())],
            "sum_wxy": [np.int64((x * g["s_nbr"].to_numpy(np.int64)).sum())],
        })

    parts = user_range_groupby(both, per_range, key="cell_id",
                               n_parts=n_parts)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({c: [np.int64(df[c].sum())] for c in
                             ("n_cells", "sum_x", "sum_x2", "sum_w", "sum_wxy")})

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def tile_morans_sql(flat_path: str, res: int = DEFAULT_RES) -> str:
    n = 1 << res
    return f"""
WITH ex AS (
    SELECT doc_id, UNNEST(spans) AS s FROM read_parquet('{flat_path}/*.parquet')
), f AS (
    SELECT COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1) AS DOUBLE), 0.0) AS lat,
           COALESCE(TRY_CAST(regexp_extract(s.text, '@geo=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2) AS DOUBLE), 0.0) AS lng
    FROM ex
), c AS (
    SELECT LEAST(GREATEST(CAST(FLOOR((lng + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS cx,
           LEAST(GREATEST(CAST(FLOOR((90.0 - lat) / 180.0 * {n}.0) AS BIGINT), 0), {n} - 1) AS cy
    FROM f
), cnt AS (
    SELECT cy * {n} + cx AS cell_id, cx, cy, CAST(COUNT(*) AS BIGINT) AS x
    FROM c GROUP BY 1, 2, 3
), adj AS (
    SELECT a.x AS xa, b.x AS xb
    FROM cnt a JOIN cnt b ON a.cell_id <> b.cell_id
     AND GREATEST(LEAST(ABS(a.cx - b.cx), {n} - ABS(a.cx - b.cx)),
                  ABS(a.cy - b.cy)) <= 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cnt) AS n_cells,
       (SELECT CAST(SUM(x) AS BIGINT) FROM cnt) AS sum_x,
       (SELECT CAST(SUM(x * x) AS BIGINT) FROM cnt) AS sum_x2,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM adj) AS sum_w,
       (SELECT CAST(COALESCE(SUM(xa * xb), 0) AS BIGINT) FROM adj) AS sum_wxy
"""
