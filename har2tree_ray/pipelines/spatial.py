"""Spatial joins of the north rule: kNN referrer matching via cell-neighbor
rings, and point-in-polygon membership against broadcast host boundaries.

* ``knn_referrer`` — generalizes the reference's exact referer match (J3,
  /root/reference/har2tree/har2tree.py:973-988) to nearest-cell matching:
  for every media span, the nearest document span of the same doc whose grid
  cell lies within a Chebyshev k-ring (longitude wrapping) at KNN_RES.
  Deterministic: order by (squared-degree distance, candidate offset).
  Per-doc group work — embarrassingly parallel, no cross-doc state.

* ``pip_media_in_host`` — recast of external-resource membership (J5/J8,
  har2tree.py:990-1014,389-426): host boundary = bbox of the host's document
  spans (ε-expanded), media spans tested for containment.  The boundary
  table is the classic *small side*: built by a partial-aggregate shuffle,
  then broadcast once via ``ray.put`` into a CoveringIndex actor pool that
  prunes tests through a cell→boxes covering (the "compiled S2 covering
  index in actor state" of the north star — ST5).  Pruning is lossless for
  axis-aligned boxes (monotone cell mapping + clamped edges), so results
  equal the oracle's brute-force join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Max, Min

from .. import geo

KNN_RES = 6
KNN_RING = 2
QUERY_KINDS = ("img", "media")
PIP_EPS = 0.25
COVER_RES = 4


# ------------------------------------------------------------ kNN referrer


def _knn_doc(doc_id: str, offs: np.ndarray, kinds: np.ndarray,
             lat: np.ndarray, lng: np.ndarray) -> list[tuple]:
    """Per-doc kNN: for each media span, nearest document span within the
    Chebyshev k-ring (deterministic tie-break: squared-degree distance, then
    candidate offset)."""
    ix, iy = geo.cell_xy(lat, lng, KNN_RES)
    isq = np.isin(kinds, QUERY_KINDS)
    isc = kinds == "document"
    if not isq.any() or not isc.any():
        return []
    qi = np.where(isq)[0]
    ci = np.where(isc)[0]
    dist = geo.chebyshev_cell_distance(
        ix[qi][:, None], iy[qi][:, None], ix[ci][None, :], iy[ci][None, :], KNN_RES
    )
    ok = dist <= KNN_RING
    d2 = (lat[qi][:, None] - lat[ci][None, :]) ** 2 + (lng[qi][:, None] - lng[ci][None, :]) ** 2
    cand_off = offs[ci]
    rows = []
    for row in range(len(qi)):
        mask = ok[row]
        if not mask.any():
            continue
        dd = np.where(mask, d2[row], np.inf)
        m = dd.min()
        best = cand_off[(dd == m)].min()
        bi = np.flatnonzero(cand_off == best)[0]
        rows.append((doc_id, int(offs[qi[row]]), int(best), int(dist[row][bi])))
    return rows


def knn_referrer(flat_ds):
    """(doc_id, offset, parent_offset, cell_dist) per matched media span."""
    slim = flat_ds.select_columns(["doc_id", "offset", "kind", "lat", "lng"])

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        rows = _knn_doc(df["doc_id"].iloc[0], df["offset"].to_numpy(),
                        df["kind"].to_numpy(), df["lat"].to_numpy(),
                        df["lng"].to_numpy())
        out = pd.DataFrame(rows, columns=["doc_id", "offset", "parent_offset", "cell_dist"])
        if out.empty:
            out = out.astype({"offset": "int64", "parent_offset": "int64",
                              "cell_dist": "int64"})
        return out

    return slim.groupby("doc_id").map_groups(per_doc, batch_format="pandas")


def knn_referrer_interleaved(interleaved_ds, batch_size: int = 64):
    """Shuffle-free kNN referrer: per-doc spatial join computed straight on
    the doc-grouped interleaved rows."""
    from ..functions import parse

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {"doc_id": [], "offset": [], "parent_offset": [], "cell_dist": []}
        for did, spans in zip(ids, spans_col):
            offs = np.array([s["offset"] for s in spans], dtype=np.int64)
            kinds = np.array([s["kind"] for s in spans])
            geos = [parse.parse_geo(s["text"]) for s in spans]
            lat = np.array([g[0] for g in geos])
            lng = np.array([g[1] for g in geos])
            for d, o, p, c in _knn_doc(did, offs, kinds, lat, lng):
                out["doc_id"].append(d)
                out["offset"].append(o)
                out["parent_offset"].append(p)
                out["cell_dist"].append(c)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "offset": pa.array(out["offset"], pa.int64()),
            "parent_offset": pa.array(out["parent_offset"], pa.int64()),
            "cell_dist": pa.array(out["cell_dist"], pa.int64()),
        })

    return interleaved_ds.map_batches(per_batch, batch_format="pyarrow",
                                      batch_size=batch_size)


# --------------------------------------------------- host boundary boxes


def host_boxes(flat_ds, eps: float = PIP_EPS) -> pd.DataFrame:
    """Small-side boundary table: per hostname, ε-expanded bbox of its
    *document* spans.  Partial min/max per batch → tiny groupby."""

    def partial(t: pa.Table) -> pa.Table:
        sel = t.filter(
            pc.and_(pc.equal(t["kind"], "document"), pc.not_equal(t["hostname"], ""))
        )
        g = sel.select(["hostname", "lat", "lng"]).group_by("hostname").aggregate(
            [("lat", "min"), ("lat", "max"), ("lng", "min"), ("lng", "max")]
        )
        return g.rename_columns(["hostname", "lat_min", "lat_max", "lng_min", "lng_max"])

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow"))
    agg = partials.groupby("hostname").aggregate(
        Min("lat_min", alias_name="min_lat"),
        Max("lat_max", alias_name="max_lat"),
        Min("lng_min", alias_name="min_lng"),
        Max("lng_max", alias_name="max_lng"),
    )
    df = agg.to_pandas()  # small side by construction (one row per hostname)
    df["min_lat"] -= eps
    df["max_lat"] += eps
    df["min_lng"] -= eps
    df["max_lng"] += eps
    return df


class CoveringIndex:
    """Compiled covering index over the broadcast boxes side (ST5).

    ``__init__`` fetches the boxes once per worker (``ray.get`` of the
    driver's ``ray.put``) and compiles cell → candidate-box lists at
    COVER_RES; ``__call__`` tests each media span only against the boxes
    covering its cell.  Deployed via ``util.worker_cached_stage`` keyed on
    the boxes ObjectRef — compile-once per worker, no actor-pool spin-up.
    """

    def __init__(self, boxes_ref, anti: bool = False) -> None:
        self.anti = anti
        boxes: pd.DataFrame = ray.get(boxes_ref)
        self.hostnames = boxes["hostname"].to_numpy()
        self.min_lat = boxes["min_lat"].to_numpy()
        self.max_lat = boxes["max_lat"].to_numpy()
        self.min_lng = boxes["min_lng"].to_numpy()
        self.max_lng = boxes["max_lng"].to_numpy()
        self.cover: dict[int, np.ndarray] = {}
        n = 1 << COVER_RES
        x0, _ = geo.cell_xy(np.zeros_like(self.min_lng), self.min_lng, COVER_RES)
        x1, _ = geo.cell_xy(np.zeros_like(self.max_lng), self.max_lng, COVER_RES)
        _, y0 = geo.cell_xy(self.max_lat, np.zeros_like(self.max_lat), COVER_RES)
        _, y1 = geo.cell_xy(self.min_lat, np.zeros_like(self.min_lat), COVER_RES)
        tmp: dict[int, list[int]] = {}
        for b in range(len(self.hostnames)):
            for yy in range(int(y0[b]), int(y1[b]) + 1):
                for xx in range(int(x0[b]), int(x1[b]) + 1):
                    tmp.setdefault(yy * n + xx, []).append(b)
        self.cover = {k: np.asarray(v) for k, v in tmp.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["kind"], value_set=pa.array(QUERY_KINDS))
        t = batch.filter(mask)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lng = t["lng"].to_numpy(zero_copy_only=False)
        ix, iy = geo.cell_xy(lat, lng, COVER_RES)
        cells = geo.cell_id(ix, iy, COVER_RES)
        doc = np.asarray(t["doc_id"].to_pylist(), dtype=object)
        offs = t["offset"].to_numpy(zero_copy_only=False)
        # vectorized per covering cell: the batch's rows group into a handful
        # of distinct cells; each cell tests all its rows against all its
        # candidate boxes in one (rows × boxes) broadcast — no per-row loop
        out_doc: list[np.ndarray] = []
        out_off: list[np.ndarray] = []
        out_host: list[np.ndarray] = []
        matched = np.zeros(len(cells), dtype=bool) if self.anti else None
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        starts = np.flatnonzero(np.r_[True, sorted_cells[1:] != sorted_cells[:-1]])
        bounds = np.r_[starts, len(sorted_cells)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            cand = self.cover.get(int(sorted_cells[s]))
            if cand is None:
                continue
            rows = order[s:e]
            hit = (
                (lat[rows][:, None] >= self.min_lat[cand][None, :])
                & (lat[rows][:, None] <= self.max_lat[cand][None, :])
                & (lng[rows][:, None] >= self.min_lng[cand][None, :])
                & (lng[rows][:, None] <= self.max_lng[cand][None, :])
            )
            if self.anti:
                matched[rows[hit.any(axis=1)]] = True
                continue
            ri, bi = np.nonzero(hit)
            out_doc.append(doc[rows[ri]])
            out_off.append(offs[rows[ri]])
            out_host.append(self.hostnames[cand[bi]])
        if self.anti:
            keep = ~matched
            return pa.table(
                {
                    "doc_id": pa.array(doc[keep], pa.string()),
                    "offset": pa.array(offs[keep].astype(np.int32), pa.int32()),
                }
            )
        if out_doc:
            docs = np.concatenate(out_doc)
            offsets = np.concatenate(out_off)
            hosts = np.concatenate(out_host)
        else:
            docs = np.array([], dtype=object)
            offsets = np.array([], dtype=np.int64)
            hosts = np.array([], dtype=object)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.string()),
                "offset": pa.array(offsets.astype(np.int32), pa.int32()),
                "box_hostname": pa.array(hosts, pa.string()),
            }
        )


def pip_media_in_host(flat_ds, concurrency: int | tuple[int, int] | None = None):
    """(doc_id, offset, box_hostname) for every media span inside a host
    boundary box (cross-host membership included).

    Two passes over the input — boundary aggregation, then the covering
    probe — by RE-EXECUTING the cheap explode rather than pinning the full
    exploded span table in the object store (a ``materialize()`` here is an
    object-store-sized pin/spill at 100 TB; only the boxes side, one row
    per hostname, ever gathers).  The index stage runs as plain tasks with
    a per-worker compiled-index memo keyed on the boxes ObjectRef — same
    compile-once contract as the actor pool (ST5) without its spin-up."""
    from ..util import task_concurrency, worker_cached_stage

    boxes = host_boxes(flat_ds)
    ref = ray.put(boxes)
    slim = flat_ds.select_columns(["doc_id", "offset", "kind", "lat", "lng"])
    return slim.map_batches(
        worker_cached_stage(CoveringIndex, ref, cache_key=ref.hex()),
        batch_format="pyarrow",
        batch_size=4096,  # numeric columns are narrow; bigger batches cut
        # per-batch sort/group overhead (measured 3.3s -> 2.5s at sf0.1)
        **task_concurrency(concurrency),
    )


def pip_media_outside_host(flat_ds, concurrency: int | tuple[int, int] | None = None):
    """Spatial ANTI-join: (doc_id, offset) for every media span contained in
    NO host boundary box — the complement of ``pip_media_in_host`` (the
    reference's dangling-external-resource notion, J5's anti side,
    har2tree.py:990-1014 else-branch).

    Boundaries are the RAW (un-expanded) boxes: the ε expansion exists to
    make the JOIN permissive; the anti side asks what is strictly uncovered
    (with ε the complement is empty by construction on clustered data).

    Same two-pass shape as the join: boxes gather (one row per hostname,
    broadcast via ``ray.put``), then the covering probe as plain tasks with
    a per-worker compiled-index memo.  The anti test is lossless for the
    same reason the join is — the covering is a superset of every box, so a
    span with no candidate in its covering cell provably hits no box."""
    from ..util import task_concurrency, worker_cached_stage

    boxes = host_boxes(flat_ds, eps=0.0)
    ref = ray.put(boxes)
    slim = flat_ds.select_columns(["doc_id", "offset", "kind", "lat", "lng"])
    return slim.map_batches(
        worker_cached_stage(CoveringIndex, ref, True,
                            cache_key=ref.hex() + "-anti"),
        batch_format="pyarrow",
        batch_size=4096,
        **task_concurrency(concurrency),
    )


# ------------------------------------------------- big x big range join


RJ_RES = 8          # cell extent (0.703 deg lat) must be >= RJ_RADIUS for a
RJ_RADIUS = 0.5     # lossless 3x3 neighbor-ring cover (asserted below)


def range_join_media_doc(flat_ds, res: int = RJ_RES, radius: float = RJ_RADIUS):
    """Big x big spatial RANGE JOIN with aggregate semantics: for every
    media span (kind img/media), the COUNT of document spans within
    Euclidean degree ``radius`` plus the minimum squared distance.
    Generalizes the reference's external-resource membership join (J5,
    /root/reference/har2tree/har2tree.py:990-1014) from exact hostname
    equality to a distance predicate — the classic spatial range join
    neither side of which fits a worker.  (Self-document matches are
    included: the anti-join flavor of membership lives in
    ``pip_media_in_host`` / the J5 tree edge; this operator is the pure
    distance join.)

    Plan (NO broadcast side, ONE coarse shuffle, output resolved in place):

    1. map-only tag: query (media) spans keyed on their HOME cell at
       ``res``; candidate (document) spans — the smaller side — REPLICATED
       to the 3x3 neighbor ring (lng wraps, lat clamps).  ``radius <=
       180/2^res`` makes the ring a lossless cover: every candidate within
       ``radius`` of a query lands in the query's home cell exactly once,
       so each query row is resolved in a single cell and no second merge
       shuffle is needed.
    2. ONE crc32 hash-range shuffle on the cell key (``user_range_groupby``)
       → per-range vectorized resolve.  Both sides are first DEDUPED to
       DISTINCT (lat, lng) positions (bit-exact float dedup via a
       complex128 ``np.unique`` — web-scale span coordinates repeat
       heavily; at sf0.1 this cuts the pair-matrix volume ~12,000x, from
       1.5e10 row-pairs to 1.2e6 position-pairs), candidates carrying an
       int64 multiplicity.  The distance matrix runs distinct x distinct in
       8192-row chunks; counts are multiplicity sums (exact ints) and the
       per-position results broadcast back to rows through the dedup
       inverse index.

    Float parity contract: d2 = (qlat-clat)**2 + (qlng-clng)**2 evaluates
    the exact SQL expression ``(a-b)*(a-b) + (c-d)*(c-d)`` — same IEEE ops,
    same order — so MIN matches the DuckDB oracle bit-for-bit; the dedup
    changes which ROWS evaluate it, never the value set.
    """
    if radius > 180.0 / (1 << res):
        raise ValueError("3x3 ring cover is lossy: radius exceeds cell extent")
    if res < 2:
        # with n <= 2 the mod-n ring wraps distinct offsets onto the same
        # cell, replicating a candidate into one cell twice (double count)
        raise ValueError("3x3 ring cells must be distinct: res >= 2 required")
    from ..util import user_range_groupby

    n = np.int64(1) << res
    r2 = radius * radius

    def tag(batch: pa.Table) -> pa.Table:
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        off = batch["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = geo.cell_xy(lat, lng, res)
        isq = np.isin(kind, QUERY_KINDS)
        isc = kind == "document"
        # queries: home cell only
        q_cell = (iy[isq] << res) + ix[isq]
        # candidates (smaller side): replicate to the 3x3 ring
        cx, cy = ix[isc], iy[isc]
        cells, rows = [], []
        cidx = np.arange(len(cx))
        for dy in (-1, 0, 1):
            y = cy + dy
            ok = (y >= 0) & (y < n)
            for dx in (-1, 0, 1):
                x = (cx[ok] + dx) % n
                cells.append((y[ok] << res) + x)
                rows.append(cidx[ok])
        c_cell = np.concatenate(cells)   # always 9 arrays (possibly empty)
        c_rows = np.concatenate(rows)
        nq, nc = len(q_cell), len(c_cell)
        return pa.table({
            "cell": pa.array(np.concatenate([q_cell, c_cell])),
            "side": pa.array(np.concatenate(
                [np.ones(nq, np.int8), np.zeros(nc, np.int8)])),
            "doc_id": pa.array(
                np.concatenate([doc[isq], np.full(nc, "", dtype=object)]),
                pa.string()),
            "offset": pa.array(np.concatenate(
                [off[isq], np.full(nc, -1, np.int64)])),
            "lat": pa.array(np.concatenate([lat[isq], lat[isc][c_rows]])),
            "lng": pa.array(np.concatenate([lng[isq], lng[isc][c_rows]])),
        })

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("cell", sort=False):
            side = g["side"].to_numpy()
            q = g[side == 1]
            c = g[side == 0]
            if q.empty or c.empty:
                continue
            # bit-exact position dedup: complex128 packs the two float64s
            qenc = q["lat"].to_numpy() + 1j * q["lng"].to_numpy()
            cenc = c["lat"].to_numpy() + 1j * c["lng"].to_numpy()
            qpos, qinv = np.unique(qenc, return_inverse=True)
            cpos, ccnt = np.unique(cenc, return_counts=True)
            mult = ccnt.astype(np.int64)
            qlat, qlng = qpos.real, qpos.imag
            clat, clng = cpos.real, cpos.imag
            n_pos = np.empty(len(qpos), np.int64)
            d2_pos = np.empty(len(qpos), np.float64)
            for i0 in range(0, len(qpos), 8192):
                i1 = min(i0 + 8192, len(qpos))
                d2 = ((qlat[i0:i1, None] - clat[None, :]) ** 2
                      + (qlng[i0:i1, None] - clng[None, :]) ** 2)
                ok = d2 <= r2
                n_pos[i0:i1] = np.where(ok, mult[None, :], 0).sum(axis=1)
                d2_pos[i0:i1] = np.where(ok, d2, np.inf).min(axis=1)
            n_row = n_pos[qinv]
            hit = n_row > 0
            if not hit.any():
                continue
            outs.append(pd.DataFrame({
                "doc_id": q["doc_id"].to_numpy()[hit],
                "offset": q["offset"].to_numpy()[hit],
                "n_in_range": n_row[hit],
                "d2_min": d2_pos[qinv][hit],
            }))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series(dtype=object),
                                 "offset": pd.Series(dtype=np.int64),
                                 "n_in_range": pd.Series(dtype=np.int64),
                                 "d2_min": pd.Series(dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    tagged = flat_ds.map_batches(tag, batch_format="pyarrow")
    return user_range_groupby(tagged, per_range, key="cell")


# ---------------------------------------------------- 8-DOP host boundary


def host_octagon(flat_ds):
    """Per-host bounding OCTAGON (8-DOP) over document spans — the finer
    hull approximation between the axis-aligned ``host_boxes`` bbox and a
    true convex hull: extremes along the 4 axis + 2 diagonal directions
    (min/max of lat, lng, lat+lng, lat-lng).  Same recast lineage as
    ``host_boxes`` (host boundary of J5/J8 membership,
    /root/reference/har2tree/har2tree.py:990-1014) with diagonal support
    planes, i.e. the standard k-DOP collision primitive.

    Scale shape: identical to ``host_boxes`` — batch-local min/max partials
    (8 scalars per host per batch) → ONE bounded-key groupby; the result is
    the per-host small side.  Float parity: lat+lng / lat-lng are single
    IEEE ops evaluated identically by the oracle's SQL expressions; min/max
    are exact."""

    def partial(t: pa.Table) -> pa.Table:
        sel = t.filter(
            pc.and_(pc.equal(t["kind"], "document"), pc.not_equal(t["hostname"], ""))
        )
        lat, lng = sel["lat"], sel["lng"]
        sel = sel.select(["hostname"]).append_column(
            "lat", lat).append_column("lng", lng).append_column(
            "su", pc.add(lat, lng)).append_column("di", pc.subtract(lat, lng))
        g = sel.group_by("hostname").aggregate(
            [("lat", "min"), ("lat", "max"), ("lng", "min"), ("lng", "max"),
             ("su", "min"), ("su", "max"), ("di", "min"), ("di", "max")]
        )
        return g.rename_columns(
            ["hostname", "lat_min", "lat_max", "lng_min", "lng_max",
             "su_min", "su_max", "di_min", "di_max"])

    from ..util import pre_shuffle_coalesce

    partials = pre_shuffle_coalesce(
        flat_ds.map_batches(partial, batch_format="pyarrow"))
    return partials.groupby("hostname").aggregate(
        Min("lat_min", alias_name="min_lat"),
        Max("lat_max", alias_name="max_lat"),
        Min("lng_min", alias_name="min_lng"),
        Max("lng_max", alias_name="max_lng"),
        Min("su_min", alias_name="min_sum"),
        Max("su_max", alias_name="max_sum"),
        Min("di_min", alias_name="min_diff"),
        Max("di_max", alias_name="max_diff"),
    )


# ------------------------------------------------ nearest-boundary join


def nn_media_host(flat_ds, eps: float = PIP_EPS):
    """Spatial NEAREST-NEIGHBOR join: for every media span, the closest
    host boundary box (squared point-to-box degree distance; 0 when
    inside), deterministic tie-break on hostname.  The "which host does
    this orphan resource belong to" generalization of the membership join
    (J5/J6 fallback attachment, /root/reference/har2tree/har2tree.py:
    990-1014,1016-1032) — where ``pip_media_in_host`` answers containment,
    this answers proximity for spans no boundary contains.

    Scale shape: the boxes side is the per-host SMALL side (ST5 broadcast
    contract — built by one partial-aggregate shuffle, ``ray.put`` once,
    fetched once per worker via ``worker_cached_stage``); the media stream
    flows map-only, one vectorized point×box distance block per batch.
    Escalation for an oversized host table: expanding-ring search through
    the CoveringIndex (cells sorted by Chebyshev ring radius) instead of
    the dense matrix.

    Float parity contract: dlat = GREATEST(min_lat - lat, lat - max_lat, 0)
    and d2 = dlat*dlat + dlng*dlng are evaluated with the same IEEE ops in
    the same order as the oracle SQL; argmin over the hostname-sorted box
    axis IS the (d2, hostname) tie-break."""
    boxes = host_boxes(flat_ds, eps=eps).sort_values(
        "hostname", kind="mergesort").reset_index(drop=True)
    ref = ray.put({
        "hostname": boxes["hostname"].to_numpy(dtype=object),
        "min_lat": boxes["min_lat"].to_numpy(), "max_lat": boxes["max_lat"].to_numpy(),
        "min_lng": boxes["min_lng"].to_numpy(), "max_lng": boxes["max_lng"].to_numpy(),
    })

    class NearestBox:
        def __init__(self, boxes_ref) -> None:
            self.b = ray.get(boxes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sel = batch.filter(pc.is_in(batch["kind"], pa.array(QUERY_KINDS)))
            lat = sel["lat"].to_numpy(zero_copy_only=False)
            lng = sel["lng"].to_numpy(zero_copy_only=False)
            b = self.b
            if len(b["hostname"]) == 0:   # boundary-less corpus: no neighbor
                return pa.table({"doc_id": pa.array([], pa.string()),
                                 "offset": pa.array([], pa.int64()),
                                 "nn_host": pa.array([], pa.string()),
                                 "d2": pa.array([], pa.float64())})
            nn = np.empty(len(lat), np.int64)
            d2o = np.empty(len(lat), np.float64)
            for i0 in range(0, len(lat), 4096):
                i1 = min(i0 + 4096, len(lat))
                dlat = np.maximum(np.maximum(b["min_lat"][None, :] - lat[i0:i1, None],
                                             lat[i0:i1, None] - b["max_lat"][None, :]), 0.0)
                dlng = np.maximum(np.maximum(b["min_lng"][None, :] - lng[i0:i1, None],
                                             lng[i0:i1, None] - b["max_lng"][None, :]), 0.0)
                d2 = dlat * dlat + dlng * dlng
                # boxes are hostname-sorted: first minimum = (d2, hostname)
                nn[i0:i1] = np.argmin(d2, axis=1)
                d2o[i0:i1] = d2[np.arange(i1 - i0), nn[i0:i1]]
            return pa.table({
                "doc_id": sel["doc_id"],
                "offset": sel["offset"],
                "nn_host": pa.array(b["hostname"][nn], pa.string()),
                "d2": pa.array(d2o),
            })

    from ..util import worker_cached_stage

    return flat_ds.map_batches(
        worker_cached_stage(NearestBox, ref, cache_key=ref.hex()),
        batch_format="pyarrow")


# ------------------------------------------------- boundary overlap join


OV_RES = 5
#: neighborhood-scale boundary expansion: the synth host lattice spaces
#: hosts >= ~9.7 degrees apart, so the membership-scale PIP_EPS (0.25)
#: yields a vacuously empty overlap matrix; 6.0 models "hosts whose
#: neighborhoods intersect" and keeps both test scales non-trivial.
OV_EPS = 6.0


def boundary_overlap(flat_ds, eps: float = OV_EPS, res: int = OV_RES):
    """Distributed box-overlap SELF-join: every pair of hosts whose
    ε-expanded boundary boxes strictly intersect, with the exact
    intersection and per-box areas — the polygon-overlap matrix of the
    host-boundary family (pairwise generalization of J5 membership).

    Plan (the report-once grid trick — no broadcast, ONE shuffle):

    1. each box is rasterized to its covering cells at coarse ``res``
       (same floor+clamp arithmetic as ``tile_rasterize``);
    2. ONE crc32 hash-range shuffle on the cell key; within a cell the
       pair enumeration is all-pairs over that cell's boxes only;
    3. a pair is REPORTED only in the cell containing its intersection's
       anchor corner ``(GREATEST(min_lng), GREATEST(min_lat))`` — the
       anchor lies inside both boxes, so its cell is covered by both, and
       it is unique per pair: exact, duplicate-free output without a
       second dedup shuffle (same family as range_join's lossless ring).

    Group sizes are boxes-per-cell — bounded by geometry, not corpus size;
    the documented hot-cell escalation is a finer ``res`` (quadtree split),
    which strictly shrinks per-cell membership.  Float parity: widths /
    heights / areas evaluate the oracle's exact LEAST/GREATEST/* ops."""
    import ray.data as rd

    from ..util import user_range_groupby

    n = np.int64(1) << res
    boxes = host_boxes(flat_ds, eps=eps)

    def cover(df: pd.DataFrame) -> pd.DataFrame:
        x0 = np.clip(np.floor((df["min_lng"].to_numpy() + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
        x1 = np.clip(np.floor((df["max_lng"].to_numpy() + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
        y0 = np.clip(np.floor((90.0 - df["max_lat"].to_numpy()) / 180.0 * n), 0, n - 1).astype(np.int64)
        y1 = np.clip(np.floor((90.0 - df["min_lat"].to_numpy()) / 180.0 * n), 0, n - 1).astype(np.int64)
        rows, cells = [], []
        for i in range(len(df)):
            xs = np.arange(x0[i], x1[i] + 1)
            ys = np.arange(y0[i], y1[i] + 1)
            cc = (ys[:, None] * n + xs[None, :]).ravel()
            cells.append(cc)
            rows.append(np.full(len(cc), i, np.int64))
        if not cells:
            return pd.DataFrame({"cell": pd.Series(dtype=np.int64)})
        rows = np.concatenate(rows)
        out = df.iloc[rows].reset_index(drop=True)
        out.insert(0, "cell", np.concatenate(cells))
        return out

    covered = rd.from_pandas(boxes).map_batches(cover, batch_format="pandas")

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cell, g in df.groupby("cell", sort=False):
            m = len(g)
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            # canonical pair order: host_a < host_b
            hn = g["hostname"].to_numpy(dtype=object)
            swap = hn[ai] > hn[bi]
            ai, bi = np.where(swap, bi, ai), np.where(swap, ai, bi)
            lo_lng = np.maximum(g["min_lng"].to_numpy()[ai], g["min_lng"].to_numpy()[bi])
            hi_lng = np.minimum(g["max_lng"].to_numpy()[ai], g["max_lng"].to_numpy()[bi])
            lo_lat = np.maximum(g["min_lat"].to_numpy()[ai], g["min_lat"].to_numpy()[bi])
            hi_lat = np.minimum(g["max_lat"].to_numpy()[ai], g["max_lat"].to_numpy()[bi])
            w = hi_lng - lo_lng
            h = hi_lat - lo_lat
            ok = (w > 0) & (h > 0)
            if not ok.any():
                continue
            # report-once: anchor corner (lo_lng, lo_lat) must be in THIS cell
            acx = np.clip(np.floor((lo_lng + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
            acy = np.clip(np.floor((90.0 - lo_lat) / 180.0 * n), 0, n - 1).astype(np.int64)
            ok &= (acy * n + acx) == cell
            if not ok.any():
                continue
            area = ((g["max_lng"].to_numpy() - g["min_lng"].to_numpy())
                    * (g["max_lat"].to_numpy() - g["min_lat"].to_numpy()))
            outs.append(pd.DataFrame({
                "host_a": hn[ai[ok]], "host_b": hn[bi[ok]],
                "inter_area": w[ok] * h[ok],
                "area_a": area[ai[ok]], "area_b": area[bi[ok]],
            }))
        if not outs:
            return pd.DataFrame({
                "host_a": pd.Series(dtype=object), "host_b": pd.Series(dtype=object),
                "inter_area": pd.Series(dtype=np.float64),
                "area_a": pd.Series(dtype=np.float64),
                "area_b": pd.Series(dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    return user_range_groupby(covered, per_range, key="cell")
