"""From-scratch spatial tile index (H3/S2 recast, north rule).

No h3 / s2sphere libraries exist in this environment, so the engine ships its
own deterministic hierarchical grid: an equirectangular power-of-two tile
pyramid (XYZ-style).  At resolution ``r`` the world ``lng ∈ [-180, 180) ×
lat ∈ [-90, 90]`` is a ``2^r × 2^r`` grid; a cell is ``(ix, iy)`` with
``cell_id = iy * 2^r + ix``.  Parent/child, k-rings (Chebyshev neighborhoods
with longitude wraparound) and cell polygons are closed-form — everything is
vectorized numpy and exactly replicable in ANSI SQL (floor + integer
arithmetic), which is what the DuckDB correctness oracle relies on.

Reference mapping (SURVEY.md §8): hostname grouping → cell encoding of span
coordinates; host-boundary membership (J5/J8) → point-in-polygon; referer
matching (J3) → kNN via cell neighbor rings.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "cell_xy",
    "cell_id",
    "parent_cell_id",
    "cell_bounds",
    "k_ring",
    "chebyshev_cell_distance",
    "point_in_polygon",
]


def cell_xy(lat: np.ndarray, lng: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (lat, lng) → integer cell coordinates at resolution ``res``.

    SQL equivalent (the oracle uses exactly this)::

        ix = LEAST(GREATEST(CAST(FLOOR((lng+180)/360 * 2^r) AS BIGINT), 0), 2^r-1)
        iy = LEAST(GREATEST(CAST(FLOOR((90-lat)/180 * 2^r) AS BIGINT), 0), 2^r-1)
    """
    n = np.int64(1) << res
    ix = np.floor((np.asarray(lng, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((90.0 - np.asarray(lat, dtype=np.float64)) / 180.0 * n).astype(np.int64)
    np.clip(ix, 0, n - 1, out=ix)
    np.clip(iy, 0, n - 1, out=iy)
    return ix, iy


def cell_id(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """``cell_id = iy * 2^res + ix`` (int64)."""
    return (np.asarray(iy, dtype=np.int64) << res) + np.asarray(ix, dtype=np.int64)


def parent_cell_id(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Cell id of the parent at resolution ``res - 1`` (ix>>1, iy>>1)."""
    if res <= 0:
        raise ValueError("resolution 0 has no parent")
    return cell_id(np.asarray(ix, dtype=np.int64) >> 1, np.asarray(iy, dtype=np.int64) >> 1, res - 1)


def cell_bounds(ix: np.ndarray, iy: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(min_lng, min_lat, max_lng, max_lat) of cells — exact binary fractions.

    Used by raster→vector tile materialization.  All values are of the form
    ``k / 2^res * span - origin`` so float results are bit-identical to the
    SQL oracle's arithmetic.
    """
    n = float(1 << res)
    ix = np.asarray(ix, dtype=np.float64)
    iy = np.asarray(iy, dtype=np.float64)
    min_lng = ix / n * 360.0 - 180.0
    max_lng = (ix + 1.0) / n * 360.0 - 180.0
    max_lat = 90.0 - iy / n * 180.0
    min_lat = 90.0 - (iy + 1.0) / n * 180.0
    return min_lng, min_lat, max_lng, max_lat


def k_ring(ix: int, iy: int, res: int, k: int) -> list[tuple[int, int]]:
    """All cells within Chebyshev distance ``k`` — lng wraps, lat clamps.

    Generalizes the reference's exact referer match (J3,
    /root/reference/har2tree/har2tree.py:973-988) to nearest-cell candidate
    generation.
    """
    n = 1 << res
    out = []
    for dy in range(-k, k + 1):
        y = iy + dy
        if y < 0 or y >= n:
            continue
        for dx in range(-k, k + 1):
            out.append(((ix + dx) % n, y))
    return out


def chebyshev_cell_distance(
    ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray, res: int
) -> np.ndarray:
    """Chebyshev grid distance with longitude wraparound (vectorized).

    SQL: ``GREATEST(LEAST(ABS(ax-bx), 2^r - ABS(ax-bx)), ABS(ay-by))``.
    """
    n = np.int64(1) << res
    dx = np.abs(np.asarray(ax, np.int64) - np.asarray(bx, np.int64))
    dx = np.minimum(dx, n - dx)
    dy = np.abs(np.asarray(ay, np.int64) - np.asarray(by, np.int64))
    return np.maximum(dx, dy)


def point_in_polygon(lat: np.ndarray, lng: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: are points inside ``poly``?

    ``poly`` is ``(m, 2)`` of (lng, lat) vertices (closed implicitly).
    Points on an edge follow the half-open crossing rule (deterministic).
    This is the general path behind host-boundary membership (J5/J8 recast);
    axis-aligned host boxes use the cheap min/max test in stages.tiles.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    inside = np.zeros(lat.shape, dtype=bool)
    m = len(poly)
    for i in range(m):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % m]
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= crosses & (lng < xint)
    return inside
