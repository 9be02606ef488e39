"""H3/S2-shaped cell index (SURVEY.md §2.B F9), pure-numpy Morton quadkey.

The north rule (BASELINE.json:14) requires an "H3/S2 index" layer for
point-in-polygon joins, kNN and raster↔vector assignment. No h3/s2 native
lib exists in this sandbox, so the v0 backend is a Morton (Z-order) quadkey
over equirectangular lon/lat — same API shape as H3 (cell ids are opaque
int64s; resolution nests by parent/child; k-rings enumerate neighbors), so a
real H3 backend can be swapped in at deploy without touching call sites.

Cell id layout (int64):  [ 5 bits res | 2*res bits Morton(x, y) ]
  x = floor((lon+180)/360 * 2^res),  y = floor((lat+90)/180 * 2^res)

All functions are vectorized numpy (ufunc-style) and exposed to Spark as
Arrow-batched pandas UDFs — never per-row Python (BASELINE.json:15).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

MAX_RES = 29  # 2*29 bits of Morton + 5 bits res < 64


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the bits of each 32-bit lane (Morton spread)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits32(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits32."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def _xy_to_cell(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    morton = _spread_bits32(x) | (_spread_bits32(y) << np.uint64(1))
    return ((np.uint64(res) << np.uint64(58)) | morton).astype(np.int64)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return ((cell.astype(np.uint64) >> np.uint64(58)) & np.uint64(0x1F)).astype(np.int64)


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = cell.astype(np.uint64) & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    return _compact_bits32(m).astype(np.int64), _compact_bits32(m >> np.uint64(1)).astype(np.int64)


def latlng_to_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """(lon, lat) arrays → int64 cell ids at `res` (0..29)."""
    n = np.int64(1) << np.int64(res)
    x = np.clip(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n), 0, n - 1)
    y = np.clip(np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n), 0, n - 1)
    return _xy_to_cell(x.astype(np.uint64), y.astype(np.uint64), res)


def cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    cell = np.asarray(cell)
    res = cell_res(cell)
    x, y = cell_to_xy(cell)
    shift = (res - parent_res).astype(np.uint64)
    px = (x.astype(np.uint64) >> shift)
    py = (y.astype(np.uint64) >> shift)
    return _xy_to_cell(px, py, parent_res)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each cell's rectangle."""
    cell = np.asarray(cell)
    res = cell_res(cell)
    x, y = cell_to_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lon0 = x / n * 360.0 - 180.0
    lat0 = y / n * 180.0 - 90.0
    return lon0, lat0, lon0 + 360.0 / n, lat0 + 180.0 / n


def cell_ring(cell: np.ndarray, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)² block, self
    included — H3's grid_disk analog). Returns shape (len(cell), (2k+1)²);
    out-of-grid lat neighbors are clamped out as -1. Lon wraps."""
    cell = np.asarray(cell)
    res = int(cell_res(cell)[0]) if cell.size else 0
    x, y = cell_to_xy(cell)
    n = np.int64(1) << np.int64(res)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    nx = (x[:, None] + dx.ravel()[None, :]) % n  # lon wraps around the date line
    ny = y[:, None] + dy.ravel()[None, :]
    valid = (ny >= 0) & (ny < n)
    out = _xy_to_cell(
        nx.astype(np.uint64), np.clip(ny, 0, n - 1).astype(np.uint64), res
    )
    out[~valid] = -1
    return out


def bbox_cover(
    lon_min: np.ndarray,
    lat_min: np.ndarray,
    lon_max: np.ndarray,
    lat_max: np.ndarray,
    res: int,
) -> list[np.ndarray]:
    """Cells overlapping each bbox (polygon_cover's conservative superset:
    the PIP residual discards false positives, so bbox-cover is sufficient
    for correctness; a tighter raster cover is a deploy-scale optimization).
    Returns a ragged list of int64 arrays."""
    n = np.int64(1) << np.int64(res)
    x0 = np.clip(np.floor((np.asarray(lon_min) + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    x1 = np.clip(np.floor((np.asarray(lon_max) + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    y0 = np.clip(np.floor((np.asarray(lat_min) + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    y1 = np.clip(np.floor((np.asarray(lat_max) + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    out: list[np.ndarray] = []
    for a, b, c, d in zip(x0, x1, y0, y1):
        xs = np.arange(a, b + 1, dtype=np.uint64)
        ys = np.arange(c, d + 1, dtype=np.uint64)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        out.append(_xy_to_cell(gx.ravel(), gy.ravel(), res))
    return out


# --- Planar cells (topology partitioning) -----------------------------------
# The topology engine is planar (the reference validates projected national
# grids, not the globe): cell = Morton(floor(x/size), floor(y/size)) with a
# 2^28 offset so negative coordinates pack cleanly. Res nibble = 31 marks
# planar ids so they can't collide with geo cells at any res.

_PLANAR_OFF = np.int64(1) << np.int64(28)
_PLANAR_RES = 31


def planar_cell(x: np.ndarray, y: np.ndarray, cell_size: float) -> np.ndarray:
    xi = (np.floor(np.asarray(x, np.float64) / cell_size).astype(np.int64) + _PLANAR_OFF)
    yi = (np.floor(np.asarray(y, np.float64) / cell_size).astype(np.int64) + _PLANAR_OFF)
    return _xy_to_cell(xi.astype(np.uint64), yi.astype(np.uint64), _PLANAR_RES)


def planar_bbox_cover(
    xmin: np.ndarray, ymin: np.ndarray, xmax: np.ndarray, ymax: np.ndarray, cell_size: float
) -> list[np.ndarray]:
    """Ragged list: all planar cells each bbox overlaps."""
    rows, cells = planar_cover_flat(xmin, ymin, xmax, ymax, cell_size)
    bounds = np.searchsorted(rows, np.arange(1, len(np.asarray(xmin))))
    return np.split(cells, bounds)


def planar_cover_flat(
    xmin: np.ndarray, ymin: np.ndarray, xmax: np.ndarray, ymax: np.ndarray, cell_size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exploded cover: (row_idx, cell) pairs for every cell each
    bbox overlaps — no per-row Python (hot path of rings→edges at scale)."""
    x0 = np.floor(np.asarray(xmin, np.float64) / cell_size).astype(np.int64) + _PLANAR_OFF
    x1 = np.floor(np.asarray(xmax, np.float64) / cell_size).astype(np.int64) + _PLANAR_OFF
    y0 = np.floor(np.asarray(ymin, np.float64) / cell_size).astype(np.int64) + _PLANAR_OFF
    y1 = np.floor(np.asarray(ymax, np.float64) / cell_size).astype(np.int64) + _PLANAR_OFF
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    total = nx * ny
    rows = np.repeat(np.arange(len(x0), dtype=np.int64), total)
    tsum = int(total.sum())
    off = np.arange(tsum, dtype=np.int64) - np.repeat(np.cumsum(total) - total, total)
    ny_r = ny[rows]
    xi = (x0[rows] + off // ny_r).astype(np.uint64)
    yi = (y0[rows] + off % ny_r).astype(np.uint64)
    return rows, _xy_to_cell(xi, yi, _PLANAR_RES)


def planar_owner_corner(
    axmin: np.ndarray, aymin: np.ndarray, bxmin: np.ndarray, bymin: np.ndarray, cell_size: float
) -> np.ndarray:
    """Deterministic owner cell for an overlapping bbox pair: the cell of
    the intersection rectangle's min corner (max of the two mins). The
    corner coords are selected, not computed, so no float drift."""
    return planar_cell(np.maximum(axmin, bxmin), np.maximum(aymin, bymin), cell_size)


# --- Spark surface: Arrow-batched pandas UDF factories ----------------------

def latlng_to_cell_udf(res: int):
    @F.pandas_udf(LongType())
    def _udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(latlng_to_cell(lon.to_numpy(), lat.to_numpy(), res))

    return _udf


def cell_to_parent_udf(parent_res: int):
    @F.pandas_udf(LongType())
    def _udf(cell: pd.Series) -> pd.Series:
        return pd.Series(cell_to_parent(cell.to_numpy(), parent_res))

    return _udf


def cell_ring_udf(k: int):
    @F.pandas_udf(ArrayType(LongType()))
    def _udf(cell: pd.Series) -> pd.Series:
        rings = cell_ring(cell.to_numpy(), k)
        return pd.Series([row[row >= 0] for row in rings])

    return _udf


def bbox_cover_udf(res: int):
    @F.pandas_udf(ArrayType(LongType()))
    def _udf(
        lon_min: pd.Series, lat_min: pd.Series, lon_max: pd.Series, lat_max: pd.Series
    ) -> pd.Series:
        return pd.Series(
            bbox_cover(
                lon_min.to_numpy(), lat_min.to_numpy(),
                lon_max.to_numpy(), lat_max.to_numpy(), res,
            )
        )

    return _udf


# --- geohash textual codec (base-32, interleaved-bisection standard) ----------
# Third cell-index dialect alongside the Morton quadkey and the planar grid:
# the textual geohash of Niemeyer's public scheme (lon bit first), swappable
# for the quadkey anywhere a string key is wanted (URL paths, Kafka keys,
# prefix-range scans — geohash prefixes ARE containment ranges).

_GH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)
_GH32_INV = np.full(256, 255, np.uint8)
_GH32_INV[_GH32] = np.arange(32, dtype=np.uint8)


def geohash_encode(lon: np.ndarray, lat: np.ndarray, precision: int = 8) -> np.ndarray:
    """Vectorized geohash of even `precision` (each axis gets 5p/2 bits).

    Returns an object array of ascii strings. Exact twin of the SQL form in
    operators.export._geohash_sql (same floor-scale then bit interleave)."""
    if precision % 2 or not 0 < precision <= 12:
        raise ValueError("precision must be even, in (0, 12]")
    half = 5 * precision // 2
    n = np.uint64(1) << np.uint64(half)
    xi = np.clip(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * float(n)),
                 0, float(n) - 1).astype(np.uint64)
    yi = np.clip(np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * float(n)),
                 0, float(n) - 1).astype(np.uint64)
    v = (_spread_bits32(xi) << np.uint64(1)) | _spread_bits32(yi)
    shifts = (np.arange(precision - 1, -1, -1, dtype=np.uint64) * np.uint64(5))
    idx = ((v[:, None] >> shifts[None, :]) & np.uint64(31)).astype(np.uint8)
    return (
        _GH32[idx]
        .view(f"S{precision}")
        .ravel()
        .astype(f"U{precision}")
        .astype(object)
    )


def geohash_decode_bounds(
    gh: np.ndarray, precision: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each geohash cell. Bounds are
    exact doubles: cell edges are xi * 360/2^half - 180 with dyadic-rational
    scale, so both engines agree bit for bit."""
    half = 5 * precision // 2
    b = (
        np.frombuffer("".join(gh).encode("ascii"), np.uint8)
        .reshape(-1, precision)
    )
    vals = _GH32_INV[b].astype(np.uint64)
    if (vals == 255).any():
        raise ValueError("invalid geohash character")
    v = np.zeros(len(b), np.uint64)
    for c in range(precision):
        v = (v << np.uint64(5)) | vals[:, c]
    xi = _compact_bits32(v >> np.uint64(1)).astype(np.float64)
    yi = _compact_bits32(v).astype(np.float64)
    wx = 360.0 / float(np.uint64(1) << np.uint64(half))
    wy = 180.0 / float(np.uint64(1) << np.uint64(half))
    return (
        xi * wx - 180.0,
        yi * wy - 90.0,
        (xi + 1.0) * wx - 180.0,
        (yi + 1.0) * wy - 90.0,
    )
