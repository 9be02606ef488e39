"""Halo-exchange focal (neighborhood) analysis over a tiled raster.

The canonical distributed-raster primitive (GDAL focal stats / map-algebra
FocalStatistics): every pixel's value depends on its 3x3 neighborhood, so
tiles are NOT independent — each tile needs a 1-pixel "halo" of its eight
neighbors' border pixels. This module implements the real exchange:

  stage 1 (map-only Arrow kernel, one pass per tile):
    - materialize the tile's mask (here the deterministic blob lattice of
      operators/raster_ccl.py; in production a co-partitioned read of the
      stored tile — the kernel is identical, only the source line changes);
    - compute the focal sum (number of fg pixels in the 3x3 window,
      center included, zero-padded outside the raster) for every INTERIOR
      pixel — a pixel whose window never leaves this tile except off the
      raster edge — and pre-reduce those to (is_fg, nsum, count) partials;
    - emit the tile's fg BORDER pixels as halo rows keyed by each
      neighboring tile id whose halo window contains them (up to 8
      destinations for a corner pixel), plus one sentinel row to itself so
      every tile forms a stage-2 group even with all-background halos.
  stage 2 (the only shuffle):
    - groupBy(dest tile) over halo + sentinel rows; the kernel rebuilds
      its own tile, pastes the received fg pixels into a (t+2)^2 padded
      frame, and evaluates the focal sum for exactly the BORDER-ring
      pixels stage 1 skipped — then the partials re-aggregate globally.

Scale shape: interior pixels never cross an exchange; the shuffle carries
O(perimeter * fg-density) rows per tile (<= 4t + 4 and only foreground),
so a 10^12-pixel raster in 4096^2-pixel tiles moves ~0.1% of its pixels,
pre-filtered to foreground. The final aggregate is <= 19 rows. Hot keys
are impossible: each stage-2 group holds at most 8 strips + 4 corners.

Correctness: the DuckDB oracle re-derives the identical mask in SQL
(shared lattice CTEs from raster_ccl) and computes every pixel's focal
sum by scattering each fg pixel onto its 9 neighbors and re-grouping —
a completely different evaluation order, bit-equal histogram. The pytest
adds a single-node numpy replay and tile-size invariance (64 vs 32).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_ccl import (
    H,
    PA,
    PB,
    SEED_A,
    SEED_B,
    TILE,
    W,
    _fg_sql_one,
    raster_fg,
)
from etf_topox_spark.registry import query

_S1_SCHEMA = "kind int, dest long, gx long, gy long, is_fg int, nsum int, n_px long"
_S2_SCHEMA = "is_fg int, nsum int, n_px long"


def _focal_sum(fg: np.ndarray) -> np.ndarray:
    """3x3 focal sum (center included) of a boolean array, zero-padded."""
    h, w = fg.shape
    pad = np.zeros((h + 2, w + 2), dtype=np.int32)
    pad[1:-1, 1:-1] = fg
    out = np.zeros((h, w), dtype=np.int32)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out += pad[dy:dy + h, dx:dx + w]
    return out


def _interior_slices(tx: int, ty: int, tiles_x: int, tiles_y: int, t: int):
    """Local-coordinate slices of the pixels whose 3x3 window never needs
    a neighbor tile (windows off the raster edge are zero padding, which
    the tile evaluates correctly on its own)."""
    y0 = 1 if ty > 0 else 0
    y1 = t - 1 if ty < tiles_y - 1 else t
    x0 = 1 if tx > 0 else 0
    x1 = t - 1 if tx < tiles_x - 1 else t
    return slice(y0, y1), slice(x0, x1)


def _hist_rows(fg: np.ndarray, ns: np.ndarray) -> list[tuple[int, int, int]]:
    """Pre-reduce (is_fg, nsum) pairs to counted partial rows."""
    key = fg.astype(np.int64) * 16 + ns.astype(np.int64)
    uniq, cnt = np.unique(key.ravel(), return_counts=True)
    return [(int(k // 16), int(k % 16), int(c)) for k, c in zip(uniq, cnt)]


def _stage1(tile_id: int, t: int, tiles_x: int, tiles_y: int) -> pd.DataFrame:
    tx, ty = tile_id % tiles_x, tile_id // tiles_x
    gx0, gy0 = tx * t, ty * t
    GX, GY = np.meshgrid(
        np.arange(gx0, gx0 + t, dtype=np.int64),
        np.arange(gy0, gy0 + t, dtype=np.int64),
    )
    fg = raster_fg(GX, GY)
    ns = _focal_sum(fg)

    rows: list[tuple] = []
    sy, sx = _interior_slices(tx, ty, tiles_x, tiles_y, t)
    for is_fg, nsum, cnt in _hist_rows(fg[sy, sx], ns[sy, sx]):
        rows.append((0, -1, -1, -1, is_fg, nsum, cnt))

    # halo: this tile's fg border pixels, routed to every neighbor whose
    # 1-px halo window contains them (strips to the 4 sides, single corner
    # pixels to the 4 diagonals)
    def emit(mask2d: np.ndarray, dtx: int, dty: int) -> None:
        ntx, nty = tx + dtx, ty + dty
        if not (0 <= ntx < tiles_x and 0 <= nty < tiles_y):
            return
        dest = nty * tiles_x + ntx
        m = mask2d & fg
        if m.any():
            rows.extend(
                (1, dest, int(x), int(y), 0, 0, 0)
                for x, y in zip(GX[m], GY[m])
            )

    edge = np.zeros((t, t), dtype=bool)
    for dtx, dty in ((-1, 0), (1, 0), (0, -1), (0, 1),
                     (-1, -1), (1, -1), (-1, 1), (1, 1)):
        edge[:] = False
        if dtx == -1:
            edge[:, 0] = True
        elif dtx == 1:
            edge[:, -1] = True
        else:
            edge[:, :] = True
        keep = np.zeros((t, t), dtype=bool)
        if dty == -1:
            keep[0, :] = True
        elif dty == 1:
            keep[-1, :] = True
        else:
            keep[:, :] = True
        emit(edge & keep, dtx, dty)

    rows.append((2, tile_id, -1, -1, 0, 0, 0))  # sentinel: form the group
    return pd.DataFrame(rows, columns=[
        "kind", "dest", "gx", "gy", "is_fg", "nsum", "n_px",
    ])


def focal_histogram(spark: SparkSession, tile: int = TILE) -> DataFrame:
    """Global (is_fg, focal_sum) histogram of the blob raster, computed
    with a real halo exchange. Bit-identical under any tile size dividing
    the raster (tests pin 64 vs 32)."""
    if W % tile or H % tile:
        raise ValueError(f"tile {tile} must divide raster {W}x{H}")
    tiles_x, tiles_y = W // tile, H // tile
    n_tiles = tiles_x * tiles_y
    par = min(n_tiles, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n_tiles, 1, par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf["id"].to_numpy():
                yield _stage1(int(i), tile, tiles_x, tiles_y)

    s1 = rng.mapInPandas(gen, _S1_SCHEMA).localCheckpoint(eager=False)
    interior = s1.filter(F.col("kind") == 0).select("is_fg", "nsum", "n_px")
    halo = s1.filter(F.col("kind") >= 1).select("kind", "dest", "gx", "gy")

    def border(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tid = int(key[0])
        tx, ty = tid % tiles_x, tid // tiles_x
        gx0, gy0 = tx * tile, ty * tile
        GX, GY = np.meshgrid(
            np.arange(gx0, gx0 + tile, dtype=np.int64),
            np.arange(gy0, gy0 + tile, dtype=np.int64),
        )
        fg = raster_fg(GX, GY)  # production: co-partitioned tile read
        pad = np.zeros((tile + 2, tile + 2), dtype=np.int32)
        pad[1:-1, 1:-1] = fg
        hx = pdf.loc[pdf["kind"] == 1, "gx"].to_numpy() - gx0 + 1
        hy = pdf.loc[pdf["kind"] == 1, "gy"].to_numpy() - gy0 + 1
        pad[hy, hx] = 1
        h, w = tile, tile
        ns = np.zeros((h, w), dtype=np.int32)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                ns += pad[dy:dy + h, dx:dx + w]
        ring = np.ones((tile, tile), dtype=bool)
        sy, sx = _interior_slices(tx, ty, tiles_x, tiles_y, tile)
        ring[sy, sx] = False
        if not ring.any():
            return pd.DataFrame(columns=["is_fg", "nsum", "n_px"])
        return pd.DataFrame(
            _hist_rows(fg[ring], ns[ring]), columns=["is_fg", "nsum", "n_px"]
        )

    ring_part = halo.groupBy("dest").applyInPandas(border, _S2_SCHEMA)
    return (
        interior.unionAll(ring_part)
        .groupBy("is_fg", "nsum")
        .agg(F.sum("n_px").alias("n_px"))
        .orderBy("is_fg", "nsum")
    )


def _focal_sql() -> str:
    offs = ",\n    ".join(
        f"({dx}, {dy})" for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    )
    return f"""WITH
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({W})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({H})),
px AS (SELECT gx, gy FROM xs CROSS JOIN ys),
{_fg_sql_one(PA, SEED_A, 'ca')},
{_fg_sql_one(PB, SEED_B, 'cb')},
fg AS (
  SELECT p.gx, p.gy
  FROM px p
  JOIN ca ON ca.cx = p.gx // {PA} AND ca.cy = p.gy // {PA}
  JOIN cb ON cb.cx = p.gx // {PB} AND cb.cy = p.gy // {PB}
  WHERE (ca.present AND
         (p.gx % {PA} - ca.ox) * (p.gx % {PA} - ca.ox)
       + (p.gy % {PA} - ca.oy) * (p.gy % {PA} - ca.oy) <= ca.r * ca.r)
     OR (cb.present AND
         (p.gx % {PB} - cb.ox) * (p.gx % {PB} - cb.ox)
       + (p.gy % {PB} - cb.oy) * (p.gy % {PB} - cb.oy) <= cb.r * cb.r)
),
offsets(dx, dy) AS (VALUES
    {offs}
),
scatter AS (
  SELECT f.gx + o.dx AS x, f.gy + o.dy AS y, COUNT(*) AS nsum
  FROM fg f CROSS JOIN offsets o
  WHERE f.gx + o.dx BETWEEN 0 AND {W - 1}
    AND f.gy + o.dy BETWEEN 0 AND {H - 1}
  GROUP BY 1, 2
),
covered AS (
  SELECT CASE WHEN g.gx IS NULL THEN 0 ELSE 1 END AS is_fg, s.nsum
  FROM scatter s LEFT JOIN fg g ON g.gx = s.x AND g.gy = s.y
)
SELECT is_fg, CAST(nsum AS INT) AS nsum, COUNT(*) AS n_px
FROM covered GROUP BY is_fg, nsum
UNION ALL
SELECT 0 AS is_fg, 0 AS nsum,
       {W} * {H} - (SELECT COUNT(*) FROM scatter) AS n_px
ORDER BY is_fg, nsum
"""


@query("raster_focal_halo", oracle=_focal_sql())
def raster_focal_halo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of 3x3 focal sums over the {W}x{H} blob raster, split by
    pixel foreground status, computed with the real tile-halo exchange of
    the module docstring. The oracle evaluates the same focal field by
    scatter-and-regroup in SQL — a different evaluation order, bit-equal."""
    return focal_histogram(spark)
