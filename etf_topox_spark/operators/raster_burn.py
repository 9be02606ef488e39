"""Vector -> raster: burn polygons into a tiled raster (rasterization).

The inverse of operators/raster_vector.py's contour tracing and the other
half of any raster<->vector engine (GDAL's rasterize / rasterio features):
given simple polygons, mark every pixel whose CENTER lies inside by the
even-odd rule, and report per-polygon burn statistics.

Exactness contract (what makes the oracle bit-for-bit): pixel centers sit
at half-integers (gx + 1/2, gy + 1/2) while polygon vertices are integers,
so the horizontal test ray NEVER passes through a vertex or along an edge
— no degenerate cases exist by construction. Each non-horizontal edge is
canonicalized upward (y1 < y2); it crosses the ray of pixel row gy iff
y1 <= gy < y2, and the crossing is right of the center iff

    2*x1*(y2 - y1) + (x2 - x1)*(2*gy + 1 - 2*y1) > (2*gx + 1)*(y2 - y1)

— the ray/edge intersection comparison cleared of its (positive)
denominator, pure int64 on both engines. Inside = odd crossing count.

Scale shape: the polygon table is the broadcast side (here module
constants; at 10^9 polygons you'd cell-index polygon bboxes and join tiles
to candidate polygons — the per-tile bbox prune below IS that pruning,
minus the index). The raster side is map-only: each tile evaluates only
the edges whose polygon bbox intersects it and emits ONE pre-reduced row
per (tile, polygon) — pixels never cross an exchange, and the final
groupBy(poly_id) moves O(tiles * polygons-overlapping-a-tile) stat rows.

Oracle: identical polygons inlined as VALUES; the same integer crossing
predicate joins the pixel grid to edges; parity by COUNT(*) % 2.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query

BW = 256   # burn-raster width/height (256 x 256, 16 tiles of 64)
BTILE = 64
N_POLY = 40


def _gen_polygons() -> list[list[tuple[int, int]]]:
    """Deterministic simple star polygons with integer vertices. Angles
    are sorted around the center, so the ring can never self-intersect.
    Generated once per process; the Spark kernel and the oracle SQL are
    built from the SAME list, so engine agreement is by construction."""
    polys: list[list[tuple[int, int]]] = []
    for k in range(N_POLY):
        h = (k * 2654435761 + 97) % 2_147_483_647
        cx = 20 + h % (BW - 40)
        cy = 20 + (h // BW) % (BW - 40)
        nv = 3 + (h // 7) % 6
        rbase = 6 + (h // 11) % 14
        pts = []
        for j in range(nv):
            ang = 2 * math.pi * j / nv + (h % 360) * math.pi / 180.0
            rj = rbase + ((h // (13 + j)) % 7)
            x = cx + int(round(rj * math.cos(ang)))
            y = cy + int(round(rj * math.sin(ang)))
            pts.append((max(0, min(BW - 1, x)), max(0, min(BW - 1, y))))
        # rounding can collapse tiny polygons to a segment; nudge by
        # construction instead of filtering so poly ids stay dense
        if len({p for p in pts}) < 3:
            pts = [(cx, cy), (cx + 5, cy + 1), (cx + 1, cy + 5)]
        polys.append(pts)
    return polys


POLYGONS = _gen_polygons()


def _edges_upward() -> list[tuple[int, int, int, int, int]]:
    """(poly_id, x1, y1, x2, y2) with y1 < y2; horizontal edges dropped
    (a half-integer ray never crosses them)."""
    out = []
    for pid, pts in enumerate(POLYGONS):
        for a, b in zip(pts, pts[1:] + pts[:1]):
            if a[1] == b[1]:
                continue
            lo, hi = (a, b) if a[1] < b[1] else (b, a)
            out.append((pid, lo[0], lo[1], hi[0], hi[1]))
    return out


EDGES = _edges_upward()
_EDGES_BY_PID: dict[int, list[tuple[int, int, int, int]]] = {}
for _pid, _x1, _y1, _x2, _y2 in EDGES:
    _EDGES_BY_PID.setdefault(_pid, []).append((_x1, _y1, _x2, _y2))

_BURN_SCHEMA = (
    "poly_id int, n_px long, sum_x long, sum_y long, "
    "min_x long, min_y long, max_x long, max_y long"
)


def _burn_tile(tx: int, ty: int, tile: int) -> pd.DataFrame:
    """Scanline-parity burn of one tile against every bbox-overlapping
    polygon; returns one pre-reduced stats row per burned polygon."""
    gx0, gy0 = tx * tile, ty * tile
    gx = np.arange(gx0, gx0 + tile, dtype=np.int64)
    gy = np.arange(gy0, gy0 + tile, dtype=np.int64)
    GX, GY = np.meshgrid(gx, gy)
    rows = []
    for pid, pts in enumerate(POLYGONS):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        if min(xs) > gx0 + tile - 1 or min(ys) > gy0 + tile - 1:
            continue
        if max(ys) < gy0 or max(xs) < gx0:  # ray goes +x: need poly right of col 0?
            # the ray extends to +inf in x, so a polygon strictly LEFT of
            # the tile can still not cross (crossings must be > center);
            # strictly above/below never crosses. Keep the x prune only
            # for polygons entirely left: no crossing can be right of any
            # center in this tile.
            continue
        cross = np.zeros((tile, tile), dtype=np.int64)
        for x1, y1, x2, y2 in _EDGES_BY_PID.get(pid, ()):
            yspan = (y1 <= GY) & (GY < y2)
            if not yspan.any():
                continue
            dy = y2 - y1
            lhs = 2 * x1 * dy + (x2 - x1) * (2 * GY + 1 - 2 * y1)
            rhs = (2 * GX + 1) * dy
            cross += (yspan & (lhs > rhs)).astype(np.int64)
        inside = (cross % 2) == 1
        if inside.any():
            fx, fy = GX[inside], GY[inside]
            rows.append((pid, int(inside.sum()), int(fx.sum()), int(fy.sum()),
                         int(fx.min()), int(fy.min()), int(fx.max()), int(fy.max())))
    return pd.DataFrame(rows, columns=[
        "poly_id", "n_px", "sum_x", "sum_y", "min_x", "min_y", "max_x", "max_y",
    ])


def burn_stats(spark: SparkSession, tile: int = BTILE) -> DataFrame:
    """Distributed burn: map-only tile kernel -> per-polygon re-aggregation.
    Bit-identical under any tile size dividing the raster (tests pin 64
    vs 32)."""
    if BW % tile:
        raise ValueError(f"tile {tile} must divide raster {BW}")
    tpr = BW // tile
    n_tiles = tpr * tpr
    par = min(n_tiles, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n_tiles, 1, par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for t in pdf["id"].to_numpy():
                yield _burn_tile(int(t) % tpr, int(t) // tpr, tile)

    part = rng.mapInPandas(gen, _BURN_SCHEMA)
    return (
        part.groupBy("poly_id")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.min("min_x").alias("min_x"),
            F.min("min_y").alias("min_y"),
            F.max("max_x").alias("max_x"),
            F.max("max_y").alias("max_y"),
            F.sum("sum_x").alias("sum_x"),
            F.sum("sum_y").alias("sum_y"),
        )
        .orderBy("poly_id")
    )


def _burn_sql() -> str:
    vals = ",\n    ".join(
        f"({pid}, {x1}, {y1}, {x2}, {y2})" for pid, x1, y1, x2, y2 in EDGES
    )
    return f"""WITH
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({BW})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({BW})),
px AS (SELECT gx, gy FROM xs CROSS JOIN ys),
edges(poly_id, x1, y1, x2, y2) AS (VALUES
    {vals}
),
cr AS (
  SELECT e.poly_id, p.gx, p.gy
  FROM px p JOIN edges e
    ON e.y1 <= p.gy AND p.gy < e.y2
   AND 2 * e.x1 * (e.y2 - e.y1) + (e.x2 - e.x1) * (2 * p.gy + 1 - 2 * e.y1)
       > (2 * p.gx + 1) * (e.y2 - e.y1)
),
inside AS (
  SELECT poly_id, gx, gy
  FROM cr GROUP BY poly_id, gx, gy HAVING COUNT(*) % 2 = 1
)
SELECT poly_id,
       COUNT(*) AS n_px,
       MIN(gx) AS min_x, MIN(gy) AS min_y,
       MAX(gx) AS max_x, MAX(gy) AS max_y,
       CAST(SUM(gx) AS BIGINT) AS sum_x,
       CAST(SUM(gy) AS BIGINT) AS sum_y
FROM inside
GROUP BY poly_id
ORDER BY poly_id
"""


@query("raster_burn_polygons", oracle=_burn_sql())
def raster_burn_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burn the {N_POLY} deterministic star polygons into the {BW}x{BW}
    raster and return per-polygon (n_px, bbox, coordinate sums). See the
    module docstring for the exact integer even-odd rule shared with the
    oracle."""
    return burn_stats(spark)
