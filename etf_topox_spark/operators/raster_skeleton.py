"""Morphological skeletonization (Zhang-Suen thinning) over the DEM blob
mask — iterated stencil with ghost-zone tiles (SURVEY.md §2.C raster
family; the centerline-extraction primitive behind river networks, road
vectorization and OCR stroke analysis).

Zhang-Suen (1984), parallel variant: each of 2*N_ITERS subpasses deletes
every foreground pixel whose ring satisfies (2 <= B <= 6, A == 1, and the
subpass's two corner-product conditions) simultaneously against the
PREVIOUS mask. The mask is the DEM diamond-blob field h(x, y) <= MASK_T
(operators/raster_watershed.py heights), thinned to its medial axes.

Scale shape — the s-step stencil / ghost-zone plan: a k-subpass
iteration's value at a pixel depends only on pixels within distance k, so
a tile augmented with a halo of width 2*N_ITERS computes ALL subpasses
locally and emits exactly its interior. Because iteration-0 state is
formula-derivable, the halo costs nothing here (map-only, zero
exchanges); with stored rasters the SAME kernel runs after ONE halo-deep
exchange — trading 2*N_ITERS halo-1 shuffles for one, the standard
communication-avoiding stencil optimization. Output is a per-16-row-band
census (one pre-reduced row per band per tile crosses the single
aggregation exchange).

Oracle: a recursive CTE whose state is the ENTIRE raster as a LIST of row
LISTs (the image_seam/trajectory_dtw pattern scaled up), stepping the
identical simultaneous update with nested list_transform — a completely
different evaluation engine for the same 16-subpass fixpoint prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_watershed import P, WS, _h_sql
from etf_topox_spark.registry import query

MASK_T = 6     # h <= MASK_T is foreground (diamonds of radius MASK_T)
N_ITERS = 8    # full iterations; 2*N_ITERS subpasses
TILE = 64
HALO = 2 * N_ITERS
BAND = 16

# Zhang-Suen ring p2..p9 (N, NE, E, SE, S, SW, W, NW)
_RING = [(0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1)]


def _nbr(dx: int, dy: int) -> str:
    """Previous-mask value at (x+dx, y+dy), zero outside the raster
    (1-indexed nested-list state ``m``; x, y are lambda variables)."""
    return (
        f"(CASE WHEN x + {dx} >= 0 AND x + {dx} < {WS}"
        f" AND y + {dy} >= 0 AND y + {dy} < {WS}"
        f" THEN m[y + {dy} + 1][x + {dx} + 1] ELSE 0 END)"
    )


def _delete_cond(parity: int) -> str:
    g = [_nbr(dx, dy) for dx, dy in _RING]  # p2..p9
    b = " + ".join(g)
    a = " + ".join(
        f"(CASE WHEN {g[k]} = 0 AND {g[(k + 1) % 8]} = 1 THEN 1 ELSE 0 END)"
        for k in range(8)
    )
    p2, p4, p6, p8 = g[0], g[2], g[4], g[6]
    if parity == 0:
        c1 = f"({p2} = 0 OR {p4} = 0 OR {p6} = 0)"
        c2 = f"({p4} = 0 OR {p6} = 0 OR {p8} = 0)"
    else:
        c1 = f"({p2} = 0 OR {p4} = 0 OR {p8} = 0)"
        c2 = f"({p2} = 0 OR {p6} = 0 OR {p8} = 0)"
    return (
        f"m[y + 1][x + 1] = 1 AND ({b}) BETWEEN 2 AND 6"
        f" AND ({a}) = 1 AND {c1} AND {c2}"
    )


def _skel_sql() -> str:
    base = (
        f"list_transform(range({WS}), y -> list_transform(range({WS}), x -> "
        f"CASE WHEN {_h_sql('x', 'y')} <= {MASK_T} THEN 1 ELSE 0 END))"
    )
    steps = []
    for parity in (0, 1):
        steps.append(
            f"list_transform(range({WS}), y -> list_transform(range({WS}), x -> "
            f"CASE WHEN {_delete_cond(parity)} THEN 0 ELSE m[y + 1][x + 1] END))"
        )
    return f"""
WITH RECURSIVE thin AS (
  SELECT 0 AS it, {base} AS m
  UNION ALL
  SELECT it + 1,
         CASE WHEN it % 2 = 0 THEN {steps[0]} ELSE {steps[1]} END
  FROM thin WHERE it < {2 * N_ITERS}
),
fin AS (SELECT m FROM thin WHERE it = {2 * N_ITERS}),
ini AS (SELECT m AS m0 FROM thin WHERE it = 0),
cells AS (
  SELECT y.range AS y, x.range AS x,
         (SELECT m FROM fin)[y.range + 1][x.range + 1] AS v,
         (SELECT m0 FROM ini)[y.range + 1][x.range + 1] AS v0
  FROM range({WS}) x, range({WS}) y
)
SELECT y // {BAND} AS band,
       CAST(SUM(v0) AS BIGINT) AS n_fg_initial,
       CAST(SUM(v) AS BIGINT) AS n_fg_skeleton,
       CAST(SUM(CASE WHEN v = 1 THEN x ELSE 0 END) AS BIGINT) AS sum_x
FROM cells GROUP BY 1 ORDER BY band
"""


def _thin_numpy(m: "np.ndarray", subpasses: int) -> "np.ndarray":  # noqa: F821
    import numpy as np

    for it in range(subpasses):
        p = np.zeros((8,) + m.shape, dtype=m.dtype)
        pad = np.pad(m, 1)
        for k, (dx, dy) in enumerate(_RING):
            p[k] = pad[1 + dy:1 + dy + m.shape[0], 1 + dx:1 + dx + m.shape[1]]
        b = p.sum(axis=0)
        a = sum(
            ((p[k] == 0) & (p[(k + 1) % 8] == 1)).astype(m.dtype) for k in range(8)
        )
        p2, p4, p6, p8 = p[0], p[2], p[4], p[6]
        if it % 2 == 0:
            cond = ((p2 == 0) | (p4 == 0) | (p6 == 0)) & (
                (p4 == 0) | (p6 == 0) | (p8 == 0))
        else:
            cond = ((p2 == 0) | (p4 == 0) | (p8 == 0)) & (
                (p2 == 0) | (p6 == 0) | (p8 == 0))
        delete = (m == 1) & (b >= 2) & (b <= 6) & (a == 1) & cond
        m = np.where(delete, 0, m)
    return m


def _dem_mask(x0: int, y0: int, x1: int, y1: int) -> "np.ndarray":  # noqa: F821
    """Foreground mask of the clipped window [x0,x1) x [y0,y1).

    Runs ON EXECUTORS inside the tile kernel: no package imports in the
    body — P is captured from module globals at pickle time, so the
    function works under BOTH shipping modes (addPyFile by-reference and
    the pre-session cloudpickle-by-value fallback, registry._ship_package)."""
    import numpy as np

    xs = np.arange(x0, x1)
    ys = np.arange(y0, y1)
    px = ((xs // P) * 7919 + 13) % P
    py = ((ys // P) * 104729 + 7) % P
    h = np.abs(xs % P - px)[None, :] + np.abs(ys % P - py)[:, None]
    return (h <= MASK_T).astype(np.int64)


@query("raster_skeletonize", oracle=_skel_sql())
def raster_skeletonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zhang-Suen skeleton census per 16-row band after 2*N_ITERS
    subpasses: initial and skeleton foreground mass plus an x-checksum
    (module docstring). Ghost-zone tiles: each tile materializes its
    HALO-augmented window, thins locally, emits interior partials."""
    import pandas as pd

    tiles = WS // TILE
    grid = spark.range(0, tiles * tiles, 1,
                       spark.sparkContext.defaultParallelism).select(
        (F.col("id") % tiles).alias("tx"),
        F.expr(f"id DIV {tiles}").alias("ty"),
    )

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                x0 = max(0, r.tx * TILE - HALO)
                y0 = max(0, r.ty * TILE - HALO)
                x1 = min(WS, (r.tx + 1) * TILE + HALO)
                y1 = min(WS, (r.ty + 1) * TILE + HALO)
                m0 = _dem_mask(x0, y0, x1, y1)
                m = _thin_numpy(m0.copy(), 2 * N_ITERS)
                # interior of this tile within the clipped window
                ix0, iy0 = r.tx * TILE - x0, r.ty * TILE - y0
                rows = []
                for yy in range(r.ty * TILE, (r.ty + 1) * TILE):
                    band = yy // BAND
                    sl_f = m[iy0 + yy - r.ty * TILE, ix0:ix0 + TILE]
                    sl_0 = m0[iy0 + yy - r.ty * TILE, ix0:ix0 + TILE]
                    xs = np.arange(r.tx * TILE, (r.tx + 1) * TILE)
                    rows.append(
                        (band, int(sl_0.sum()), int(sl_f.sum()),
                         int((xs * sl_f).sum()))
                    )
                yield pd.DataFrame(
                    rows, columns=["band", "n_fg_initial", "n_fg_skeleton", "sum_x"]
                )

    return (
        grid.mapInPandas(
            kernel,
            "band long, n_fg_initial long, n_fg_skeleton long, sum_x long",
        )
        .groupBy("band")
        .agg(
            F.sum("n_fg_initial").alias("n_fg_initial"),
            F.sum("n_fg_skeleton").alias("n_fg_skeleton"),
            F.sum("sum_x").alias("sum_x"),
        )
        .orderBy("band")
    )
