"""Per-component shape descriptors over the distributed CCL raster.

Extends operators/raster_ccl.py's two-stage labeling with the adjacency
census needed for shape analysis: for a 4-connected component of n pixels
with E internal 4-adjacencies, the crack-boundary perimeter is exactly

    perimeter = 4*n - 2*E

(each pixel contributes 4 crack sides; every internal adjacency hides two
of them). E decomposes tile-locally + cross-tile exactly like the labels
themselves: stage 1 counts the adjacencies INSIDE each tile per local
label (two shifted boolean ANDs, vectorized), and every stage-2 crack
seen from BOTH sides as foreground is one more adjacency for the merged
component — the same crack rows that drive the label merge, reused as
the perimeter correction. Nothing new crosses the exchange.

Outputs (comp_id, n_px, perimeter, bbox_fill_pct) — the latter an exact
integer basis-point fill ratio (10000 * n / bbox area), the standard
compactness screen for blob filtering.

Oracle: the recursive-CTE labeling of raster_ccl's SQL twin, extended
with the adjacency count per root (eh/ev edge CTEs grouped by the walk's
root label) — bit-exact, a completely independent evaluation order.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_ccl import (
    H,
    TILE,
    W,
    _ccl_fg_sql,
    local_ccl,
    raster_fg,
)
from etf_topox_spark.registry import query

_S1_SCHEMA = (
    "kind int, lbl long, n_px long, e_in long, "
    "min_x long, min_y long, max_x long, max_y long, crack long"
)


def _tile_shape_rows(tile_id: int, tile: int, tiles_x: int, tiles_y: int) -> pd.DataFrame:
    """Stage-1 kernel: local CCL -> per-label (count, internal adjacencies,
    bbox) + the same border-crack rows raster_ccl uses for the merge."""
    tx, ty = tile_id % tiles_x, tile_id // tiles_x
    gx0, gy0 = tx * tile, ty * tile
    gx = np.arange(gx0, gx0 + tile, dtype=np.int64)
    gy = np.arange(gy0, gy0 + tile, dtype=np.int64)
    GX, GY = np.meshgrid(gx, gy)
    fg = raster_fg(GX, GY)
    pid = GY * W + GX
    lab = local_ccl(fg, pid)

    rows: list[tuple] = []
    if fg.any():
        fl, fx, fy = lab[fg], GX[fg], GY[fg]
        uniq, inv = np.unique(fl, return_inverse=True)
        cnt = np.bincount(inv)
        mnx = np.full(len(uniq), np.iinfo(np.int64).max)
        mny = mnx.copy()
        mxx = np.full(len(uniq), np.iinfo(np.int64).min)
        mxy = mxx.copy()
        np.minimum.at(mnx, inv, fx)
        np.minimum.at(mny, inv, fy)
        np.maximum.at(mxx, inv, fx)
        np.maximum.at(mxy, inv, fy)
        # internal adjacencies per label: 4-adjacent fg pixels always share
        # a local label, so attributing the pair to the left/top pixel's
        # label is unambiguous
        eacc: dict[int, int] = {}
        hpair = fg[:, :-1] & fg[:, 1:]
        if hpair.any():
            ls, cs = np.unique(lab[:, :-1][hpair], return_counts=True)
            for lb, c in zip(ls, cs):
                eacc[int(lb)] = eacc.get(int(lb), 0) + int(c)
        vpair = fg[:-1, :] & fg[1:, :]
        if vpair.any():
            ls, cs = np.unique(lab[:-1, :][vpair], return_counts=True)
            for lb, c in zip(ls, cs):
                eacc[int(lb)] = eacc.get(int(lb), 0) + int(c)
        for i, lb in enumerate(uniq):
            rows.append((0, int(lb), int(cnt[i]), eacc.get(int(lb), 0),
                         int(mnx[i]), int(mny[i]), int(mxx[i]), int(mxy[i]), -1))
        edges = []
        if tx < tiles_x - 1:
            m = fg[:, -1]
            edges.append((lab[:, -1][m], pid[:, -1][m] * 2))
        if tx > 0:
            m = fg[:, 0]
            edges.append((lab[:, 0][m], (pid[:, 0][m] - 1) * 2))
        if ty < tiles_y - 1:
            m = fg[-1, :]
            edges.append((lab[-1, :][m], pid[-1, :][m] * 2 + 1))
        if ty > 0:
            m = fg[0, :]
            edges.append((lab[0, :][m], (pid[0, :][m] - W) * 2 + 1))
        for lbs, cks in edges:
            rows.extend((1, int(lb), 0, 0, 0, 0, 0, 0, int(ck))
                        for lb, ck in zip(lbs, cks))
    return pd.DataFrame(rows, columns=[
        "kind", "lbl", "n_px", "e_in", "min_x", "min_y", "max_x", "max_y", "crack",
    ])


def shape_stats(spark: SparkSession, tile: int = TILE) -> DataFrame:
    """(comp_id, n_px, perimeter, bbox_fill_pct) per global component."""
    if W % tile or H % tile:
        raise ValueError(f"tile {tile} must divide raster {W}x{H}")
    tiles_x, tiles_y = W // tile, H // tile
    n_tiles = tiles_x * tiles_y
    par = min(n_tiles, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n_tiles, 1, par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for t in pdf["id"].to_numpy():
                yield _tile_shape_rows(int(t), tile, tiles_x, tiles_y)

    out = rng.mapInPandas(gen, _S1_SCHEMA).localCheckpoint(eager=False)
    stats = out.filter(F.col("kind") == 0).drop("kind", "crack")
    border = out.filter(F.col("kind") == 1).select("crack", "lbl")
    both = (
        border.groupBy("crack")
        .agg(
            F.min("lbl").alias("src"),
            F.max("lbl").alias("dst"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") == 2)
    )
    pairs = (
        both.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    from etf_topox_spark.operators.topology import connected_components

    labels = connected_components(pairs)
    # cross-tile adjacencies: every both-fg crack is one adjacency of the
    # merged component (src may equal dst when a component re-meets itself
    # across the boundary — still one adjacency)
    cross = both.select("src").join(
        labels, both["src"] == labels["node"], "left"
    ).select(F.coalesce(F.col("root"), F.col("src")).alias("root"))
    cross_e = cross.groupBy("root").agg(F.count(F.lit(1)).alias("e_cross"))

    merged = (
        stats.join(labels, stats["lbl"] == labels["node"], "left")
        .withColumn("root", F.coalesce(F.col("root"), F.col("lbl")))
        .groupBy("root")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.sum("e_in").alias("e_in"),
            F.min("min_x").alias("min_x"),
            F.min("min_y").alias("min_y"),
            F.max("max_x").alias("max_x"),
            F.max("max_y").alias("max_y"),
        )
        .join(cross_e, "root", "left")
        .withColumn("e_cross", F.coalesce(F.col("e_cross"), F.lit(0)))
    )
    bbox = (F.col("max_x") - F.col("min_x") + 1) * (
        F.col("max_y") - F.col("min_y") + 1
    )
    return merged.select(
        F.col("root").alias("comp_id"),
        "n_px",
        (4 * F.col("n_px") - 2 * (F.col("e_in") + F.col("e_cross"))).alias("perimeter"),
        F.expr("10000 * n_px DIV ((max_x - min_x + 1) * (max_y - min_y + 1))").alias(
            "bbox_fill_pct"
        ),
    ).orderBy("comp_id")


_SHAPE_SQL = f"""{_ccl_fg_sql()},
adj AS (
  SELECT l.root, COUNT(*) AS e
  FROM (SELECT s FROM eh UNION ALL SELECT s FROM ev) a
  JOIN lab l ON l.pid = a.s
  GROUP BY l.root
),
base AS (
  SELECT l.root AS comp_id, COUNT(*) AS n_px,
         MIN(f.gx) AS min_x, MIN(f.gy) AS min_y,
         MAX(f.gx) AS max_x, MAX(f.gy) AS max_y
  FROM lab l JOIN fg f ON f.pid = l.pid
  GROUP BY l.root
)
SELECT b.comp_id, b.n_px,
       4 * b.n_px - 2 * COALESCE(a.e, 0) AS perimeter,
       10000 * b.n_px // ((b.max_x - b.min_x + 1) * (b.max_y - b.min_y + 1))
         AS bbox_fill_pct
FROM base b LEFT JOIN adj a ON a.root = b.comp_id
ORDER BY b.comp_id
"""


@query("raster_ccl_shape", oracle=_SHAPE_SQL)
def raster_ccl_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crack-boundary perimeter and bbox fill ratio for every global
    component of the blob raster, via the tile-decomposed adjacency census
    (module docstring). The oracle recounts adjacencies per root from the
    recursive labeling — an independent evaluation order, bit-exact."""
    return shape_stats(spark)
