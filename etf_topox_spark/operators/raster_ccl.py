"""Distributed two-stage connected-component labeling over a tiled raster.

The canonical "big raster" operator a 100 TB geospatial/image pipeline
needs (SURVEY.md §2.C raster family; BASELINE.json north star's
raster-tile <-> vector assignment generalized to component extraction):
label the 4-connected foreground components of a raster far too large for
any single machine, given only independent tiles.

Algorithm (public two-stage CCL, e.g. "Parallel Connected-Component
Labeling" literature; no reference code involved):

  stage 1 (map-only Arrow kernel, one pass per tile):
    - synthesize the tile's mask from the deterministic blob-lattice
      formula (same integer formula the DuckDB oracle evaluates in SQL,
      so any tile is generatable independently — the property that makes
      the source embarrassingly parallel at 10^12 pixels);
    - local CCL by vectorized min-label propagation (labels are GLOBAL
      pixel ids, so the per-tile labeling is globally unambiguous);
    - emit ONE stats row per local component (count / bbox / coordinate
      sums) and ONE row per foreground border pixel keyed by the global
      "crack" id of the tile-boundary edge it touches.
  stage 2 (the only shuffles):
    - group border rows by crack id: a crack seen from both sides yields
      an equivalence edge between two local-component labels;
    - connected components over that tiny label graph (the shared hybrid
      CC machinery in operators.topology — driver union-find under the
      measured crossover, large-star/small-star rounds above it);
    - re-aggregate the per-tile stats by root label.

Scale shape: pixels NEVER cross an exchange. Per tile of t^2 pixels the
kernel emits O(components) stats rows + at most 4t border rows, so a
10^12-pixel raster in 4096^2 tiles shuffles ~10^7 rows of 9 ints — the
global merge is a rounding error next to the tile scan. Hot-component
skew is impossible by construction: stage-1 output is already per-tile
partial-aggregated (the map-side-combine shape), and the stage-2 groupBy
keys (crack id, root label) are near-unique.

Correctness: the full pipeline is oracled — the DuckDB twin generates
the identical mask in SQL and labels it with a recursive min-label
reachability walk (the _CC_SQL pattern, relational.py:1379), then
aggregates the same per-component stats. tests/test_raster_ccl.py
additionally replays CCL single-node on the assembled raster and checks
tile-size invariance (TILE=64 vs TILE=32 bit-equal) plus that merged
components genuinely span tiles (the stage-2 path is exercised, not
vacuous).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query

# ---- deterministic blob-lattice raster (identical formula in SQL) --------
#
# Two overlaid lattices of period PA / PB; each lattice cell hashes to a
# disc (center, radius, presence). Neither period divides TILE, so discs
# routinely straddle tile boundaries and the two lattices' discs overlap
# into multi-blob components — the stage-2 merge is structurally required.
W = 448          # raster width  = TILES_X * TILE
H = 448          # raster height = TILES_Y * TILE
TILE = 64
PA, SEED_A = 48, 1_000_003
PB, SEED_B = 37, 2_000_029
_HM = 2_147_483_647  # hash modulus (2^31 - 1; keeps all SQL math in int64)


def _lattice_fg(gx: np.ndarray, gy: np.ndarray, p: int, seed: int) -> np.ndarray:
    """Boolean foreground of one blob lattice at global pixel coords
    (int64 arrays). Mirrors the SQL in _ccl_fg_sql() token for token."""
    cx, cy = gx // p, gy // p
    h = (cx * 73856093 + cy * 19349663 + seed) % _HM
    ox, oy = h % p, (h // p) % p
    r = 3 + (h // (p * p)) % 5
    present = ((h // (p * p * 5)) % 4) < 3
    dx, dy = gx % p - ox, gy % p - oy
    return present & (dx * dx + dy * dy <= r * r)


def raster_fg(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Union-of-lattices foreground mask at global pixel coordinates."""
    return _lattice_fg(gx, gy, PA, SEED_A) | _lattice_fg(gx, gy, PB, SEED_B)


def _fg_sql_one(p: int, seed: int, alias: str) -> str:
    """Lattice-cell CTE body: per-cell disc params from the integer hash."""
    return f"""{alias} AS (
  SELECT cx, cy, h % {p} AS ox, (h // {p}) % {p} AS oy,
         3 + (h // {p * p}) % 5 AS r,
         ((h // {p * p * 5}) % 4) < 3 AS present
  FROM (SELECT cx, cy, (cx * 73856093 + cy * 19349663 + {seed}) % {_HM} AS h
        FROM (SELECT DISTINCT gx // {p} AS cx, gy // {p} AS cy FROM px))
)"""


def local_ccl(fg: np.ndarray, pid: np.ndarray) -> np.ndarray:
    """Label a tile: min-global-pixel-id per 4-connected component.

    Vectorized min propagation (4 shifted minimums per sweep) until a
    fixed point; converges in O(geodesic diameter) sweeps, bounded by the
    tile perimeter. Background cells get _BG. Deterministic, so the same
    labeling falls out under ANY tiling of the raster."""
    bg = np.int64(2**62)
    lab = np.where(fg, pid, bg)
    while True:
        nxt = lab.copy()
        np.minimum(nxt[1:, :], lab[:-1, :], out=nxt[1:, :])
        np.minimum(nxt[:-1, :], lab[1:, :], out=nxt[:-1, :])
        np.minimum(nxt[:, 1:], lab[:, :-1], out=nxt[:, 1:])
        np.minimum(nxt[:, :-1], lab[:, 1:], out=nxt[:, :-1])
        nxt = np.where(fg, nxt, bg)
        if np.array_equal(nxt, lab):
            return lab
        lab = nxt


_STAGE1_SCHEMA = (
    "kind int, lbl long, n_px long, sum_x long, sum_y long, "
    "min_x long, min_y long, max_x long, max_y long, crack long"
)


def _tile_rows(tile_id: int, tile: int, tiles_x: int, tiles_y: int) -> pd.DataFrame:
    """Stage-1 kernel body for one tile: local CCL -> stats + border rows."""
    tx, ty = tile_id % tiles_x, tile_id // tiles_x
    gx0, gy0 = tx * tile, ty * tile
    gx = np.arange(gx0, gx0 + tile, dtype=np.int64)
    gy = np.arange(gy0, gy0 + tile, dtype=np.int64)
    GX, GY = np.meshgrid(gx, gy)  # shape (tile, tile), row = y
    fg = raster_fg(GX, GY)
    pid = GY * W + GX
    lab = local_ccl(fg, pid)

    rows: list[tuple] = []
    if fg.any():
        fl, fx, fy = lab[fg], GX[fg], GY[fg]
        uniq, inv = np.unique(fl, return_inverse=True)
        cnt = np.bincount(inv)
        sx = np.bincount(inv, weights=fx).astype(np.int64)
        sy = np.bincount(inv, weights=fy).astype(np.int64)
        mnx = np.full(len(uniq), np.iinfo(np.int64).max)
        mny = mnx.copy()
        mxx = np.full(len(uniq), np.iinfo(np.int64).min)
        mxy = mxx.copy()
        np.minimum.at(mnx, inv, fx)
        np.minimum.at(mny, inv, fy)
        np.maximum.at(mxx, inv, fx)
        np.maximum.at(mxy, inv, fy)
        for i, lb in enumerate(uniq):
            rows.append((0, int(lb), int(cnt[i]), int(sx[i]), int(sy[i]),
                         int(mnx[i]), int(mny[i]), int(mxx[i]), int(mxy[i]), -1))
        # border rows: the crack id is the GLOBAL undirected tile-boundary
        # edge id — horizontal crack right of pixel p is 2*pid(p), vertical
        # crack below p is 2*pid(p)+1 — so both sides compute the same key
        # without knowing each other's tile.
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
            rows.extend((1, int(lb), 0, 0, 0, 0, 0, 0, 0, int(ck))
                        for lb, ck in zip(lbs, cks))
    return pd.DataFrame(rows, columns=[
        "kind", "lbl", "n_px", "sum_x", "sum_y",
        "min_x", "min_y", "max_x", "max_y", "crack",
    ])


def ccl_components(spark: SparkSession, tile: int = TILE) -> DataFrame:
    """Full distributed CCL over the W x H blob raster, tiled at `tile`.

    Returns one row per global 4-connected component:
    (comp_id = min global pixel id, n_px, min_x, min_y, max_x, max_y,
    sum_x, sum_y). Bit-identical for every tile size that divides W and H
    (tests assert 64 vs 32)."""
    if W % tile or H % tile:
        raise ValueError(f"tile {tile} must divide raster {W}x{H}")
    tiles_x, tiles_y = W // tile, H // tile
    n_tiles = tiles_x * tiles_y
    par = min(n_tiles, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n_tiles, 1, par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for t in pdf["id"].to_numpy():
                yield _tile_rows(int(t), tile, tiles_x, tiles_y)

    out = rng.mapInPandas(gen, _STAGE1_SCHEMA).localCheckpoint(eager=False)
    stats = out.filter(F.col("kind") == 0).drop("kind", "crack")
    border = out.filter(F.col("kind") == 1).select("crack", "lbl")
    # a crack contributes an equivalence edge iff BOTH sides are foreground
    pairs = (
        border.groupBy("crack")
        .agg(
            F.min("lbl").alias("src"),
            F.max("lbl").alias("dst"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter((F.col("c") == 2) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )
    from etf_topox_spark.operators.topology import connected_components

    labels = connected_components(pairs)
    merged = (
        stats.join(labels, stats["lbl"] == labels["node"], "left")
        .withColumn("root", F.coalesce(F.col("root"), F.col("lbl")))
    )
    return (
        merged.groupBy(F.col("root").alias("comp_id"))
        .agg(
            F.sum("n_px").alias("n_px"),
            F.min("min_x").alias("min_x"),
            F.min("min_y").alias("min_y"),
            F.max("max_x").alias("max_x"),
            F.max("max_y").alias("max_y"),
            F.sum("sum_x").alias("sum_x"),
            F.sum("sum_y").alias("sum_y"),
        )
        .orderBy("comp_id")
    )


def _ccl_fg_sql() -> str:
    """Shared mask + labeling CTE prefix for the oracle."""
    return f"""WITH RECURSIVE
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({W})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({H})),
px AS (SELECT gx, gy, gy * {W} + gx AS pid FROM xs CROSS JOIN ys),
{_fg_sql_one(PA, SEED_A, 'ca')},
{_fg_sql_one(PB, SEED_B, 'cb')},
fg AS (
  SELECT p.gx, p.gy, p.pid
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
eh AS (SELECT a.pid AS s, b.pid AS d FROM fg a JOIN fg b
       ON b.gy = a.gy AND b.gx = a.gx + 1),
ev AS (SELECT a.pid AS s, b.pid AS d FROM fg a JOIN fg b
       ON b.gx = a.gx AND b.gy = a.gy + 1),
edges AS (SELECT s, d FROM eh UNION ALL SELECT s, d FROM ev
          UNION ALL SELECT d AS s, s AS d FROM eh
          UNION ALL SELECT d AS s, s AS d FROM ev),
walk(pid, lbl) AS (
  SELECT pid, pid FROM fg
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.pid
),
lab AS (SELECT pid, MIN(lbl) AS root FROM walk GROUP BY pid)"""


_CCL_SQL = f"""{_ccl_fg_sql()}
SELECT l.root AS comp_id,
       COUNT(*) AS n_px,
       MIN(f.gx) AS min_x, MIN(f.gy) AS min_y,
       MAX(f.gx) AS max_x, MAX(f.gy) AS max_y,
       CAST(SUM(f.gx) AS BIGINT) AS sum_x,
       CAST(SUM(f.gy) AS BIGINT) AS sum_y
FROM lab l JOIN fg f ON f.pid = l.pid
GROUP BY l.root
ORDER BY comp_id
"""


@query("raster_ccl", oracle=_CCL_SQL)
def raster_ccl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed two-stage CCL over the synthetic blob raster (module
    docstring). The oracle re-derives the identical mask in pure SQL and
    labels it with a recursive min-label walk — the whole distributed
    pipeline (tile kernel, crack join, star-loop merge, re-aggregation)
    is checked end-to-end, bit for bit."""
    return ccl_components(spark)
