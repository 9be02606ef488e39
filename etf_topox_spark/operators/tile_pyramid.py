"""Map-tile pyramid build: hierarchical point aggregation per zoom level.

What every slippy-map / web-Mercator tile server precomputes (and what
heatmap layers at 10^12 points require): per-tile point counts at zoom Z,
then each coarser level as the 4:1 rollup of its children. The key scale
property is the BUILD ORDER — the raw points shuffle exactly ONCE (the
finest-level groupBy); every coarser level aggregates the PREVIOUS level's
output (tx DIV 2, ty DIV 2), so total exchanged rows are a geometric
series ~ 4/3 x the finest tile count, versus the naive explode-points-by-
level plan that shuffles (Z+1) x the full point set. Each halving is
partial-aggregable (map-side combine) and 4x smaller than the last.

Coordinates are pure int64: the point scatter of sources/points.py
quantized to micro-degrees ((i*KX) % 20000 degrees-millis exactly, hot
points at 10.3 + spread), world = [0, 20_000_000) microdeg, so
tile(z) = coord * 2^z DIV world — no float anywhere, the consistency
invariant parent = floor(child / 2) holds exactly, and the DuckDB oracle
(per-level direct GROUP BY straight from the points — a different
evaluation order than the rollup) matches bit for bit. Each tile carries
a point-id checksum so a single misrouted point flips a row at every
level above it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.points import HOT_M, KX, KY, M

N_PYR_POINTS = 40000
Z_MAX = 6
WORLD = 20_000_000  # microdegrees


def _coord_expr(k: int) -> str:
    """Integer microdegree coordinate of point `id` on axis with factor k:
    the sources/points.py scatter (even ids) / hot cluster (odd ids),
    scaled exactly to integers."""
    base = f"((id * {k}) % {M}) * 1000"
    hotv = 10_300_000 if k == KX else 10_700_000
    hot = f"{hotv} + (id * {k}) % {HOT_M}"
    return f"CASE WHEN id % 2 = 1 THEN {hot} ELSE {base} END"


def tile_pyramid(spark: SparkSession, n: int = N_PYR_POINTS) -> DataFrame:
    """(z, tx, ty, n_points, sum_id) for every non-empty tile at every
    zoom 0..Z_MAX, built by one point shuffle + Z_MAX successive 4:1
    rollups."""
    pts = spark.range(0, n, 1, spark.sparkContext.defaultParallelism).select(
        F.col("id"),
        F.expr(f"({_coord_expr(KX)}) * {1 << Z_MAX} DIV {WORLD}").alias("tx"),
        F.expr(f"({_coord_expr(KY)}) * {1 << Z_MAX} DIV {WORLD}").alias("ty"),
    )
    finest = pts.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).alias("n_points"), F.sum("id").alias("sum_id")
    )
    levels = [finest.select(F.lit(Z_MAX).alias("z"), "tx", "ty", "n_points", "sum_id")]
    cur = finest
    for z in range(Z_MAX - 1, -1, -1):
        cur = (
            cur.select(
                F.expr("tx DIV 2").alias("tx"),
                F.expr("ty DIV 2").alias("ty"),
                "n_points",
                "sum_id",
            )
            .groupBy("tx", "ty")
            .agg(F.sum("n_points").alias("n_points"), F.sum("sum_id").alias("sum_id"))
        )
        levels.append(cur.select(F.lit(z).alias("z"), "tx", "ty", "n_points", "sum_id"))
    return reduce(DataFrame.unionAll, levels).orderBy("z", "tx", "ty")


_PYR_SQL = f"""
WITH pts AS (
  SELECT id,
         ({_coord_expr(KX)}) AS xq,
         ({_coord_expr(KY)}) AS yq
  FROM (SELECT CAST(range AS BIGINT) AS id FROM range({N_PYR_POINTS}))
),
zooms AS (SELECT CAST(range AS BIGINT) AS z FROM range({Z_MAX + 1}))
SELECT z.z AS z,
       (p.xq * (1 << z.z)) // {WORLD} AS tx,
       (p.yq * (1 << z.z)) // {WORLD} AS ty,
       COUNT(*) AS n_points,
       CAST(SUM(p.id) AS BIGINT) AS sum_id
FROM pts p CROSS JOIN zooms z
GROUP BY 1, 2, 3
ORDER BY z, tx, ty
"""


@query("tile_pyramid_rollup", oracle=_PYR_SQL)
def tile_pyramid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full tile pyramid (zooms 0..{Z_MAX}) over the {N_PYR_POINTS}-point
    scatter: per-tile counts + id checksums, built bottom-up with one
    point shuffle and geometric 4:1 rollups (module docstring). The oracle
    re-derives every level DIRECTLY from the points — a different
    evaluation order that only agrees if parent = floor(child/2) holds
    exactly everywhere."""
    return tile_pyramid(spark)
