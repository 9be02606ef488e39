"""Raster sampling / resampling over the watershed DEM — extract-to-points
and nearest-neighbor affine warp, pure Catalyst.

Two reprojection-family primitives every raster stack ships (GDAL
``gdallocationinfo`` / ``gdalwarp -r near``, ESRI Extract Values to Points
/ Project Raster), expressed with zero joins because the DEM of
operators/raster_watershed.py is formula-evaluable at any cell:

- ``raster_bilinear_sample``: bilinear interpolation of the DEM at the
  synthetic observation points (sources/points.py — the same corpus the
  PIP/kNN fixtures use, hot-cell skew included). All arithmetic is exact
  rationals: point coords recover to integer micro-degrees (one ROUND of
  a correctly-rounded double — both engines produce the identical int64),
  the grid position is the integer pair (q, r) of ``micro*(WS-1)`` divided
  by the 2e7-micro window, and the interpolated value is returned as the
  exact numerator over the fixed denominator (2e7)^2 — no float division
  anywhere in the contract.

- ``raster_affine_resample``: nearest-neighbor rotation warp census using
  the 3-4-5 rational rotation (cos, sin) = (4/5, 3/5), so source
  coordinates are exact fifths and nearest-int is pure integer arithmetic
  (a +OFFSET shift keeps numerators positive — Spark's DIV truncates
  toward zero while DuckDB's // floors; on non-negative operands they
  agree, the image_hough lesson).

Scale shape: both are MAP-ONLY over the target rows (points / target
cells) — heights inline as Catalyst expressions, the only exchange is the
final tiny census aggregation. At 10^12 points the sample op is a single
pass with no shuffle of anything wider than the output row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_watershed import WS, _h_sql, _h_spark
from etf_topox_spark.registry import query
from etf_topox_spark.sources.points import points_sql, synthetic_points

N_SAMPLE = 20_000
MICRO = 20_000_000  # whole 20-degree window in micro-degrees
D2 = MICRO * MICRO  # bilinear denominator (per-point numerator <= 62*D2)


def _bilinear_exprs(h) -> dict[str, str]:
    """Shared expression text (engine picks its h / floor-div spelling)."""
    return {
        "h00": h("gx0", "gy0"),
        "h10": h("gx0 + 1", "gy0"),
        "h01": h("gx0", "gy0 + 1"),
        "h11": h("gx0 + 1", "gy0 + 1"),
    }


_BILINEAR_SQL = f"""
WITH pts AS ({points_sql(N_SAMPLE)}),
mi AS (
  SELECT point_id,
         CAST(ROUND(x * 1000000) AS BIGINT) AS mx,
         CAST(ROUND(y * 1000000) AS BIGINT) AS my
  FROM pts
),
g AS (
  SELECT point_id,
         (mx * {WS - 1}) // {MICRO} AS gx0, (mx * {WS - 1}) % {MICRO} AS fx,
         (my * {WS - 1}) // {MICRO} AS gy0, (my * {WS - 1}) % {MICRO} AS fy
  FROM mi
),
v AS (
  SELECT point_id, gx0, gy0,
         ({MICRO} - fy) * (({MICRO} - fx) * ({_h_sql('gx0', 'gy0')})
                           + fx * ({_h_sql('gx0 + 1', 'gy0')}))
         + fy * (({MICRO} - fx) * ({_h_sql('gx0', 'gy0 + 1')})
                 + fx * ({_h_sql('gx0 + 1', 'gy0 + 1')})) AS val_num
  FROM g
)
SELECT point_id, gx0, gy0, val_num, val_num // {D2} AS h_floor
FROM v ORDER BY point_id
"""


@query("raster_bilinear_sample", oracle=_BILINEAR_SQL)
def raster_bilinear_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract-values-to-points: exact-rational bilinear DEM sample at
    every observation point (module docstring). Emits one row per point:
    the grid cell, the interpolated value's exact integer numerator over
    the fixed (2e7)^2 denominator, and its integer floor."""
    pts = synthetic_points(spark, N_SAMPLE)
    mi = pts.select(
        "point_id",
        F.round(F.col("x") * 1_000_000).cast("long").alias("mx"),
        F.round(F.col("y") * 1_000_000).cast("long").alias("my"),
    )
    g = mi.select(
        "point_id",
        F.expr(f"(mx * {WS - 1}) DIV {MICRO}").alias("gx0"),
        F.expr(f"(mx * {WS - 1}) % {MICRO}").alias("fx"),
        F.expr(f"(my * {WS - 1}) DIV {MICRO}").alias("gy0"),
        F.expr(f"(my * {WS - 1}) % {MICRO}").alias("fy"),
    )
    e = _bilinear_exprs(_h_spark)
    val = (
        f"({MICRO} - fy) * (({MICRO} - fx) * ({e['h00']}) + fx * ({e['h10']}))"
        f" + fy * (({MICRO} - fx) * ({e['h01']}) + fx * ({e['h11']}))"
    )
    return (
        g.select(
            "point_id",
            "gx0",
            "gy0",
            F.expr(val).alias("val_num"),
        )
        .withColumn("h_floor", F.expr(f"val_num DIV {D2}"))
        .orderBy("point_id")
    )


# --- nearest-neighbor rational affine warp -----------------------------------

C = WS // 2  # rotation center
OFF = 8 * WS  # positivity shift for the truncate-vs-floor DIV reconciliation


def _warp_src(engine: str) -> tuple[str, str]:
    """Source cell (nearest neighbor) of target cell (tx, ty) under the
    inverse 3-4-5 rotation about (C, C): numerators in fifths, then
    nearest-int as (2*num + 5) DIV 10 on OFFSET-shifted (positive)
    operands so Spark DIV == DuckDB floor-div."""
    div = "DIV" if engine == "spark" else "//"
    sx_num = f"(4 * (tx - {C}) + 3 * (ty - {C}) + 5 * {C + OFF})"
    sy_num = f"(-3 * (tx - {C}) + 4 * (ty - {C}) + 5 * {C + OFF})"
    sx = f"(((2 * {sx_num} + 5) {div} 10) - {OFF})"
    sy = f"(((2 * {sy_num} + 5) {div} 10) - {OFF})"
    return sx, sy


def _warp_sql() -> str:
    sx, sy = _warp_src("duckdb")
    return f"""
WITH tgt AS (
  SELECT x.range AS tx, y.range AS ty
  FROM range({WS}) x, range({WS}) y
),
src AS (
  SELECT tx, ty, {sx} AS sx, {sy} AS sy FROM tgt
),
inb AS (
  SELECT sx, sy, {_h_sql('sx', 'sy')} AS h
  FROM src WHERE sx >= 0 AND sx < {WS} AND sy >= 0 AND sy < {WS}
)
SELECT h, COUNT(*) AS n_cells,
       CAST(SUM(sx) AS BIGINT) AS sum_sx, CAST(SUM(sy) AS BIGINT) AS sum_sy
FROM inb GROUP BY h ORDER BY h
"""


@query("raster_affine_resample", oracle=_warp_sql())
def raster_affine_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor affine warp (rational 3-4-5 rotation) of the DEM
    onto the target grid: census of resampled height values with exact
    source-coordinate mass (module docstring)."""
    n = WS
    tgt = spark.range(0, n * n, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % n).alias("tx"),
        (F.col("id") / n).cast("long").alias("ty"),
    )
    sx, sy = _warp_src("spark")
    src = tgt.select(F.expr(sx).alias("sx"), F.expr(sy).alias("sy")).filter(
        (F.col("sx") >= 0) & (F.col("sx") < WS) & (F.col("sy") >= 0) & (F.col("sy") < WS)
    )
    return (
        src.select(F.expr(_h_spark("sx", "sy")).alias("h"), "sx", "sy")
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("sx").alias("sum_sx"),
            F.sum("sy").alias("sum_sy"),
        )
        .orderBy("h")
    )
