"""Terrain derivatives over the watershed DEM — slope/aspect and focal
median, pure Catalyst.

Two classic map-algebra neighborhood operators over the integer DEM of
operators/raster_watershed.py (heights inline-evaluable, so neighbors
need no join — the production variant is the halo exchange of
operators/raster_focal.py, same kernel):

- `raster_slope_aspect`: Horn's method (Horn 1981, the ESRI/GDAL slope
  standard) — gx = (z3+2z6+z9)-(z1+2z4+z7), gy = (z7+2z8+z9)-(z1+2z2+z3),
  all int64; cells classify into 8 aspect octants by sign/magnitude
  comparisons (ties resolved by CASE order — the same generated text runs
  on both engines) plus a flat class, and slope bands by gx^2+gy^2.

- `raster_focal_median`: the 3x3 median filter, expressed as
  element_at(array_sort(array(z1..z9)), 5) — a genuinely relational
  median (no UDF, no sorting network); the oracle computes it the
  OPPOSITE way, unnesting 9 rows per cell and taking the 5th element of
  an ordered ARRAY_AGG.

Both restrict to interior cells (full 3x3 windows) and pre-aggregate to
tiny histograms, so nothing pixel-sized crosses an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_watershed import WS, _h_spark, _h_sql
from etf_topox_spark.registry import query

SLOPE_BAND = 512
SLOPE_CAP = 15

# z1..z9 row-major: (dx, dy) offsets
_OFFS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]


def _z(h, i: int) -> str:
    dx, dy = _OFFS[i - 1]
    return h(f"gx + {dx}", f"gy + {dy}")


def _grad(h) -> tuple[str, str]:
    gx = (
        f"(({_z(h, 3)}) + 2 * ({_z(h, 6)}) + ({_z(h, 9)}))"
        f" - (({_z(h, 1)}) + 2 * ({_z(h, 4)}) + ({_z(h, 7)}))"
    )
    gy = (
        f"(({_z(h, 7)}) + 2 * ({_z(h, 8)}) + ({_z(h, 9)}))"
        f" - (({_z(h, 1)}) + 2 * ({_z(h, 2)}) + ({_z(h, 3)}))"
    )
    return gx, gy


_ASPECT = """CASE
  WHEN {gx} = 0 AND {gy} = 0 THEN -1
  WHEN {gx} > 0 AND ABS({gy}) <= {gx} THEN 0
  WHEN {gy} > 0 AND ABS({gx}) <= {gy} THEN 2
  WHEN {gx} < 0 AND ABS({gy}) <= -({gx}) THEN 4
  WHEN {gy} < 0 AND ABS({gx}) <= -({gy}) THEN 6
  WHEN {gx} > 0 AND {gy} > 0 THEN 1
  WHEN {gx} < 0 AND {gy} > 0 THEN 3
  WHEN {gx} < 0 AND {gy} < 0 THEN 5
  ELSE 7 END"""


def _interior(spark: SparkSession) -> DataFrame:
    n = WS - 2
    return spark.range(0, n * n, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % n + 1).alias("gx"),
        (F.col("id") / n).cast("long").alias("t"),
    ).select("gx", (F.col("t") + 1).alias("gy"))


def slope_aspect(spark: SparkSession) -> DataFrame:
    gx, gy = _grad(_h_spark)
    d = _interior(spark).select(
        F.expr(_ASPECT.format(gx=gx, gy=gy)).alias("aspect"),
        F.expr(f"LEAST((({gx}) * ({gx}) + ({gy}) * ({gy})) DIV {SLOPE_BAND}, "
               f"{SLOPE_CAP})").alias("slope_band"),
        F.expr(f"(({gx}) * ({gx}) + ({gy}) * ({gy}))").alias("s2"),
    )
    return (
        d.groupBy("aspect", "slope_band")
        .agg(F.count(F.lit(1)).alias("n_cells"), F.sum("s2").alias("sum_slope_sq"))
        .orderBy("aspect", "slope_band")
    )


_SLOPE_SQL_BODY = None  # built below


def _slope_sql() -> str:
    gx, gy = _grad(_h_sql)
    aspect = _ASPECT.format(gx=gx, gy=gy)
    return f"""WITH
xs AS (SELECT CAST(range AS BIGINT) + 1 AS gx FROM range({WS - 2})),
ys AS (SELECT CAST(range AS BIGINT) + 1 AS gy FROM range({WS - 2})),
px AS (SELECT gx, gy FROM xs CROSS JOIN ys),
d AS (
  SELECT {aspect} AS aspect,
         LEAST((({gx}) * ({gx}) + ({gy}) * ({gy})) // {SLOPE_BAND},
               {SLOPE_CAP}) AS slope_band,
         (({gx}) * ({gx}) + ({gy}) * ({gy})) AS s2
  FROM px
)
SELECT CAST(aspect AS INT) AS aspect, slope_band,
       COUNT(*) AS n_cells, CAST(SUM(s2) AS BIGINT) AS sum_slope_sq
FROM d GROUP BY 1, 2 ORDER BY aspect, slope_band
"""


@query("raster_slope_aspect", oracle=_slope_sql())
def raster_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn-method slope/aspect census of the watershed DEM: cell counts
    and exact squared-gradient mass per (aspect octant, slope band)
    (module docstring)."""
    return slope_aspect(spark)


def focal_median(spark: SparkSession) -> DataFrame:
    zs = ", ".join(f"({_z(_h_spark, i)})" for i in range(1, 10))
    d = _interior(spark).select(
        F.expr(f"element_at(array_sort(array({zs})), 5)").alias("med")
    )
    return (
        d.groupBy("med")
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .orderBy("med")
    )


def _median_sql() -> str:
    return f"""WITH
xs AS (SELECT CAST(range AS BIGINT) + 1 AS gx FROM range({WS - 2})),
ys AS (SELECT CAST(range AS BIGINT) + 1 AS gy FROM range({WS - 2})),
px AS (SELECT gx, gy FROM xs CROSS JOIN ys),
offs(dx, dy) AS (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),(1,0),(-1,1),(0,1),(1,1)),
nb AS (
  SELECT p.gx, p.gy, {_h_sql('p.gx + o.dx', 'p.gy + o.dy')} AS z
  FROM px p CROSS JOIN offs o
),
med AS (
  SELECT gx, gy, (ARRAY_AGG(z ORDER BY z))[5] AS med
  FROM nb GROUP BY gx, gy
)
SELECT med, COUNT(*) AS n_cells
FROM med GROUP BY med ORDER BY med
"""


@query("raster_focal_median", oracle=_median_sql())
def raster_focal_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 focal-median histogram of the watershed DEM, computed as a
    relational array_sort median in Spark and as the 5th element of an
    ordered per-cell aggregate in the oracle — two opposite evaluation
    orders of the same filter (module docstring)."""
    return focal_median(spark)


# --- integer hillshade census ---------------------------------------------------

# Hillshade with a fixed NW light at 45 deg elevation, integer form: the
# standard L.N illumination numerator with the trig constants cleared.
# With unit light direction (-1, -1, 1)/sqrt(3) and surface normal
# (-gx, -gy, 8)/|.| (Horn kernel, cell size 1), sign and ORDERING of the
# illumination are those of the integer numerator  gx + gy + 8  (after
# clearing the positive sqrt denominators per-cell at the bucket
# boundaries only — we bucket by the numerator directly, which every
# engine computes identically in int64). Shadowed cells are numerator < 0.
_HILL_NUM = None  # built below


def _hill_sql(h) -> str:
    gx, gy = _grad(h)
    return f"(({gx}) + ({gy}) + 8)"


_HILL_CENSUS_SQL = f"""
WITH xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range(1, {WS - 1})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range(1, {WS - 1})),
cells AS (SELECT gx, gy, {_hill_sql(_h_sql)} AS illum FROM xs CROSS JOIN ys)
SELECT CAST(illum AS BIGINT) AS illum,
       COUNT(*) AS n_cells
FROM cells GROUP BY illum ORDER BY illum
"""


@query("raster_hillshade_census", oracle=_HILL_CENSUS_SQL)
def raster_hillshade_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer hillshade census of the DEM interior: per NW-light
    illumination numerator (gx + gy + 8 over the Horn 3x3 gradient;
    module note — same ordering as the float hillshade, no trig/sqrt in
    the contract), the number of cells. Negative = self-shadowed slopes.

    Scale shape: identical to raster_slope_aspect — the DEM is
    formula-evaluable so all nine neighbor heights inline as Catalyst
    expressions (NO neighbor join, NO Python); one count aggregate
    exchange over a few hundred distinct illumination values. On a stored
    raster this becomes the raster_focal halo-exchange kernel."""
    px = spark.range(0, (WS - 2) * (WS - 2), 1,
                     spark.sparkContext.defaultParallelism).select(
        (F.col("id") % (WS - 2) + 1).alias("gx"),
        (F.col("id") / (WS - 2)).cast("long").alias("gy"),
    ).withColumn("gy", F.col("gy") + 1)
    cells = px.withColumn("illum", F.expr(_hill_sql(_h_spark)))
    return (
        cells.groupBy("illum")
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .orderBy("illum")
    )
