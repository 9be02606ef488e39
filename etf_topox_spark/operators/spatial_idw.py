"""Inverse-distance-weighted (IDW) surface interpolation — integer-exact.

The standard geostatistics gridding operator (Shepard 1968; GDAL
`gdal_grid invdist`): estimate a value at every grid cell as the
weight-averaged value of scattered sample stations, weights ~ 1/d^2.
Floating 1/d^2 sums are engine-order-sensitive, so this implementation
quantizes the weight ONCE as the integer

    w = 10^12 DIV (1 + d^2)        (the +1 removes the on-station pole;
                                    "regularized Shepard")

and the estimate as  est = SUM(v * w) DIV SUM(w)  — pure int64 end to
end, bit-identical on any engine and any summation order. Max station
value 10^3 x max weight 10^12 x 200 stations = 2*10^17 < int64.

Spark shape: the station table (200 rows) broadcasts; the grid x station
expansion is map-side (no exchange carries the fan-out — it collapses
into the per-cell partial aggregate before the single groupBy); output
re-aggregates into 16x16 supertiles. At 10^12 cells this is the
canonical broadcast-scatter/gather interpolation; for 10^9+ stations
you'd cell-index stations and join only k-ring neighborhoods (the
spatial_knn_join machinery) — noted, not needed at this station count.

Oracle: identical integer algebra in SQL; DuckDB // = Spark DIV on the
nonnegative operands used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query

GRID = 256       # interpolation raster, GRID x GRID cells
N_STATIONS = 200
SUP = 16         # supertile edge (output = (GRID/SUP)^2 rows)
WSCALE = 10**12


def _station_rows() -> list[tuple[int, int, int, int]]:
    """Deterministic scattered stations: (sid, sx, sy, v)."""
    return [
        (s, (s * 9973 + 31) % GRID, (s * 7459 + 17) % GRID, (s * 131 + 7) % 1000)
        for s in range(N_STATIONS)
    ]


def idw_supertiles(spark: SparkSession) -> DataFrame:
    """(tx, ty, n_cells, sum_est, min_est, max_est) per 16x16 supertile of
    the integer-exact IDW surface."""
    px = spark.range(0, GRID * GRID, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % GRID).alias("gx"),
        (F.col("id") / GRID).cast("long").alias("gy"),
    )
    st = spark.createDataFrame(_station_rows(), "sid int, sx long, sy long, v long")
    d2 = (F.col("gx") - F.col("sx")) * (F.col("gx") - F.col("sx")) + (
        F.col("gy") - F.col("sy")
    ) * (F.col("gy") - F.col("sy"))
    w = F.expr(f"{WSCALE} DIV (1 + d2)")
    cell = (
        px.join(F.broadcast(st))
        .select("gx", "gy", d2.alias("d2"), "v")
        .select("gx", "gy", w.alias("w"), (F.col("v") * w).alias("vw"))
        .groupBy("gx", "gy")
        .agg(F.sum("w").alias("sw"), F.sum("vw").alias("svw"))
        .select("gx", "gy", F.expr("svw DIV sw").alias("est"))
    )
    return (
        cell.groupBy(
            F.expr(f"gx DIV {SUP}").alias("tx"), F.expr(f"gy DIV {SUP}").alias("ty")
        )
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("est").alias("sum_est"),
            F.min("est").alias("min_est"),
            F.max("est").alias("max_est"),
        )
        .orderBy("tx", "ty")
    )


def _idw_sql() -> str:
    vals = ",\n    ".join(f"({s}, {x}, {y}, {v})" for s, x, y, v in _station_rows())
    return f"""WITH
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({GRID})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({GRID})),
px AS (SELECT gx, gy FROM xs CROSS JOIN ys),
st(sid, sx, sy, v) AS (VALUES
    {vals}
),
terms AS (
  SELECT p.gx, p.gy,
         {WSCALE} // (1 + (p.gx - s.sx) * (p.gx - s.sx)
                        + (p.gy - s.sy) * (p.gy - s.sy)) AS w,
         s.v
  FROM px p CROSS JOIN st s
),
cell AS (
  SELECT gx, gy, SUM(v * w) // SUM(w) AS est
  FROM terms GROUP BY gx, gy
)
SELECT gx // {SUP} AS tx, gy // {SUP} AS ty,
       COUNT(*) AS n_cells,
       CAST(SUM(est) AS BIGINT) AS sum_est,
       MIN(est) AS min_est, MAX(est) AS max_est
FROM cell GROUP BY 1, 2
ORDER BY tx, ty
"""


@query("spatial_idw_grid", oracle=_idw_sql())
def spatial_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularized-Shepard IDW interpolation of {N_STATIONS} scattered
    stations onto a {GRID}x{GRID} grid, integer-exact (module docstring),
    reported as 16x16 supertile aggregates."""
    return idw_supertiles(spark)
