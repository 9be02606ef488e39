"""Polygon buffer areas via rasterize + distance transform — pure Catalyst.

The GIS "buffer" question (how much area lies within distance r of any
polygon?) answered the raster way, as one declarative plan with ZERO
Python: the even-odd rasterization of operators/raster_burn.py expressed
as a broadcast join + parity aggregate, fused with the windowed L1
distance transform of operators/raster_distance.py, then banded into
cumulative buffer rings. The full lineage is

    edges (broadcast, ~160 rows)
      -> pixel x edge crossing join (the integer cleared-denominator
         even-odd rule; map-side, no exchange of pixels)
      -> parity groupBy (gx, gy, poly) -> any-polygon fg set
      -> 4 windowed min-plus scans (exact L1 DT)
      -> dist DIV band histogram + running coverage.

Everything is int64; Spark DIV and DuckDB // agree because distances are
nonnegative. The oracle replays the identical algebra in SQL from the
same inlined edge list — rasterization, transform and banding are checked
END TO END in one bit-exact frame, which also pins the cross-module
consistency of burn and DT (a disagreement in either breaks this query
before it breaks theirs).

Scale: same notes as the parents — the crossing join broadcasts the
(tiny) edge table and prunes per-pixel by the y-span predicate; at
10^12 pixels the DT windows become per-tile kernels with 2-number
envelope halos (raster_distance.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_burn import BW, EDGES
from etf_topox_spark.registry import query

BAND = 4       # ring width in pixels
BAND_CAP = 16  # distances past BAND*BAND_CAP collapse into the last row
_INF = 1 << 20


def buffer_bands(spark: SparkSession) -> DataFrame:
    """(band, n_px, cum_px): pixels whose exact L1 distance to the nearest
    polygon-interior pixel falls in [band*BAND, band*BAND+BAND), capped at
    BAND_CAP, with running coverage."""
    px = spark.range(0, BW * BW, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % BW).alias("gx"), (F.col("id") / BW).cast("long").alias("gy")
    )
    edges = spark.createDataFrame(
        EDGES, "pid int, x1 long, y1 long, x2 long, y2 long"
    )
    cross = px.join(
        F.broadcast(edges),
        (F.col("y1") <= F.col("gy"))
        & (F.col("gy") < F.col("y2"))
        & (
            2 * F.col("x1") * (F.col("y2") - F.col("y1"))
            + (F.col("x2") - F.col("x1")) * (2 * F.col("gy") + 1 - 2 * F.col("y1"))
            > (2 * F.col("gx") + 1) * (F.col("y2") - F.col("y1"))
        ),
    )
    fg = (
        cross.groupBy("gx", "gy", "pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") % 2 == 1)
        .select("gx", "gy")
        .distinct()
        .withColumn("is_fg", F.lit(1))
    )
    m = px.join(fg, ["gx", "gy"], "left").select(
        "gx", "gy", F.when(F.col("is_fg") == 1, F.col("gy")).alias("fgy")
    )

    up = Window.partitionBy("gx").orderBy("gy").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dn = Window.partitionBy("gx").orderBy(F.col("gy").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d1 = m.select(
        "gx",
        "gy",
        F.least(
            F.coalesce(F.col("gy") - F.max("fgy").over(up), F.lit(_INF)),
            F.coalesce(F.min("fgy").over(dn) - F.col("gy"), F.lit(_INF)),
        ).alias("d1"),
    )
    lf = Window.partitionBy("gy").orderBy("gx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rt = Window.partitionBy("gy").orderBy(F.col("gx").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dist = d1.select(
        F.least(
            F.col("gx") + F.min(F.col("d1") - F.col("gx")).over(lf),
            -F.col("gx") + F.min(F.col("d1") + F.col("gx")).over(rt),
        ).alias("dist")
    )
    hist = (
        dist.select(
            F.least(F.expr(f"dist DIV {BAND}"), F.lit(BAND_CAP)).alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_px"))
    )
    wcum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return hist.select(
        "band", "n_px", F.sum("n_px").over(wcum).alias("cum_px")
    ).orderBy("band")


def _buffer_sql() -> str:
    vals = ",\n    ".join(
        f"({pid}, {x1}, {y1}, {x2}, {y2})" for pid, x1, y1, x2, y2 in EDGES
    )
    return f"""WITH
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({BW})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({BW})),
px AS (SELECT gx, gy FROM xs CROSS JOIN ys),
edges(pid, x1, y1, x2, y2) AS (VALUES
    {vals}
),
fg AS (
  SELECT gx, gy FROM (
    SELECT p.gx, p.gy, e.pid
    FROM px p JOIN edges e
      ON e.y1 <= p.gy AND p.gy < e.y2
     AND 2 * e.x1 * (e.y2 - e.y1)
       + (e.x2 - e.x1) * (2 * p.gy + 1 - 2 * e.y1)
       > (2 * p.gx + 1) * (e.y2 - e.y1)
    GROUP BY 1, 2, 3 HAVING COUNT(*) % 2 = 1
  ) GROUP BY gx, gy
),
m AS (
  SELECT p.gx, p.gy, CASE WHEN f.gx IS NOT NULL THEN p.gy END AS fgy
  FROM px p LEFT JOIN fg f ON f.gx = p.gx AND f.gy = p.gy
),
v AS (
  SELECT gx, gy,
         LEAST(
           COALESCE(gy - MAX(fgy) OVER (PARTITION BY gx ORDER BY gy
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), {_INF}),
           COALESCE(MIN(fgy) OVER (PARTITION BY gx ORDER BY gy DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - gy, {_INF})
         ) AS d1
  FROM m
),
d AS (
  SELECT LEAST(
           gx + MIN(d1 - gx) OVER (PARTITION BY gy ORDER BY gx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           -gx + MIN(d1 + gx) OVER (PARTITION BY gy ORDER BY gx DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ) AS dist
  FROM v
),
hist AS (
  SELECT LEAST(dist // {BAND}, {BAND_CAP}) AS band, COUNT(*) AS n_px
  FROM d GROUP BY 1
)
SELECT band, n_px,
       SUM(n_px) OVER (ORDER BY band
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_px
FROM hist ORDER BY band
"""


@query("raster_buffer_area", oracle=_buffer_sql())
def raster_buffer_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative L1 buffer-ring areas around the raster_burn polygon set
    (band 0 covers the polygons and their first ring), as one fused declarative plan:
    broadcast even-odd rasterization -> windowed distance transform ->
    banded coverage (module docstring)."""
    return buffer_bands(spark)
