"""Exact L1 (Manhattan) distance transform of a raster — pure Catalyst.

Every pixel's distance to the nearest foreground pixel under the L1
metric, with ZERO Python: the classic two-pass chamfer recurrence
e(x) = min(e(x-1) + 1, d(x)) is not a window aggregate, but its closed
form IS one —

    e(x) = min_{x' <= x} (d(x') + x - x')  =  x + min_{x' <= x} (d(x') - x')

a plain running MIN of (d - x). L1 separability (Felzenszwalb-Huttenlocher
family, trivial case p=1) then gives the full 2-D transform as four
windowed scans:

    pass 1/2 (per column, gy asc/desc):  d1 = vertical distance to the
        nearest fg pixel in the same column (gy - MAX(fg gy <= y), resp.
        MIN(fg gy >= y) - gy);
    pass 3/4 (per row, gx asc/desc):     d = min_x' (d1(x') + |x - x'|)
        = LEAST(gx + MIN(d1 - gx') fwd, -gx + MIN(d1 + gx') bwd).

The mask is the raster_ccl blob lattice, evaluated INLINE as integer
Catalyst expressions (no join, no UDF) — the whole operator is two window
exchanges (hash by gx, then by gy) plus one partial-aggregated histogram.

Scale: rows-as-pixels is the right shape up to ~10^9 pixels (a window
over a raster column is one sorted partition). Past that, the SAME
min-plus reduction runs inside a per-tile Arrow kernel with the halo
pattern of operators/raster_focal.py — each tile needs only its row/column
envelope boundary values (2 numbers per boundary line), the cheapest halo
of any raster operator. The windowed form here is the single-source of
truth the tile kernel would be tested against.

Oracle: identical mask CTEs (shared with raster_ccl) + identical window
algebra in DuckDB — int64 end-to-end, bit-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_ccl import (
    _HM,
    H,
    PA,
    PB,
    SEED_A,
    SEED_B,
    W,
    _fg_sql_one,
)
from etf_topox_spark.registry import query

_INF = 1 << 20  # > any possible L1 distance in a W x H raster


def _fg_col(p: int, seed: int) -> F.Column:
    """One blob lattice's fg predicate as a pure integer Catalyst column
    (same formula as raster_ccl.raster_fg / the oracle CTEs); all
    divisions are integer DIV — no doubles anywhere."""
    h = f"(((gx DIV {p}) * 73856093 + (gy DIV {p}) * 19349663 + {seed}) % {_HM})"
    return F.expr(
        f"((({h} DIV {p * p * 5}) % 4) < 3) AND "
        f"(gx % {p} - {h} % {p}) * (gx % {p} - {h} % {p})"
        f" + (gy % {p} - ({h} DIV {p}) % {p}) * (gy % {p} - ({h} DIV {p}) % {p})"
        f" <= (3 + ({h} DIV {p * p}) % 5) * (3 + ({h} DIV {p * p}) % 5)"
    )


def l1_distance_field(spark: SparkSession) -> DataFrame:
    """(gx, gy, dist) for every pixel: exact L1 distance to the nearest
    blob-lattice foreground pixel (0 on foreground)."""
    px = spark.range(0, W * H, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % W).alias("gx"), (F.col("id") / W).cast("long").alias("gy")
    )
    fg = _fg_col(PA, SEED_A) | _fg_col(PB, SEED_B)
    px = px.withColumn("fgy", F.when(fg, F.col("gy")))

    up = Window.partitionBy("gx").orderBy("gy").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dn = Window.partitionBy("gx").orderBy(F.col("gy").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d1 = px.select(
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
    return d1.select(
        "gx",
        "gy",
        F.least(
            F.col("gx") + F.min(F.col("d1") - F.col("gx")).over(lf),
            -F.col("gx") + F.min(F.col("d1") + F.col("gx")).over(rt),
        ).alias("dist"),
    )


_DT_SQL = f"""WITH
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({W})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({H})),
px0 AS (SELECT gx, gy FROM xs CROSS JOIN ys),
px AS (SELECT gx, gy FROM px0),
{_fg_sql_one(PA, SEED_A, 'ca')},
{_fg_sql_one(PB, SEED_B, 'cb')},
m AS (
  SELECT p.gx, p.gy,
         CASE WHEN
           (ca.present AND
            (p.gx % {PA} - ca.ox) * (p.gx % {PA} - ca.ox)
          + (p.gy % {PA} - ca.oy) * (p.gy % {PA} - ca.oy) <= ca.r * ca.r)
        OR (cb.present AND
            (p.gx % {PB} - cb.ox) * (p.gx % {PB} - cb.ox)
          + (p.gy % {PB} - cb.oy) * (p.gy % {PB} - cb.oy) <= cb.r * cb.r)
         THEN p.gy END AS fgy
  FROM px p
  JOIN ca ON ca.cx = p.gx // {PA} AND ca.cy = p.gy // {PA}
  JOIN cb ON cb.cx = p.gx // {PB} AND cb.cy = p.gy // {PB}
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
  SELECT gx, gy,
         LEAST(
           gx + MIN(d1 - gx) OVER (PARTITION BY gy ORDER BY gx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           -gx + MIN(d1 + gx) OVER (PARTITION BY gy ORDER BY gx DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ) AS dist
  FROM v
)
SELECT dist, COUNT(*) AS n_px,
       CAST(SUM(gx + gy) AS BIGINT) AS sum_xy
FROM d GROUP BY dist ORDER BY dist
"""


@query("raster_distance_l1", oracle=_DT_SQL)
def raster_distance_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance histogram of the exact L1 distance transform over the
    {W}x{H} blob raster (dist = 0 rows are the foreground itself), plus a
    coordinate checksum per distance so a single misplaced pixel anywhere
    in the field flips a row. Four windowed scans, zero Python (module
    docstring)."""
    return (
        l1_distance_field(spark)
        .groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_px"),
            F.sum(F.col("gx") + F.col("gy")).alias("sum_xy"),
        )
        .orderBy("dist")
    )
