"""Line-of-sight viewshed over the DEM — exact rational horizon test.

The GIS visibility operator (GRASS r.viewshed, ESRI Visibility): a cell
at distance t along a ray from the observer is visible iff its elevation
angle strictly exceeds every angle closer on the ray:

    visible(t)  <=>  for all s < t:  (h(s) - h_obs) / s  <  (h(t) - h_obs) / t

Division never happens: the comparison cross-multiplies to
(h(s) - h_obs) * t < (h(t) - h_obs) * s — pure int64 — and "for all s"
becomes a per-ray ANTI-JOIN of the ray's prefix pairs. Rays are 16
integer direction vectors from a fixed observer; cells along a ray are
an explode over step counts, heights inline from the watershed DEM
formula (production: a co-partitioned tile join, raster_focal.py's halo
pattern's 1-D cousin).

Per-ray prefix pairs are O(T^2/2) with T <= 95 steps — 72k comparisons
total, all JVM-side; the result pre-aggregates to one row per ray
(visible count, furthest visible step, first occluded step). At scale
the same shape fans out over observers: each observer's rays are
independent (embarrassingly parallel), and the pair expansion stays
bounded by the ray length, never the raster.

Oracle: identical ray tables and NOT EXISTS in SQL — bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_watershed import WS, _h_spark, _h_sql
from etf_topox_spark.registry import query

OBS_X, OBS_Y = 97, 101  # observer cell (interior, off stripe boundaries)
OBS_UP = 3              # observer height above ground

# 16 integer ray directions (8 principal + 8 knight-step)
RAYS = [
    (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1),
    (2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2), (1, -2), (2, -1),
]


def _ray_table(spark: SparkSession) -> DataFrame:
    rows = [(i, dx, dy) for i, (dx, dy) in enumerate(RAYS)]
    return spark.createDataFrame(rows, "ray int, dx long, dy long")


def viewshed(spark: SparkSession) -> DataFrame:
    """(ray, n_steps, n_visible, max_visible_step, first_hidden_step)."""
    steps = spark.range(1, WS).select(F.col("id").alias("t"))
    cells = (
        _ray_table(spark)
        .crossJoin(F.broadcast(steps))
        .select(
            "ray",
            "t",
            (OBS_X + F.col("dx") * F.col("t")).alias("gx"),
            (OBS_Y + F.col("dy") * F.col("t")).alias("gy"),
        )
        .filter(
            (F.col("gx") >= 0) & (F.col("gx") < WS)
            & (F.col("gy") >= 0) & (F.col("gy") < WS)
        )
        .select(
            "ray", "t",
            (F.expr(_h_spark("gx", "gy"))
             - F.lit(int(_h_obs()) + OBS_UP)).alias("dh"),
        )
    )
    a, b = cells.alias("a"), cells.alias("b")
    blocked = (F.col("b.t") < F.col("a.t")) & (
        F.col("b.dh") * F.col("a.t") >= F.col("a.dh") * F.col("b.t")
    )
    vis = a.join(b, (F.col("b.ray") == F.col("a.ray")) & blocked, "left_anti")
    per_ray = vis.groupBy(F.col("a.ray").alias("ray")).agg(
        F.count(F.lit(1)).alias("n_visible"),
        F.max("a.t").alias("max_visible_step"),
    )
    totals = cells.groupBy("ray").agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.max("t").alias("t_max"),
    )
    hidden = (
        cells.join(vis.select(F.col("a.ray").alias("ray"), F.col("a.t").alias("t")),
                   ["ray", "t"], "left_anti")
        .groupBy("ray")
        .agg(F.min("t").alias("first_hidden_step"))
    )
    return (
        totals.join(per_ray, "ray", "left")
        .join(hidden, "ray", "left")
        .select(
            "ray",
            "n_steps",
            F.coalesce("n_visible", F.lit(0)).alias("n_visible"),
            F.coalesce("max_visible_step", F.lit(0)).alias("max_visible_step"),
            F.coalesce("first_hidden_step", F.lit(-1)).alias("first_hidden_step"),
        )
        .orderBy("ray")
    )


def _h_obs() -> int:
    px = ((OBS_X // 32) * 7919 + 13) % 32
    py = ((OBS_Y // 32) * 104729 + 7) % 32
    return abs(OBS_X % 32 - px) + abs(OBS_Y % 32 - py)


def _vs_sql() -> str:
    rays = ",\n    ".join(f"({i}, {dx}, {dy})" for i, (dx, dy) in enumerate(RAYS))
    ho = _h_obs() + OBS_UP
    return f"""WITH
rays(ray, dx, dy) AS (VALUES
    {rays}
),
cells AS (
  SELECT r.ray, t.t,
         {_h_sql(f'{OBS_X} + r.dx * t.t', f'{OBS_Y} + r.dy * t.t')} - {ho} AS dh
  FROM rays r
  CROSS JOIN (SELECT CAST(range AS BIGINT) + 1 AS t FROM range({WS - 1})) t
  WHERE {OBS_X} + r.dx * t.t BETWEEN 0 AND {WS - 1}
    AND {OBS_Y} + r.dy * t.t BETWEEN 0 AND {WS - 1}
),
vis AS (
  SELECT a.ray, a.t
  FROM cells a
  WHERE NOT EXISTS (
    SELECT 1 FROM cells b
    WHERE b.ray = a.ray AND b.t < a.t AND b.dh * a.t >= a.dh * b.t
  )
),
totals AS (SELECT ray, COUNT(*) AS n_steps FROM cells GROUP BY ray),
per_ray AS (
  SELECT ray, COUNT(*) AS n_visible, MAX(t) AS max_visible_step
  FROM vis GROUP BY ray
),
hidden AS (
  SELECT c.ray, MIN(c.t) AS first_hidden_step
  FROM cells c LEFT JOIN vis v ON v.ray = c.ray AND v.t = c.t
  WHERE v.ray IS NULL GROUP BY c.ray
)
SELECT t.ray, t.n_steps,
       COALESCE(p.n_visible, 0) AS n_visible,
       COALESCE(p.max_visible_step, 0) AS max_visible_step,
       COALESCE(h.first_hidden_step, -1) AS first_hidden_step
FROM totals t
LEFT JOIN per_ray p ON p.ray = t.ray
LEFT JOIN hidden h ON h.ray = t.ray
ORDER BY t.ray
"""


@query("raster_viewshed", oracle=_vs_sql())
def raster_viewshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ray visibility census from a fixed observer over the watershed
    DEM: integer cross-multiplied horizon test, prefix anti-join (module
    docstring)."""
    return viewshed(spark)
