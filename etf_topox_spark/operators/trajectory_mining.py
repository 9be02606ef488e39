"""Trajectory mining: origin-destination flow matrix and convoy (co-
movement) detection (SURVEY.md §2.C temporal/geo family — the two
fleet-analytics queries every movement-data platform ships next to
stay-point detection).

- ``spatial_od_matrix``: zone-to-zone transition counts over the
  dwell/travel trajectory corpus of operators/trajectory_stay.py —
  consecutive fixes whose 4-degree zones differ contribute one flow.
  ONE lag window on the object partition + ONE partial-aggregable
  groupBy on the (from, to) zone pair; at 10^12 fixes the matrix is
  bounded by zones^2, not by data.

- ``spatial_convoy_detection``: maximal co-movement episodes — ordered
  object pairs within CONVOY_D of each other for >= CONVOY_K consecutive
  ticks (the convoy/flock pattern of Jeung et al. 2008, discrete-tick
  variant). The corpus is a purpose-built formation formula: 8 groups of
  5 objects sharing a base path with small per-member offsets, each
  member wandering off during its own 25-tick divergence windows — so
  episodes genuinely form and break. The ENGINE finds candidate pairs by
  cell blocking (cell side = CONVOY_D, 9-neighborhood explode on one
  side — each pair found exactly once because the other side keeps its
  single home cell); the ORACLE joins all pairs naively — a different
  candidate generator, so a blocking bug (missed neighbor cell, double
  count) breaks the match. Pair flags then run the same gaps-and-islands
  windows as stay-point runs.

All coordinates are integer milli-degrees end to end — distances and
thresholds exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query

# --- OD matrix over the stay corpus ------------------------------------------

ZONE_DEG = 4

_OD_N = 20_000
_OD_OBJECTS = 50


def _od_sql() -> str:
    from etf_topox_spark.operators.trajectory_stay import _xy_sql

    x, y = _xy_sql()
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range({_OD_N})),
tr AS (SELECT i % {_OD_OBJECTS} AS obj, i // {_OD_OBJECTS} AS t, i FROM ids),
pos AS (SELECT obj, t, {x} AS x, {y} AS y FROM tr),
z AS (
  SELECT obj, t,
         CAST(FLOOR(x / {ZONE_DEG}) AS BIGINT) AS zx,
         CAST(FLOOR(y / {ZONE_DEG}) AS BIGINT) AS zy
  FROM pos
),
tx AS (
  SELECT obj, t, zx, zy,
         LAG(zx) OVER w AS pzx, LAG(zy) OVER w AS pzy
  FROM z WINDOW w AS (PARTITION BY obj ORDER BY t)
)
SELECT pzx AS from_zx, pzy AS from_zy, zx AS to_zx, zy AS to_zy,
       COUNT(*) AS n_flows, COUNT(DISTINCT obj) AS n_objects
FROM tx
WHERE pzx IS NOT NULL AND (zx <> pzx OR zy <> pzy)
GROUP BY 1, 2, 3, 4
ORDER BY from_zx, from_zy, to_zx, to_zy
"""


@query("spatial_od_matrix", oracle=_od_sql())
def spatial_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-to-zone flow matrix: transitions between consecutive fixes'
    4-degree zones, with distinct-object reach per flow (module
    docstring)."""
    from pyspark.sql import Window

    from etf_topox_spark.operators.trajectory_stay import _xy_sql

    x, y = (s.replace("//", "DIV") for s in _xy_sql())
    tr = spark.range(0, _OD_N, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % _OD_OBJECTS).alias("obj"),
        F.expr(f"id DIV {_OD_OBJECTS}").alias("t"),
        F.col("id").alias("i"),
    )
    z = tr.select(
        "obj", "t",
        F.floor(F.expr(x) / ZONE_DEG).alias("zx"),
        F.floor(F.expr(y) / ZONE_DEG).alias("zy"),
    )
    w = Window.partitionBy("obj").orderBy("t")
    tx = z.select(
        "obj", "zx", "zy",
        F.lag("zx").over(w).alias("pzx"), F.lag("zy").over(w).alias("pzy"),
    ).filter(
        F.col("pzx").isNotNull()
        & ((F.col("zx") != F.col("pzx")) | (F.col("zy") != F.col("pzy")))
    )
    return (
        tx.groupBy(
            F.col("pzx").alias("from_zx"), F.col("pzy").alias("from_zy"),
            F.col("zx").alias("to_zx"), F.col("zy").alias("to_zy"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.countDistinct("obj").alias("n_objects"),
        )
        .orderBy("from_zx", "from_zy", "to_zx", "to_zy")
    )


# --- convoy detection --------------------------------------------------------

CONVOY_OBJS = 40
CONVOY_T = 200
CONVOY_D = 50  # milli-degrees
CONVOY_K = 20  # minimum episode length (ticks)
_D2 = CONVOY_D * CONVOY_D


def _convoy_xy() -> tuple[str, str]:
    """Integer milli-degree position of object ``obj`` at tick ``t`` —
    formation base path per group (obj % 8) + member offset (obj // 8),
    with a per-member 25-tick divergence window."""
    gx = "((obj % 8) * 1723 + t * 37) % 20000"
    gy = "((obj % 8) * 2417 + t * 53) % 20000"
    div = "((t // 25) + obj) % 5 = 0"
    wx = "((obj * 77 + t * 991) % 9000 + 1000)"
    wy = "((obj * 113 + t * 577) % 9000 + 1000)"
    x = f"CASE WHEN {div} THEN (({gx}) + {wx}) % 20000 ELSE ({gx}) + (obj // 8) * 3 END"
    y = f"CASE WHEN {div} THEN (({gy}) + {wy}) % 20000 ELSE ({gy}) + (obj // 8) * 3 END"
    return x, y


def _convoy_sql() -> str:
    x, y = _convoy_xy()
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS k FROM range({CONVOY_OBJS * CONVOY_T})),
tr AS (SELECT k % {CONVOY_OBJS} AS obj, k // {CONVOY_OBJS} AS t FROM ids),
pos AS (SELECT obj, t, {x} AS x, {y} AS y FROM tr),
close_pairs AS (
  SELECT a.obj AS oa, b.obj AS ob, a.t AS t
  FROM pos a JOIN pos b ON b.t = a.t AND b.obj > a.obj
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_D2}
),
runs AS (
  SELECT oa, ob, t,
         t - ROW_NUMBER() OVER (PARTITION BY oa, ob ORDER BY t) AS grp
  FROM close_pairs
)
SELECT oa AS obj_a, ob AS obj_b, CAST(MIN(t) AS BIGINT) AS start_t,
       CAST(MAX(t) AS BIGINT) AS end_t, COUNT(*) AS n_ticks
FROM runs GROUP BY oa, ob, grp HAVING COUNT(*) >= {CONVOY_K}
ORDER BY obj_a, obj_b, start_t
"""


@query("spatial_convoy_detection", oracle=_convoy_sql())
def spatial_convoy_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal convoy episodes: object pairs within CONVOY_D for >=
    CONVOY_K consecutive ticks; engine candidates via per-tick cell
    blocking, episodes via gaps-and-islands (module docstring)."""
    from pyspark.sql import Window

    x, y = (s.replace("//", "DIV") for s in _convoy_xy())
    tr = spark.range(
        0, CONVOY_OBJS * CONVOY_T, 1, spark.sparkContext.defaultParallelism
    ).select(
        (F.col("id") % CONVOY_OBJS).alias("obj"),
        F.expr(f"id DIV {CONVOY_OBJS}").alias("t"),
    )
    pos = tr.select("obj", "t", F.expr(x).alias("x"), F.expr(y).alias("y"))
    # cell side = CONVOY_D: any pair within D sits in the same or an
    # adjacent cell. Explode side A to its 9-neighborhood; side B keeps
    # its single home cell, so each candidate pair arises exactly once.
    cell = lambda c: F.expr(f"{c} DIV {CONVOY_D}")  # noqa: E731 - coords >= 0
    b = pos.select(
        F.col("obj").alias("ob"), "t",
        F.col("x").alias("xb"), F.col("y").alias("yb"),
        cell("x").alias("cx"), cell("y").alias("cy"),
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    a = pos.select(
        F.col("obj").alias("oa"), "t", "x", "y",
        cell("x").alias("acx"), cell("y").alias("acy"),
        F.explode(offs).alias("o"),
    ).select(
        "oa", "t", "x", "y",
        (F.col("acx") + F.col("o.dx")).alias("cx"),
        (F.col("acy") + F.col("o.dy")).alias("cy"),
    )
    close = (
        a.join(b, ["cx", "cy", "t"])
        .filter(
            (F.col("ob") > F.col("oa"))
            & (
                (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb"))
                + (F.col("y") - F.col("yb")) * (F.col("y") - F.col("yb"))
                <= _D2
            )
        )
        .select("oa", "ob", "t")
    )
    w = Window.partitionBy("oa", "ob").orderBy("t")
    runs = close.select(
        "oa", "ob", "t", (F.col("t") - F.row_number().over(w)).alias("grp")
    )
    return (
        runs.groupBy("oa", "ob", "grp")
        .agg(
            F.min("t").alias("start_t"),
            F.max("t").alias("end_t"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .filter(F.col("n_ticks") >= CONVOY_K)
        .select(
            F.col("oa").alias("obj_a"), F.col("ob").alias("obj_b"),
            "start_t", "end_t", "n_ticks",
        )
        .orderBy("obj_a", "obj_b", "start_t")
    )
