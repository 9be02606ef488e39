"""Stay-point detection over object trajectories (SURVEY.md §2.C
temporal-feature family; the GeoLife stay-point primitive, Li et al. 2008,
simplified to dense-sampling runs).

A stay point is a maximal run of >= MIN_LEN consecutive small steps
(squared step length <= EPS^2): the dwell episodes that turn raw GPS
streams into visits (POI mining, delivery stops, vessel berthing). The
trajectory corpus here is a purpose-built dwell/travel formula — objects
alternate 25-tick dwell phases (micro-jitter around a per-phase anchor)
with 25-tick travel phases (modular scatter over the 20x20-degree
window), all integer-mod arithmetic plus one double division per term so
the DuckDB oracle replays the identical IEEE values bit-for-bit
(sources/points.py provenance note).

Scale shape: ONE hash exchange on object_id (the natural trajectory
partitioning), lag + gaps-and-islands windows inside each partition, then
a partial-aggregable groupBy on (object_id, run) — nothing wider than an
output row crosses the second exchange. Centroid sums use the
decimal-exact dsum contract so both engines agree bit-for-bit regardless
of per-run summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.relational import _dsum_sql, dsum
from etf_topox_spark.registry import query

N_TRAJ = 20_000
N_OBJECTS = 50
EPS2 = 0.0001  # (0.01 deg)^2
MIN_LEN = 10  # steps
KX = 13619
KY = 7387


def _xy_sql() -> tuple[str, str]:
    """(x, y) of (object_id obj, tick t, point id i) — shared spelling; the
    Spark side swaps // for DIV."""
    ax = "CAST((obj * 131 + (t // 50) * 517) % 20000 AS DOUBLE) / 1000"
    ay = "CAST((obj * 277 + (t // 50) * 839) % 20000 AS DOUBLE) / 1000"
    x = (
        f"CASE WHEN (t // 25) % 2 = 0 THEN ({ax}) + CAST((i * {KX}) % 800 AS DOUBLE) / 1000000"
        f" ELSE CAST((i * {KX}) % 20000 AS DOUBLE) / 1000 END"
    )
    y = (
        f"CASE WHEN (t // 25) % 2 = 0 THEN ({ay}) + CAST((i * {KY}) % 800 AS DOUBLE) / 1000000"
        f" ELSE CAST((i * {KY}) % 20000 AS DOUBLE) / 1000 END"
    )
    return x, y


def _stay_sql() -> str:
    x, y = _xy_sql()
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range({N_TRAJ})),
tr AS (
  SELECT i % {N_OBJECTS} AS obj, i // {N_OBJECTS} AS t, i FROM ids
),
pos AS (SELECT obj, t, {x} AS x, {y} AS y FROM tr),
st AS (
  SELECT obj, t, x, y,
         x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM pos WINDOW w AS (PARTITION BY obj ORDER BY t)
),
fl AS (
  SELECT obj, t, x, y,
         CASE WHEN dx * dx + dy * dy <= {EPS2} THEN 1 ELSE 0 END AS f
  FROM st WHERE dx IS NOT NULL
),
runs AS (
  SELECT obj, t, x, y, f,
         t - ROW_NUMBER() OVER (PARTITION BY obj, f ORDER BY t) AS grp
  FROM fl
)
SELECT obj AS object_id, CAST(MIN(t) AS BIGINT) AS start_t,
       CAST(MAX(t) AS BIGINT) AS end_t, COUNT(*) AS n_steps,
       {_dsum_sql('x')} AS cx_sum, {_dsum_sql('y')} AS cy_sum
FROM runs WHERE f = 1
GROUP BY obj, grp HAVING COUNT(*) >= {MIN_LEN}
ORDER BY object_id, start_t
"""


@query("trajectory_stay_points", oracle=_stay_sql())
def trajectory_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-episode extraction: maximal runs of >= MIN_LEN consecutive
    steps with squared length <= EPS2, one row per stay with its tick span
    and exact centroid mass (module docstring)."""
    from pyspark.sql import Window

    x, y = (s.replace("//", "DIV") for s in _xy_sql())
    tr = spark.range(0, N_TRAJ, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % N_OBJECTS).alias("obj"),
        F.expr(f"id DIV {N_OBJECTS}").alias("t"),
        F.col("id").alias("i"),
    )
    pos = tr.select("obj", "t", F.expr(x).alias("x"), F.expr(y).alias("y"))
    w = Window.partitionBy("obj").orderBy("t")
    st = pos.select(
        "obj", "t", "x", "y",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    ).filter(F.col("dx").isNotNull())
    fl = st.select(
        "obj", "t", "x", "y",
        F.when(
            F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy") <= EPS2, 1
        ).otherwise(0).alias("f"),
    )
    wr = Window.partitionBy("obj", "f").orderBy("t")
    runs = fl.select(
        "obj", "t", "x", "y", "f",
        (F.col("t") - F.row_number().over(wr)).alias("grp"),
    )
    return (
        runs.filter(F.col("f") == 1)
        .groupBy("obj", "grp")
        .agg(
            F.min("t").alias("start_t"),
            F.max("t").alias("end_t"),
            F.count(F.lit(1)).alias("n_steps"),
            dsum(F.col("x")).alias("cx_sum"),
            dsum(F.col("y")).alias("cy_sum"),
        )
        .filter(F.col("n_steps") >= MIN_LEN)
        .select(
            F.col("obj").alias("object_id"),
            "start_t", "end_t", "n_steps", "cx_sum", "cy_sum",
        )
        .orderBy("object_id", "start_t")
    )
