"""D8 flow accumulation over the watershed DEM — upstream-cell counts.

The second hydrology workhorse (ESRI Flow Accumulation, GRASS
r.watershed's accum output): for every cell, how many OTHER cells' flow
paths pass through it. Stream networks are the high-accumulation cells;
basin outlets are the pits with the basin size minus one.

Same DEM and D8 successor map as operators/raster_watershed.py (heights
inline-evaluable → the successor needs no neighbor join). Accumulation is
computed from the flow-reach pair set: every (cell, strict downstream
cell) pair, built by pointer doubling in ceil(log2 L) rounds where each
round unions the current reach set with its composition through the
current 2^k-step pointer — so acc(v) = |{u : v on u's strict downstream
path}|. Paths here are <= 62 hops (strict descent, h <= 2(P-1)), so 7
rounds close the reach set.

Scale note: the reach set is O(N x path_length) pairs — exact and fine at
raster-tile scale, where paths are short by construction (each tile's
relief bounds hop count). For continental DEMs with kilometer-long paths
the production variant pre-accumulates inside partition blocks with a
numpy topological push and closes only the block-boundary skeleton
(the raster_focal halo-exchange shape) — same result, pairs bounded by
block crossings. Chosen form here because the oracle can replay it as a
recursive-CTE walk, bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_watershed import ROUNDS, WS, _h_sql, _next_expr
from etf_topox_spark.registry import query


def flow_accumulation(spark: SparkSession) -> DataFrame:
    """(acc, n_cells): histogram of upstream-cell counts (self excluded)."""
    px = spark.range(0, WS * WS, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % WS).alias("gx"), (F.col("id") / WS).cast("long").alias("gy")
    )
    nxt_x, nxt_y = _next_expr("spark")
    base = px.select(
        (F.col("gy") * WS + F.col("gx")).alias("pid"),
        F.expr(f"({nxt_y}) * {WS} + ({nxt_x})").alias("nxt"),
    ).localCheckpoint(eager=False)
    # strict 1-step reach (pits point at themselves — exclude self loops)
    reach = base.filter(F.col("nxt") != F.col("pid")).select(
        F.col("pid").alias("src"), F.col("nxt").alias("dst")
    )
    ptr = reach  # 2^k-step pointer, also self-loop-free
    for _ in range(ROUNDS):
        hop = ptr.select(F.col("src").alias("hsrc"), F.col("dst").alias("hdst"))
        ext = (
            reach.join(hop, reach["dst"] == hop["hsrc"])
            .select("src", F.col("hdst").alias("dst"))
        )
        reach = reach.unionByName(ext).distinct().localCheckpoint(eager=False)
        ptr = (
            ptr.join(hop, ptr["dst"] == hop["hsrc"])
            .select("src", F.col("hdst").alias("dst"))
            .localCheckpoint(eager=False)
        )
    acc = reach.groupBy("dst").agg(F.count(F.lit(1)).alias("acc"))
    cells = base.select(F.col("pid").alias("dst"))
    full = cells.join(acc, "dst", "left").select(
        F.coalesce("acc", F.lit(0)).alias("acc")
    )
    return (
        full.groupBy("acc")
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .orderBy("acc")
    )


def _flowacc_sql() -> str:
    nxt_x, nxt_y = _next_expr("sql")
    return f"""WITH RECURSIVE
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({WS})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({WS})),
cells AS (
  SELECT gx, gy, gy * {WS} + gx AS pid, {_h_sql('gx', 'gy')} AS h
  FROM xs CROSS JOIN ys
),
nx AS (
  SELECT pid, ({nxt_y}) * {WS} + ({nxt_x}) AS nxt
  FROM cells
),
step AS (SELECT pid AS src, nxt AS dst FROM nx WHERE nxt <> pid),
walk(src, dst) AS (
  SELECT src, dst FROM step
  UNION
  SELECT w.src, s.dst FROM walk w JOIN step s ON s.src = w.dst
),
acc AS (
  SELECT n.pid, COALESCE(a.c, 0) AS acc
  FROM nx n LEFT JOIN (SELECT dst, COUNT(*) AS c FROM walk GROUP BY dst) a
    ON a.dst = n.pid
)
SELECT CAST(acc AS BIGINT) AS acc, COUNT(*) AS n_cells
FROM acc GROUP BY acc ORDER BY acc
"""


@query("raster_flow_accumulation", oracle=_flowacc_sql())
def raster_flow_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow-accumulation census of the {WS}x{WS} DEM: for each upstream
    count (self excluded), how many cells carry it — the stream-network
    statistic (high-acc tail = channels, acc 0 = ridgelines). Reach-pair
    pointer doubling (module docstring); the oracle walks the identical
    successor map with a recursive CTE and counts path memberships."""
    return flow_accumulation(spark)
