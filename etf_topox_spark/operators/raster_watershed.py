"""D8 watershed delineation over a DEM — pointer-doubled catchments.

The hydrology workhorse (ESRI Flow Direction + Basin, GRASS r.watershed):
every DEM cell drains to its steepest-descent 8-neighbor (D8); the
transitive closure of that single-successor map partitions the raster
into catchment basins, one per local minimum (pit).

DEM: the separable integer surface h = |x mod P - PX(x DIV P)| +
|y mod P - PY(y DIV P)| with per-stripe hashed pit offsets — heights are
formula-evaluable at any cell, so the D8 successor needs NO neighbor
join: all 8 neighbor heights inline as Catalyst expressions, steepest
drop picked by a rank expression with a fixed direction-order tie-break.
Pit columns hash independently per stripe, so flow routinely CROSSES
stripe blocks (a boundary cell can see a lower cell of the neighboring
block) — basins are emergent, not the trivial grid.

The closure is pointer doubling: next^(2k) = next^k JOIN next^k, so a
longest flow path of L steps resolves in ceil(log2 L) self-join rounds —
here h <= 2(P-1) = 62 and every step strictly descends, so L <= 62 and
7 rounds suffice (the proof is in the docstring of _next_expr; the test
asserts convergence). Each round is ONE shuffle of (cell, successor)
pairs with localCheckpoint lineage-flattening — the standard functional-
graph closure at 10^12 cells, vs O(L) rounds for naive push.

Oracle: recursive-CTE walk of the identical successor map in SQL
(different closure order), grouped per pit — bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query

WS = 192   # raster edge
P = 32     # stripe period
ROUNDS = 7  # 2^7 = 128 > max path length 62

# (dx, dy) in fixed tie-break order
_D8 = [(0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1)]


def _h_sql(x: str, y: str) -> str:
    """Height at ({x}, {y}) as a SQL expression (both engines)."""
    px = f"((({x}) // {P}) * 7919 + 13) % {P}"
    py = f"((({y}) // {P}) * 104729 + 7) % {P}"
    return f"(ABS(({x}) % {P} - ({px})) + ABS(({y}) % {P} - ({py})))"


def _h_spark(x: str, y: str) -> str:
    return _h_sql(x, y).replace("//", "DIV")


def _next_expr(engine: str) -> tuple[str, str]:
    """(nxt_x, nxt_y) expressions: the D8 successor of (gx, gy), or the
    cell itself when no strict descent exists (a pit). Strict descent
    bounds every flow path by h(start) <= 2*(P-1): each hop drops h by
    >= 1, so pointer doubling needs ceil(log2(2P)) rounds."""
    h = _h_spark if engine == "spark" else _h_sql
    h0 = h("gx", "gy")
    cands_x, cands_y = [], []
    for i, (dx, dy) in enumerate(_D8):
        nx, ny = f"(gx + {dx})", f"(gy + {dy})"
        inb = f"{nx} >= 0 AND {nx} < {WS} AND {ny} >= 0 AND {ny} < {WS}"
        drop = f"({h0} - {h(nx, ny)})"
        # score packs (drop, direction preference) into one integer:
        # higher drop wins; ties break toward the earlier direction
        score = f"CASE WHEN {inb} THEN {drop} * 8 + {7 - i} ELSE -1000 END"
        cands_x.append((score, nx))
        cands_y.append((score, ny))
    best = "GREATEST(" + ", ".join(s for s, _ in cands_x) + ")"
    pick_x = "CASE " + " ".join(
        f"WHEN {best} = ({s}) AND ({s}) >= 8 THEN {nx}"
        for s, nx in cands_x
    ) + " ELSE gx END"
    pick_y = "CASE " + " ".join(
        f"WHEN {best} = ({s}) AND ({s}) >= 8 THEN {ny}"
        for s, ny in cands_y
    ) + " ELSE gy END"
    return pick_x, pick_y


def watershed_basins(spark: SparkSession) -> DataFrame:
    """(pit_x, pit_y, n_cells, sum_h, max_h) per catchment basin."""
    px = spark.range(0, WS * WS, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % WS).alias("gx"), (F.col("id") / WS).cast("long").alias("gy")
    )
    nxt_x, nxt_y = _next_expr("spark")
    cur = px.select(
        (F.col("gy") * WS + F.col("gx")).alias("pid"),
        F.expr(f"({nxt_y}) * {WS} + ({nxt_x})").alias("nxt"),
        F.expr(_h_spark("gx", "gy")).alias("h"),
    ).localCheckpoint(eager=False)
    ptr = cur.select("pid", "nxt")
    for _ in range(ROUNDS):
        b = ptr.select(F.col("pid").alias("bpid"), F.col("nxt").alias("bnxt"))
        ptr = (
            ptr.join(b, ptr["nxt"] == b["bpid"])
            .select("pid", F.col("bnxt").alias("nxt"))
            .localCheckpoint(eager=False)
        )
    lab = ptr.select("pid", F.col("nxt").alias("root"))
    return (
        cur.join(lab, "pid")
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("h").alias("sum_h"),
            F.max("h").alias("max_h"),
        )
        .select(
            (F.col("root") % WS).alias("pit_x"),
            F.expr(f"root DIV {WS}").alias("pit_y"),
            "n_cells",
            "sum_h",
            "max_h",
        )
        .orderBy("pit_x", "pit_y")
    )


def _ws_sql() -> str:
    nxt_x, nxt_y = _next_expr("sql")
    return f"""WITH RECURSIVE
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({WS})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({WS})),
cells AS (
  SELECT gx, gy, gy * {WS} + gx AS pid, {_h_sql('gx', 'gy')} AS h
  FROM xs CROSS JOIN ys
),
nx AS (
  SELECT pid, h, ({nxt_y}) * {WS} + ({nxt_x}) AS nxt
  FROM cells
),
walk(pid, cur) AS (
  SELECT pid, pid FROM nx
  UNION
  SELECT w.pid, n.nxt FROM walk w JOIN nx n ON n.pid = w.cur
),
roots AS (
  SELECT w.pid, w.cur AS root
  FROM walk w JOIN nx p ON p.pid = w.cur
  WHERE p.nxt = p.pid
)
SELECT r.root % {WS} AS pit_x, r.root // {WS} AS pit_y,
       COUNT(*) AS n_cells,
       CAST(SUM(n.h) AS BIGINT) AS sum_h,
       MAX(n.h) AS max_h
FROM roots r JOIN nx n ON n.pid = r.pid
GROUP BY 1, 2
ORDER BY pit_x, pit_y
"""


@query("raster_watershed", oracle=_ws_sql())
def raster_watershed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 catchment basins of the {WS}x{WS} synthetic DEM: pit location,
    basin size, height mass per basin, via {ROUNDS} pointer-doubling
    rounds (module docstring). The oracle walks the identical successor
    map with a recursive CTE."""
    return watershed_basins(spark)
