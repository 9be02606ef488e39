"""Strahler stream order over the D8 drainage forest (SURVEY.md §2.C
raster/hydrology family — the stream-classification pass GRASS
r.stream.order / ArcGIS Stream Order runs downstream of flow direction;
completes the watershed → flow-accumulation → ordering chain).

Strahler order on the drainage tree: leaves are order 1; an interior
cell's order is the max of its children's orders, +1 when at least two
children attain that max (equivalently max(m1, m2+1) over the top-two
child orders).

Scale shape: basins are independent — ONE pointer-doubled closure labels
every cell with its pit root (shared machinery with raster_watershed, 7
log-rounds), then ONE exchange co-partitions each basin and the grouped
Arrow kernel runs the linear-time local tree pass (cells sorted by
height are already topologically ordered: flow strictly descends).
Basin size is bounded by the stripe construction, so groups stay small;
at 10^12 cells this is the standard partition-by-catchment hydrology
plan. Output is the per-order census.

Oracle: the monotone fixed-point iteration instead — ord_0 = all-1,
ord_{k+1}(v) = f(children's ord_k), correct to subtree-height k after k
rounds and every path is <= 2(P-1) hops (measured max: 30; 32 rounds) —
run as a whole-field LIST-state recursive CTE (_strahler_sql docstring).
A genuinely different algorithm AND different partitioning from the
engine's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.raster_watershed import (
    ROUNDS,
    WS,
    _h_spark,
    _h_sql,
    _next_expr,
)
from etf_topox_spark.registry import query

# Analytic bound: max drainage path <= max h = 2*(P-1) = 62 hops; the
# fixture's measured longest path is 30 (numpy closure; pinned by the
# convergence pytest), so 32 rounds leave margin without tripling the
# oracle's unrolled depth.
S_ROUNDS = 32


def _strahler_sql() -> str:
    """Whole-field LIST-state recursion (the raster_skeletonize oracle
    shape). Two measured DuckDB pitfalls shaped this spelling: an
    unrolled cascade of 32 per-level aggregate-join CTEs plans
    pathologically (>300 s), and non-MATERIALIZED helper CTEs are
    re-evaluated inside every recursion round (kids/nx must be
    MATERIALIZED). Child pointers live in eight FLAT per-direction slot
    arrays so each per-round lambda is pure scalar indexing — a
    list-of-child-lists state element measured ~100 s, this form ~10 s."""
    from etf_topox_spark.operators.raster_watershed import _D8

    nxt_x, nxt_y = _next_expr("sql")
    n = WS * WS
    # Eight FLAT child-slot arrays (child pid or -1 per D8 direction,
    # precomputed once outside the recursion) keep every per-round lambda
    # a pure scalar index — no per-cell list allocation (the first cut
    # used a list-of-child-lists state element and measured ~100 s; this
    # spelling is the raster_skeletonize shape).
    vks = [
        f"(CASE WHEN kids.k{j}[i + 1] >= 0"
        f" THEN ords[kids.k{j}[i + 1] + 1] ELSE 0 END)"
        for j in range(8)
    ]
    m1s = f"list_transform(range({n}), i -> GREATEST({', '.join(vks)}))"
    cnt = " + ".join(
        f"(CASE WHEN {vk} = m1s[i + 1] THEN 1 ELSE 0 END)" for vk in vks
    )
    step = (
        f"list_transform(range({n}), i -> "
        f"CASE WHEN m1s[i + 1] = 0 THEN 1 ELSE m1s[i + 1]"
        f" + CASE WHEN ({cnt}) >= 2 THEN 1 ELSE 0 END END)"
    )
    kid_cols = ",\n    ".join(
        f"list(CASE WHEN n{j}.nxt = c.pid THEN n{j}.pid ELSE -1 END"
        f" ORDER BY c.pid) AS k{j}"
        for j in range(8)
    )
    kid_joins = "\n  ".join(
        f"LEFT JOIN nx n{j} ON c.gx + {dx} BETWEEN 0 AND {WS - 1}"
        f" AND c.gy + {dy} BETWEEN 0 AND {WS - 1}"
        f" AND n{j}.pid = (c.gy + {dy}) * {WS} + (c.gx + {dx})"
        for j, (dx, dy) in enumerate(_D8)
    )
    return f"""WITH RECURSIVE
xs AS (SELECT CAST(range AS BIGINT) AS gx FROM range({WS})),
ys AS (SELECT CAST(range AS BIGINT) AS gy FROM range({WS})),
cells AS (
  SELECT gx, gy, gy * {WS} + gx AS pid, {_h_sql('gx', 'gy')} AS h
  FROM xs CROSS JOIN ys
),
nxg AS (
  SELECT c.gx, c.gy, c.pid, ({nxt_y}) * {WS} + ({nxt_x}) AS nxt
  FROM (SELECT gx, gy, pid FROM cells) c(gx, gy, pid)
),
nx AS MATERIALIZED (SELECT pid, nxt FROM nxg),
kids AS MATERIALIZED (
  SELECT
    {kid_cols}
  FROM nxg c
  {kid_joins}
),
iter AS (
  SELECT 0 AS it, list_transform(range({n}), i -> 1) AS ords
  UNION ALL
  SELECT it + 1, {step}
  FROM (SELECT it, ords, {m1s} AS m1s FROM iter, kids WHERE it < {S_ROUNDS}) t,
       kids
),
fin AS (SELECT ords FROM iter WHERE it = {S_ROUNDS})
SELECT CAST((SELECT ords FROM fin)[i.range + 1] AS INT) AS strahler_order,
       COUNT(*) AS n_cells,
       CAST(SUM(i.range) AS BIGINT) AS sum_pid
FROM range({n}) i GROUP BY 1 ORDER BY strahler_order
"""


@query("raster_strahler_order", oracle=_strahler_sql())
def raster_strahler_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order cell census of the drainage forest's Strahler
    classification (module docstring): basin closure via pointer
    doubling, then a per-basin linear tree pass in the grouped kernel."""
    import numpy as np
    import pandas as pd

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
    basin = cur.join(lab, "pid")  # pid, nxt, h, root

    def kernel(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        # cells sorted by DESCENDING height are topologically ordered:
        # every child is strictly higher than its parent
        pdf = pdf.sort_values(["h", "pid"], ascending=[False, True])
        pids = pdf["pid"].to_numpy()
        nxts = pdf["nxt"].to_numpy()
        idx = {int(p): i for i, p in enumerate(pids)}
        top1 = np.zeros(len(pids), np.int64)  # max child order
        top2 = np.zeros(len(pids), np.int64)  # second max (with multiplicity)
        ords = np.zeros(len(pids), np.int64)
        for i, (p, nx) in enumerate(zip(pids, nxts)):
            o = 1 if top1[i] == 0 else int(max(top1[i], top2[i] + 1))
            ords[i] = o
            if nx != p:  # propagate to the downstream parent's top-2
                j = idx[int(nx)]
                if o > top1[j]:
                    top2[j] = top1[j]
                    top1[j] = o
                elif o > top2[j]:
                    top2[j] = o
        g = pd.DataFrame({"ord": ords, "pid": pids}).groupby("ord").agg(
            n_cells=("pid", "size"), sum_pid=("pid", "sum")
        ).reset_index()
        return g.rename(columns={"ord": "strahler_order"})

    return (
        basin.groupBy("root")
        .applyInPandas(kernel, "strahler_order long, n_cells long, sum_pid long")
        .groupBy("strahler_order")
        .agg(F.sum("n_cells").alias("n_cells"), F.sum("sum_pid").alias("sum_pid"))
        .select(
            F.col("strahler_order").cast("int").alias("strahler_order"),
            "n_cells",
            "sum_pid",
        )
        .orderBy("strahler_order")
    )
