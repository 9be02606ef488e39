"""Quadtree cell-cover compaction (the H3 ``compactCells`` / S2
``S2CellUnion.Normalize`` primitive) over the observation-point cover
(SURVEY.md §2.B F9 cell-index family; functions/cells.py backend).

The occupied res-7 cells of the point corpus (quad cells: 2^r x 2^r over
the 20x20-degree window, point coords recovered to exact integer
micro-degrees) are compacted bottom-up: whenever all 4 children of a
parent are present the parent replaces them, recursively to res 0. The
result is the minimal multi-resolution cover — the representation every
cell-indexed geofence/coverage service stores instead of raw finest-res
sets.

Scale shape: ONE distinct exchange reduces 10^12 points to <= 4^R cover
cells; each of the R compaction levels is a partial-aggregable
count-of-children groupBy on a table that SHRINKS 4x per level, plus an
anti-join of equally tiny frames — the cascade's total exchange volume is
a constant multiple of the finest cover. The pytest expands the compacted
cover back and asserts exact set identity with the occupied cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.points import points_sql, synthetic_points

N_COMPACT = 60_000
RES = 6
MICRO = 20_000_000
# keep 2 of every 3 two-degree blocks: the dropped blocks punch holes the
# quadtree cells (0.3125 deg) do NOT align with, so the compacted cover
# genuinely mixes resolutions — full block interiors collapse toward res
# 2-4 while hole boundaries stay fine-grained
BLOCK = 2_000_000


def _compact_sql() -> str:
    parts = [
        f"""pts AS ({points_sql(N_COMPACT)}),
mi AS (
  SELECT CAST(ROUND(x * 1000000) AS BIGINT) AS mx,
         CAST(ROUND(y * 1000000) AS BIGINT) AS my
  FROM pts
),
occ{RES} AS (
  SELECT DISTINCT (mx * {1 << RES}) // {MICRO} AS cx,
                  (my * {1 << RES}) // {MICRO} AS cy
  FROM mi WHERE (mx // {BLOCK} + my // {BLOCK}) % 3 <> 0
)"""
    ]
    prev = f"occ{RES}"
    for r in range(RES - 1, -1, -1):
        parts.append(
            f"f{r} AS (SELECT cx // 2 AS cx, cy // 2 AS cy FROM {prev} "
            f"GROUP BY 1, 2 HAVING COUNT(*) = 4)"
        )
        prev = f"f{r}"
    outs = [
        f"SELECT {RES} AS res, cx, cy FROM occ{RES} o WHERE NOT EXISTS "
        f"(SELECT 1 FROM f{RES - 1} p WHERE p.cx = o.cx // 2 AND p.cy = o.cy // 2)"
    ]
    for r in range(RES - 1, 0, -1):
        outs.append(
            f"SELECT {r} AS res, cx, cy FROM f{r} o WHERE NOT EXISTS "
            f"(SELECT 1 FROM f{r - 1} p WHERE p.cx = o.cx // 2 AND p.cy = o.cy // 2)"
        )
    outs.append("SELECT 0 AS res, cx, cy FROM f0")
    union = " UNION ALL ".join(outs)
    return (
        "WITH " + ",\n".join(parts) + f""",
cover AS ({union})
SELECT CAST(res AS INT) AS res, COUNT(*) AS n_cells,
       CAST(SUM(cx) AS BIGINT) AS sum_cx, CAST(SUM(cy) AS BIGINT) AS sum_cy
FROM cover GROUP BY res ORDER BY res
"""
    )


def compact_cover(spark: SparkSession) -> DataFrame:
    """The compacted multi-resolution cover frame (res, cx, cy) — shared
    by the census query and the expansion-identity pytest."""
    pts = synthetic_points(spark, N_COMPACT)
    occ = (
        pts.select(
            F.expr("CAST(ROUND(x * 1000000) AS BIGINT)").alias("mx"),
            F.expr("CAST(ROUND(y * 1000000) AS BIGINT)").alias("my"),
        )
        .filter(F.expr(f"(mx DIV {BLOCK} + my DIV {BLOCK}) % 3 != 0"))
        .select(
            F.expr(f"(mx * {1 << RES}) DIV {MICRO}").alias("cx"),
            F.expr(f"(my * {1 << RES}) DIV {MICRO}").alias("cy"),
        )
        .distinct()
    )
    full = {RES: occ}
    for r in range(RES - 1, -1, -1):
        full[r] = (
            full[r + 1]
            .groupBy(
                F.expr("cx DIV 2").alias("cx"), F.expr("cy DIV 2").alias("cy")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == 4)
            .select("cx", "cy")
        )
    covers = []
    for r in range(RES, 0, -1):
        parents = full[r - 1].select(
            F.col("cx").alias("pcx"), F.col("cy").alias("pcy")
        )
        covers.append(
            full[r]
            .join(
                parents,
                (F.expr("cx DIV 2") == F.col("pcx"))
                & (F.expr("cy DIV 2") == F.col("pcy")),
                "left_anti",
            )
            .select(F.lit(r).cast("int").alias("res"), "cx", "cy")
        )
    covers.append(full[0].select(F.lit(0).cast("int").alias("res"), "cx", "cy"))
    out = covers[0]
    for c in covers[1:]:
        out = out.unionByName(c)
    return out


@query("cell_compact", oracle=_compact_sql())
def cell_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of the compacted cover per resolution: cell count and exact
    coordinate mass (module docstring)."""
    return (
        compact_cover(spark)
        .groupBy("res")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("cx").alias("sum_cx"),
            F.sum("cy").alias("sum_cy"),
        )
        .orderBy("res")
    )
