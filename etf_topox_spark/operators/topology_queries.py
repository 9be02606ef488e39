"""Driver-contract surface for the topology engine (SURVEY.md §2.A R6-R14).

Two kinds of entries:
- `topology_boundary_stats` — the duplicate/overlap/boundary-classification
  stage (R8/R12) over the dup_boundary fixture, with a FULL DuckDB oracle:
  the same mosaic's directed edges are generated in SQL and classified by
  the same undirected-count rules, so the driver value-hash checks the
  edge-hash shuffle semantics end to end.
- `topology_errors_*` — the complete error pipeline per defect fixture
  (rows-only for the driver; the exact checks live in tests/test_topology.py
  against the single-process numpy oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.topology import (
    classify_boundaries,
    rings_to_edges,
    undirected_edge_stats,
    validate_topology,
)
from etf_topox_spark.registry import query
from etf_topox_spark.sources.mosaic import surface_mosaic

_ROWS, _COLS = 8, 8

# DuckDB twin of sources.mosaic for defect="dup_boundary": an 8×8 unit grid
# plus a duplicate of square (2,2); edges via 4-way unnest; classification by
# undirected-key counts — mirrors operators.topology.classify_boundaries.
_BOUNDARY_STATS_SQL = f"""
WITH params AS (SELECT {_ROWS} AS R, {_COLS} AS C),
feat AS (
  SELECT r.range * (SELECT C FROM params) + c.range AS fid,
         CAST(c.range AS DOUBLE) AS x0, CAST(r.range AS DOUBLE) AS y0
  FROM range(0, {_ROWS}) r, range(0, {_COLS}) c
  UNION ALL
  SELECT {_ROWS * _COLS}, 2.0, 2.0
),
edges AS (
  SELECT fid,
         CASE i WHEN 0 THEN x0     WHEN 1 THEN x0 + 1 WHEN 2 THEN x0 + 1 ELSE x0     END AS x1,
         CASE i WHEN 0 THEN y0     WHEN 1 THEN y0     WHEN 2 THEN y0 + 1 ELSE y0 + 1 END AS y1,
         CASE i WHEN 0 THEN x0 + 1 WHEN 1 THEN x0 + 1 WHEN 2 THEN x0     ELSE x0     END AS x2,
         CASE i WHEN 0 THEN y0     WHEN 1 THEN y0 + 1 WHEN 2 THEN y0 + 1 ELSE y0     END AS y2
  FROM feat, (SELECT unnest([0, 1, 2, 3]) AS i)
),
und AS (
  SELECT LEAST(x1, x2) AS ax, CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y1 ELSE y2 END AS ay,
         GREATEST(x1, x2) AS bx, CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y2 ELSE y1 END AS by,
         COUNT(*) AS n
  FROM edges GROUP BY 1, 2, 3, 4
)
SELECT CASE WHEN n = 1 THEN 'boundary' WHEN n = 2 THEN 'interior'
            ELSE 'invalid' END AS edge_class,
       COUNT(*) AS n_edges
FROM und GROUP BY 1 ORDER BY 1
"""


@query("topology_boundary_stats", oracle=_BOUNDARY_STATS_SQL)
def topology_boundary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    rings = surface_mosaic(spark, rows=_ROWS, cols=_COLS, defect="dup_boundary")
    edges = rings_to_edges(rings)
    stats = undirected_edge_stats(edges)
    return (
        classify_boundaries(stats)
        .groupBy("edge_class")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .orderBy("edge_class")
    )


def _errors_query(defect: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        rings = surface_mosaic(spark, rows=_ROWS, cols=_COLS, defect=defect)
        return (
            validate_topology(spark, rings)
            .groupBy("theme", "error_code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("x").alias("min_x"),
                F.min("y").alias("min_y"),
            )
            .orderBy("theme", "error_code")
        )

    return run


for _d in ("dup_boundary", "overlap_partial", "self_intersect",
           "free_standing", "hole_defect", "zero_edge"):
    query(f"topology_errors_{_d}")(_errors_query(_d))
