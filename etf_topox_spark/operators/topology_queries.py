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


# --- DuckDB oracles for the SQL-expressible defect pipelines -------------
# Each derives the engine's error rows from first principles in SQL
# (mirroring operators.topology rules), NOT from hard-coded goldens. The
# geometry-kernel fixtures (self_intersect, overlap_partial, hole_defect)
# stay rows-only for the driver; their exact checks are the numpy oracle in
# tests/test_topology.py.

_GRID_FEAT = f"""
  SELECT r.range * {_COLS} + c.range AS fid,
         CAST(c.range AS DOUBLE) AS x0, CAST(r.range AS DOUBLE) AS y0
  FROM range(0, {_ROWS}) r, range(0, {_COLS}) c
"""

_SQUARE_EDGES = """
  SELECT fid,
         CASE i WHEN 0 THEN x0     WHEN 1 THEN x0 + 1 WHEN 2 THEN x0 + 1 ELSE x0     END AS x1,
         CASE i WHEN 0 THEN y0     WHEN 1 THEN y0     WHEN 2 THEN y0 + 1 ELSE y0 + 1 END AS y1,
         CASE i WHEN 0 THEN x0 + 1 WHEN 1 THEN x0 + 1 WHEN 2 THEN x0     ELSE x0     END AS x2,
         CASE i WHEN 0 THEN y0     WHEN 1 THEN y0 + 1 WHEN 2 THEN y0 + 1 ELSE y0     END AS y2
  FROM feat, (SELECT unnest([0, 1, 2, 3]) AS i)
"""

# engine rule mirror (operators/topology.py boundary_errors): und key =
# lexicographic-min endpoint first (same order as the coordinate-hash
# packing); n>2 → DUPLICATE_BOUNDARY; n=2 with both directions equal →
# OVERLAPPING_BOUNDARY. Anchor = min midpoint per group.
_BOUNDARY_ERRORS_FROM_EDGES = """
und AS (
  SELECT LEAST(x1, x2) AS ax,
         CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y1 ELSE y2 END AS ay,
         GREATEST(x1, x2) AS bx,
         CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y2 ELSE y1 END AS by,
         COUNT(*) AS n,
         COUNT(*) FILTER (WHERE x1 < x2 OR (x1 = x2 AND y1 <= y2)) AS n_fwd,
         MIN((x1 + x2) / 2) AS mid_x,
         MIN((y1 + y2) / 2) AS mid_y
  FROM edges GROUP BY 1, 2, 3, 4
),
errors AS (
  SELECT 'DUPLICATE_BOUNDARY' AS error_code, mid_x AS x, mid_y AS y
  FROM und WHERE n > 2
  UNION ALL
  SELECT 'OVERLAPPING_BOUNDARY', mid_x, mid_y
  FROM und WHERE n = 2 AND (n_fwd = 2 OR n_fwd = 0)
)
"""

_ERRORS_AGG = """
SELECT 'theme0' AS theme, error_code, COUNT(*) AS n,
       MIN(x) AS min_x, MIN(y) AS min_y
FROM errors GROUP BY 1, 2 ORDER BY 1, 2
"""

_DUP_BOUNDARY_SQL = f"""
WITH feat AS (
  {_GRID_FEAT}
  UNION ALL SELECT {_ROWS * _COLS}, 2.0, 2.0
),
edges AS ({_SQUARE_EDGES}),
{_BOUNDARY_ERRORS_FROM_EDGES}
{_ERRORS_AGG}
"""

# zero_edge: feature 0 carries a consecutive duplicate vertex → one
# zero-length directed edge (INVALID_EDGE, engine filters it before und
# stats); remaining edges are a clean mosaic, so no boundary errors fire.
_ZERO_EDGE_SQL = f"""
WITH feat AS ({_GRID_FEAT}),
square_edges AS ({_SQUARE_EDGES}),
all_edges AS (
  SELECT * FROM square_edges
  UNION ALL SELECT 0, 0.0, 0.0, 0.0, 0.0
),
edges AS (
  SELECT * FROM all_edges WHERE NOT (x1 = x2 AND y1 = y2)
),
{_BOUNDARY_ERRORS_FROM_EDGES},
zero AS (
  SELECT 'INVALID_EDGE' AS error_code, x1 AS x, y1 AS y
  FROM all_edges WHERE x1 = x2 AND y1 = y2
),
all_errors AS (SELECT * FROM errors UNION ALL SELECT * FROM zero)
SELECT 'theme0' AS theme, error_code, COUNT(*) AS n,
       MIN(x) AS min_x, MIN(y) AS min_y
FROM all_errors GROUP BY 1, 2 ORDER BY 1, 2
"""

# free_standing: components of the shared-edge feature graph via a
# recursive reachability CTE (min reachable fid = component root, the same
# root rule as operators.topology.connected_components); every feature
# outside the largest component is FREE_STANDING_SURFACE anchored at its
# exterior ring's min vertex.
_FREE_STANDING_SQL = f"""
WITH RECURSIVE feat AS (
  {_GRID_FEAT}
  UNION ALL SELECT {_ROWS * _COLS}, 1000.0, 1000.0
),
edges AS ({_SQUARE_EDGES}),
und_feats AS (
  SELECT LEAST(x1, x2) AS ax,
         CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y1 ELSE y2 END AS ay,
         GREATEST(x1, x2) AS bx,
         CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y2 ELSE y1 END AS by,
         LIST(DISTINCT fid) AS fids
  FROM edges GROUP BY 1, 2, 3, 4 HAVING COUNT(DISTINCT fid) >= 2
),
pairs AS (
  SELECT u.fids[CAST(1 + (i.range // len(u.fids)) AS BIGINT)] AS src,
         u.fids[CAST(1 + (i.range % len(u.fids)) AS BIGINT)] AS dst
  FROM und_feats u, range(0, 100) i
  WHERE i.range < len(u.fids) * len(u.fids)
    AND (i.range // len(u.fids)) <> (i.range % len(u.fids))
),
walk(node, lbl) AS (
  SELECT fid, fid FROM feat
  UNION
  SELECT p.dst, w.lbl FROM walk w JOIN pairs p ON p.src = w.node
),
labels AS (SELECT node, MIN(lbl) AS root FROM walk GROUP BY node),
sizes AS (SELECT root, COUNT(*) AS sz FROM labels GROUP BY root),
main AS (SELECT root FROM sizes ORDER BY sz DESC, root LIMIT 1),
stray AS (
  SELECT l.node FROM labels l WHERE l.root <> (SELECT root FROM main)
),
errors AS (
  SELECT 'FREE_STANDING_SURFACE' AS error_code, f.x0 AS x, f.y0 AS y
  FROM stray s JOIN feat f ON f.fid = s.node
)
{_ERRORS_AGG}
"""

_ERROR_ORACLES = {
    "dup_boundary": _DUP_BOUNDARY_SQL,
    "zero_edge": _ZERO_EDGE_SQL,
    "free_standing": _FREE_STANDING_SQL,
}

for _d in ("dup_boundary", "overlap_partial", "self_intersect",
           "free_standing", "hole_defect", "zero_edge"):
    query(f"topology_errors_{_d}", oracle=_ERROR_ORACLES.get(_d))(_errors_query(_d))
