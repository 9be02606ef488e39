"""Driver-contract surface for the topology engine (SURVEY.md §2.A R6-R14).

Two kinds of entries:
- `topology_boundary_stats` — the duplicate/overlap/boundary-classification
  stage (R8/R12) over the dup_boundary fixture, with a FULL DuckDB oracle:
  the same mosaic's directed edges are generated in SQL and classified by
  the same undirected-count rules, so the driver value-hash checks the
  edge-hash shuffle semantics end to end.
- `topology_errors_*` — the complete error pipeline per defect fixture.
  Every fixture now carries a full DuckDB oracle that RE-DERIVES the error
  rows in SQL (undirected-count rules, shoelace orientation, cross-product
  segment crossing, recursive-CTE connected components) — no hard-coded
  goldens. The per-edge exact checks additionally live in
  tests/test_topology.py against the single-process numpy oracle.
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

# hole_defect: feature 27 (row 3, col 3) carries a CW interior ring with no
# filling surface. Its und keys have n=1 → EMPTY_INTERIOR anchored at the
# hole's min vertex; orientation (SQL shoelace) and boundary branches are
# included and provably empty for this fixture.
_HOLE_FID = min(_ROWS * _COLS - 1, 3 * _COLS + 3)
_HOLE_DEFECT_SQL = f"""
WITH feat AS ({_GRID_FEAT}),
square_edges AS (SELECT fid, 0 AS ring_idx, * EXCLUDE (fid) FROM ({_SQUARE_EDGES})),
hole AS (
  SELECT {_HOLE_FID} AS fid, 1 AS ring_idx,
         CASE i WHEN 0 THEN x0 + 0.25 WHEN 1 THEN x0 + 0.25 WHEN 2 THEN x0 + 0.75 ELSE x0 + 0.75 END AS x1,
         CASE i WHEN 0 THEN y0 + 0.25 WHEN 1 THEN y0 + 0.75 WHEN 2 THEN y0 + 0.75 ELSE y0 + 0.25 END AS y1,
         CASE i WHEN 0 THEN x0 + 0.25 WHEN 1 THEN x0 + 0.75 WHEN 2 THEN x0 + 0.75 ELSE x0 + 0.25 END AS x2,
         CASE i WHEN 0 THEN y0 + 0.75 WHEN 1 THEN y0 + 0.75 WHEN 2 THEN y0 + 0.25 ELSE y0 + 0.25 END AS y2
  FROM feat, (SELECT unnest([0, 1, 2, 3]) AS i) WHERE fid = {_HOLE_FID}
),
edges AS (SELECT * FROM square_edges UNION ALL SELECT * FROM hole),
{_BOUNDARY_ERRORS_FROM_EDGES},
ring_area AS (
  SELECT fid, ring_idx, SUM(x1 * y2 - x2 * y1) AS area2,
         MIN(LEAST(x1, x2)) AS rmin_x, MIN(LEAST(y1, y2)) AS rmin_y
  FROM edges GROUP BY 1, 2
),
orient AS (
  SELECT 'RING_ORIENTATION' AS error_code, rmin_x AS x, rmin_y AS y
  FROM ring_area
  WHERE (ring_idx = 0 AND area2 <= 0) OR (ring_idx > 0 AND area2 >= 0)
),
hole_und AS (
  SELECT h.fid, h.ring_idx, u.n
  FROM hole h JOIN und u
    ON LEAST(h.x1, h.x2) = u.ax AND GREATEST(h.x1, h.x2) = u.bx
   AND CASE WHEN h.x1 < h.x2 OR (h.x1 = h.x2 AND h.y1 <= h.y2) THEN h.y1 ELSE h.y2 END = u.ay
   AND CASE WHEN h.x1 < h.x2 OR (h.x1 = h.x2 AND h.y1 <= h.y2) THEN h.y2 ELSE h.y1 END = u.by
),
empty_int AS (
  SELECT 'EMPTY_INTERIOR' AS error_code, r.rmin_x AS x, r.rmin_y AS y
  FROM (SELECT fid, ring_idx, MAX(n) AS max_n FROM hole_und GROUP BY 1, 2) e
  JOIN ring_area r ON r.fid = e.fid AND r.ring_idx = e.ring_idx
  WHERE e.max_n = 1
),
all_errors AS (
  SELECT * FROM errors UNION ALL SELECT * FROM orient UNION ALL SELECT * FROM empty_int
)
SELECT 'theme0' AS theme, error_code, COUNT(*) AS n,
       MIN(x) AS min_x, MIN(y) AS min_y
FROM all_errors GROUP BY 1, 2 ORDER BY 1, 2
"""

# proper segment crossing (interiors intersect at one point): strict
# opposite-side tests via cross products, intersection point from the
# standard parametric formula — exact for these half-integer fixtures.
_CROSS_PAIRS = """
cross_pairs AS (
  SELECT a.fid AS fa, b.fid AS fb, a.ring_idx AS ra, b.ring_idx AS rb,
         a.x1 + ((b.x1 - a.x1) * (b.y2 - b.y1) - (b.y1 - a.y1) * (b.x2 - b.x1))
              / ((a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1))
              * (a.x2 - a.x1) AS px,
         a.y1 + ((b.x1 - a.x1) * (b.y2 - b.y1) - (b.y1 - a.y1) * (b.x2 - b.x1))
              / ((a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1))
              * (a.y2 - a.y1) AS py
  FROM ids a JOIN ids b ON a.id < b.id
  WHERE ((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1))
      * ((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0
    AND ((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1))
      * ((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0
)
"""

# self_intersect: feature 0 is a bowtie — proper self-cross at the square
# center (RING_SELF_INTERSECTION), degenerate shoelace area
# (RING_ORIENTATION), and its (1,1)→(1,0) edge runs the SAME direction as
# the right neighbor's left edge (OVERLAPPING_BOUNDARY).
_SELF_INTERSECT_BODY = f"""
WITH feat AS ({_GRID_FEAT}),
base_edges AS ({_SQUARE_EDGES}),
bow AS (
  SELECT 0 AS fid,
         CASE i WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN 1.0 ELSE 0.0 END AS x1,
         CASE i WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN 0.0 ELSE 1.0 END AS y1,
         CASE i WHEN 0 THEN 1.0 WHEN 1 THEN 1.0 WHEN 2 THEN 0.0 ELSE 0.0 END AS x2,
         CASE i WHEN 0 THEN 1.0 WHEN 1 THEN 0.0 WHEN 2 THEN 1.0 ELSE 0.0 END AS y2
  FROM (SELECT unnest([0, 1, 2, 3]) AS i)
),
edges AS (
  SELECT * FROM base_edges WHERE fid <> 0
  UNION ALL SELECT * FROM bow
),
{_BOUNDARY_ERRORS_FROM_EDGES},
ring_area AS (
  SELECT fid, SUM(x1 * y2 - x2 * y1) AS area2,
         MIN(LEAST(x1, x2)) AS rmin_x, MIN(LEAST(y1, y2)) AS rmin_y
  FROM edges GROUP BY 1
),
orient AS (
  SELECT 'RING_ORIENTATION' AS error_code, rmin_x AS x, rmin_y AS y
  FROM ring_area WHERE area2 <= 0
),
ids AS (SELECT ROW_NUMBER() OVER (ORDER BY fid, x1, y1, x2, y2) AS id,
        0 AS ring_idx, * FROM edges),
{_CROSS_PAIRS},
self_x AS (
  SELECT CASE WHEN fa = fb THEN 'RING_SELF_INTERSECTION'
              ELSE 'EDGE_INTERSECTION' END AS error_code, px AS x, py AS y
  FROM cross_pairs
),
all_errors AS (
  SELECT * FROM errors UNION ALL SELECT * FROM orient UNION ALL SELECT * FROM self_x
)
"""

_SELF_INTERSECT_SQL = f"""{_SELF_INTERSECT_BODY}
SELECT 'theme0' AS theme, error_code, COUNT(*) AS n,
       MIN(x) AS min_x, MIN(y) AS min_y
FROM all_errors GROUP BY 1, 2 ORDER BY 1, 2
"""

# A8 histogram over the same fixture: share = n / per-theme total (one
# int/int float64 division — bit-identical to pandas' counts/counts.sum())
ERROR_HISTOGRAM_SQL = f"""{_SELF_INTERSECT_BODY}
SELECT 'theme0' AS theme, error_code, COUNT(*) AS n,
       CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
FROM all_errors GROUP BY 1, 2 ORDER BY 1, 2
"""

# overlap_partial: a unit square at (1.5, 1.5) — each of its 4 edges
# properly crosses one interior grid line, and each crossing involves the
# TWO directed grid edges sharing that und key → 8 EDGE_INTERSECTION rows.
# The square also shares NO und key with the grid (it only crosses), so the
# shared-edge component graph leaves it stray → 1 FREE_STANDING_SURFACE.
_OVERLAP_PARTIAL_SQL = f"""
WITH RECURSIVE feat AS (
  {_GRID_FEAT}
  UNION ALL SELECT {_ROWS * _COLS}, 1.5, 1.5
),
edges AS ({_SQUARE_EDGES}),
{_BOUNDARY_ERRORS_FROM_EDGES},
ids AS (SELECT ROW_NUMBER() OVER (ORDER BY fid, x1, y1, x2, y2) AS id,
        0 AS ring_idx, * FROM edges),
{_CROSS_PAIRS},
cross_err AS (
  SELECT CASE WHEN fa = fb THEN 'RING_SELF_INTERSECTION'
              ELSE 'EDGE_INTERSECTION' END AS error_code, px AS x, py AS y
  FROM cross_pairs
),
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
stray_err AS (
  SELECT 'FREE_STANDING_SURFACE' AS error_code, f.x0 AS x, f.y0 AS y
  FROM labels l JOIN feat f ON f.fid = l.node
  WHERE l.root <> (SELECT root FROM main)
),
all_errors AS (
  SELECT * FROM errors UNION ALL SELECT * FROM cross_err
  UNION ALL SELECT * FROM stray_err
)
SELECT 'theme0' AS theme, error_code, COUNT(*) AS n,
       MIN(x) AS min_x, MIN(y) AS min_y
FROM all_errors GROUP BY 1, 2 ORDER BY 1, 2
"""

_ERROR_ORACLES = {
    "dup_boundary": _DUP_BOUNDARY_SQL,
    "zero_edge": _ZERO_EDGE_SQL,
    "free_standing": _FREE_STANDING_SQL,
    "hole_defect": _HOLE_DEFECT_SQL,
    "self_intersect": _SELF_INTERSECT_SQL,
    "overlap_partial": _OVERLAP_PARTIAL_SQL,
}

for _d in ("dup_boundary", "overlap_partial", "self_intersect",
           "free_standing", "hole_defect", "zero_edge"):
    query(f"topology_errors_{_d}", oracle=_ERROR_ORACLES.get(_d))(_errors_query(_d))


# --- R7: per-node CCW half-edge cycles -----------------------------------
# Oracle re-derives the whole structure in SQL over the self_intersect
# mosaic (the bowtie contributes diagonal directions, so the angular
# comparator is exercised beyond the four axis directions): distinct
# undirected edges → two half-edges each → diamond pseudo-angle (identical
# IEEE formula to operators.topology.node_edge_cycles) → windowed position,
# degree and wrapped CCW successor.
_NODE_CYCLES_SQL = f"""
WITH feat AS ({_GRID_FEAT}),
vert AS (
  SELECT fid, i,
    CASE WHEN fid = 0 THEN CAST(CASE i WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 0 END AS DOUBLE)
         ELSE CASE i WHEN 0 THEN x0 WHEN 1 THEN x0 + 1 WHEN 2 THEN x0 + 1 ELSE x0 END END AS vx,
    CASE WHEN fid = 0 THEN CAST(CASE i WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 0 ELSE 1 END AS DOUBLE)
         ELSE CASE i WHEN 0 THEN y0 WHEN 1 THEN y0 WHEN 2 THEN y0 + 1 ELSE y0 + 1 END END AS vy
  FROM feat, (SELECT unnest([0, 1, 2, 3]) AS i)
),
edges AS (
  SELECT a.fid, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
  FROM vert a JOIN vert b ON a.fid = b.fid AND b.i = (a.i + 1) % 4
),
und AS (
  SELECT DISTINCT
    LEAST(x1, x2) AS ax,
    CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y1 ELSE y2 END AS ay,
    GREATEST(x1, x2) AS bx,
    CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y2 ELSE y1 END AS by
  FROM edges WHERE NOT (x1 = x2 AND y1 = y2)
),
half AS (
  SELECT ax AS node_x, ay AS node_y, bx AS nbr_x, by AS nbr_y FROM und
  UNION ALL
  SELECT bx, by, ax, ay FROM und
),
ang AS (
  SELECT *,
    CASE WHEN (nbr_x - node_x) >= 0
         THEN (nbr_y - node_y) / (abs(nbr_x - node_x) + abs(nbr_y - node_y))
         ELSE 2 - (nbr_y - node_y) / (abs(nbr_x - node_x) + abs(nbr_y - node_y))
    END AS a0
  FROM half
),
cyc AS (
  SELECT node_x, node_y, nbr_x, nbr_y,
    CASE WHEN a0 < 0 THEN a0 + 4 ELSE a0 END AS a
  FROM ang
)
SELECT 'theme0' AS theme, node_x, node_y,
  CAST(ROW_NUMBER() OVER w - 1 AS INT) AS pos,
  CAST(COUNT(*) OVER (PARTITION BY node_x, node_y) AS BIGINT) AS degree,
  nbr_x, nbr_y,
  COALESCE(LEAD(nbr_x) OVER w, FIRST_VALUE(nbr_x) OVER w_full) AS nxt_x,
  COALESCE(LEAD(nbr_y) OVER w, FIRST_VALUE(nbr_y) OVER w_full) AS nxt_y
FROM cyc
WINDOW w AS (PARTITION BY node_x, node_y ORDER BY a, nbr_x, nbr_y),
  w_full AS (PARTITION BY node_x, node_y ORDER BY a, nbr_x, nbr_y
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY node_x, node_y, pos
"""


@query("topology_node_cycles", oracle=_NODE_CYCLES_SQL)
def topology_node_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etf_topox_spark.operators.topology import node_edge_cycles

    rings = surface_mosaic(spark, rows=_ROWS, cols=_COLS, defect="self_intersect")
    return node_edge_cycles(rings_to_edges(rings)).orderBy("node_x", "node_y", "pos")


# --- R7 faces: DCEL traversal over the angular cycles --------------------
# Oracle re-derives the whole face structure on the VALID 8x8 mosaic:
# distinct undirected edges → half-edges → diamond pseudo-angle cycles →
# successor = the cycle row at b whose CCW-successor is the back-direction
# (b→a) → recursive walk along successors carrying the min rank → per-face
# edge counts. The rank (ROW_NUMBER over (ax,ay,bx,by)) is internal to the
# ORACLE only; its min maps back to the lexicographically-least half-edge's
# COORDINATES, which is exactly the engine's distributed face id (the
# engine itself carries no global rank — packed endpoint-hash pairs are the
# half-edge identity). 64 unit faces of 4 edges + the outer face of 32;
# Euler's V−E+F = 2 pinned in tests/test_topology.py.
_FACES_SQL = f"""
WITH RECURSIVE feat AS ({_GRID_FEAT}),
edges AS ({_SQUARE_EDGES}),
und AS (
  SELECT DISTINCT
    LEAST(x1, x2) AS ax,
    CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y1 ELSE y2 END AS ay,
    GREATEST(x1, x2) AS bx,
    CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y2 ELSE y1 END AS by
  FROM edges WHERE NOT (x1 = x2 AND y1 = y2)
),
half0 AS (
  SELECT ax, ay, bx, by FROM und
  UNION ALL
  SELECT bx, by, ax, ay FROM und
),
he AS (
  SELECT ax, ay, bx, by,
         ROW_NUMBER() OVER (ORDER BY ax, ay, bx, by) AS he_id
  FROM half0
),
ang AS (
  SELECT ax AS node_x, ay AS node_y, bx AS nbr_x, by AS nbr_y,
    CASE WHEN (bx - ax) >= 0
         THEN (by - ay) / (abs(bx - ax) + abs(by - ay))
         ELSE 2 - (by - ay) / (abs(bx - ax) + abs(by - ay))
    END AS a0
  FROM half0
),
cyc AS (
  SELECT node_x, node_y, nbr_x, nbr_y,
    COALESCE(LEAD(nbr_x) OVER w, FIRST_VALUE(nbr_x) OVER w_full) AS nxt_x,
    COALESCE(LEAD(nbr_y) OVER w, FIRST_VALUE(nbr_y) OVER w_full) AS nxt_y
  FROM (SELECT node_x, node_y, nbr_x, nbr_y,
               CASE WHEN a0 < 0 THEN a0 + 4 ELSE a0 END AS a FROM ang)
  WINDOW w AS (PARTITION BY node_x, node_y ORDER BY a, nbr_x, nbr_y),
    w_full AS (PARTITION BY node_x, node_y ORDER BY a, nbr_x, nbr_y
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
nextmap AS (
  SELECT h.he_id, h2.he_id AS next_id
  FROM he h
  JOIN cyc c ON c.node_x = h.bx AND c.node_y = h.by
            AND c.nxt_x = h.ax AND c.nxt_y = h.ay
  JOIN he h2 ON h2.ax = c.node_x AND h2.ay = c.node_y
            AND h2.bx = c.nbr_x AND h2.by = c.nbr_y
),
walk(start_he, cur_he, mn) AS (
  SELECT he_id, next_id, LEAST(he_id, next_id) FROM nextmap
  UNION ALL
  SELECT w.start_he, nm.next_id, LEAST(w.mn, nm.next_id)
  FROM walk w JOIN nextmap nm ON nm.he_id = w.cur_he
  WHERE w.cur_he <> w.start_he
),
labels AS (
  SELECT start_he, mn AS face_id FROM walk WHERE cur_he = start_he
),
faces AS (
  SELECT face_id, COUNT(*) AS n_edges FROM labels GROUP BY 1
)
SELECT 'theme0' AS theme, h.ax AS face_ax, h.ay AS face_ay,
       h.bx AS face_bx, h.by AS face_by, f.n_edges
FROM faces f JOIN he h ON h.he_id = f.face_id
ORDER BY face_ax, face_ay, face_bx, face_by
"""


@query("topology_faces", oracle=_FACES_SQL)
def topology_faces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etf_topox_spark.operators.topology import face_cycles

    rings = surface_mosaic(spark, rows=_ROWS, cols=_COLS, defect="valid_mosaic")
    return face_cycles(rings_to_edges(rings)).orderBy(
        "face_ax", "face_ay", "face_bx", "face_by"
    )


# --- R3 proper: GML posList text ingestion -------------------------------
# The dup_boundary mosaic serializes to gml:Surface text (round-trip-exact
# double formatting) and re-enters through the Catalyst posList parser;
# the full validation pipeline must then reproduce the defect set
# bit-for-bit, so the existing derivational dup_boundary oracle doubles as
# the text-ingest parity check.
@query("topology_gml_roundtrip", oracle=_ERROR_ORACLES["dup_boundary"])
def topology_gml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etf_topox_spark.sources.gml import gml_to_rings, rings_to_gml

    rings = surface_mosaic(spark, rows=_ROWS, cols=_COLS, defect="dup_boundary")
    reparsed = gml_to_rings(rings_to_gml(rings))
    return (
        validate_topology(spark, reparsed)
        .groupBy("theme", "error_code")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.min("y").alias("min_y"),
        )
        .orderBy("theme", "error_code")
    )


# The WKB twin of the GML roundtrip: the dup_boundary mosaic serializes to
# WKB Polygon blobs (raw IEEE 754 — bit-exact by construction, no text
# formatting) and re-enters through the mapInPandas WKB parser; the full
# validation pipeline must reproduce the defect set bit-for-bit. Closes the
# geo-interchange input gap (VERDICT r3 "What's missing" #6): a user with
# PostGIS/GeoParquet WKB parquet can now feed the topology path directly.
@query("topology_wkb_roundtrip", oracle=_ERROR_ORACLES["dup_boundary"])
def topology_wkb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etf_topox_spark.sources.wkb import rings_to_wkb, wkb_to_rings

    rings = surface_mosaic(spark, rows=_ROWS, cols=_COLS, defect="dup_boundary")
    reparsed = wkb_to_rings(rings_to_wkb(rings))
    return (
        validate_topology(spark, reparsed)
        .groupBy("theme", "error_code")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.min("y").alias("min_y"),
        )
        .orderBy("theme", "error_code")
    )


# --- R9 twin: the zero-Python Catalyst intersection path -----------------
# intersection_errors_sql is the engine's cross-engine validation twin of
# the grouped Arrow kernel (operators/topology.py — same snap grid, cell
# cover, owner-corner dedup, int64 sign tests); pytest pins arrow ≡ sql
# bit-equal per defect/cell-size. This entry exposes the Catalyst path to
# the DRIVER's DuckDB comparison too, over the overlap_partial mosaic
# (8 proper crossings from the stray square at (1.5, 1.5), the richest
# intersection set of the fixture family). Oracle = the cross-pair
# derivation shared with _OVERLAP_PARTIAL_SQL, intersection family only.
_INTERSECT_CATALYST_SQL = f"""
WITH feat AS (
  {_GRID_FEAT}
  UNION ALL SELECT {_ROWS * _COLS}, 1.5, 1.5
),
edges AS ({_SQUARE_EDGES}),
ids AS (SELECT ROW_NUMBER() OVER (ORDER BY fid, x1, y1, x2, y2) AS id,
        0 AS ring_idx, * FROM edges),
{_CROSS_PAIRS}
SELECT 'theme0' AS theme,
       CASE WHEN fa = fb THEN 'RING_SELF_INTERSECTION'
            ELSE 'EDGE_INTERSECTION' END AS error_code,
       COUNT(*) AS n, MIN(px) AS min_x, MIN(py) AS min_y
FROM cross_pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("topology_intersections_catalyst", oracle=_INTERSECT_CATALYST_SQL)
def topology_intersections_catalyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etf_topox_spark.operators.topology import intersection_errors_sql

    rings = surface_mosaic(spark, rows=_ROWS, cols=_COLS, defect="overlap_partial")
    edges = rings_to_edges(rings).filter(F.col("h1") != F.col("h2"))
    return (
        intersection_errors_sql(edges, themes=["theme0"])
        .groupBy("theme", "error_code")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.min("y").alias("min_y"),
        )
        .orderBy("theme", "error_code")
    )
