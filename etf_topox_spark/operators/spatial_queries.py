"""Driver-contract surface for the spatial joins — WITH exact DuckDB
oracles: the synthetic points regenerate bit-identically in SQL
(sources.points), the PIP oracle is the closed-form grid assignment with
the min-feature tie rule, and the kNN oracle is the brute-force cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.spatial import knn_join, pip_join
from etf_topox_spark.registry import query
from etf_topox_spark.sources.mosaic import surface_mosaic
from etf_topox_spark.sources.points import DIV, KX, KY, M, points_sql, synthetic_points

N_POINTS = 20000
N_PROBES = 200
PROBE_OFFSET = 1_000_000
GRID_N = 20  # 20×20 unit squares anchored at the origin
K = 5

# closed-form oracle: the containing unit square is (floor(x), floor(y));
# a point exactly on a grid line belongs to the min feature_id among its
# containers = the left/lower square (FIXTURES.md §3 tie rule)
_PIP_SQL = f"""
WITH pts AS ({points_sql(N_POINTS)})
SELECT point_id,
       CAST((CASE WHEN y = floor(y) AND y > 0 THEN y - 1 ELSE floor(y) END) * {GRID_N}
          + (CASE WHEN x = floor(x) AND x > 0 THEN x - 1 ELSE floor(x) END) AS BIGINT)
         AS feature_id
FROM pts
"""


@query("spatial_pip_join", oracle=_PIP_SQL)
def spatial_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    points = synthetic_points(spark, N_POINTS)
    rings = surface_mosaic(spark, rows=GRID_N, cols=GRID_N, defect="valid_mosaic")
    return pip_join(spark, points, rings)


_KNN_SQL = f"""
WITH corpus AS ({points_sql(N_POINTS)}),
probes AS ({points_sql(N_PROBES, PROBE_OFFSET)}),
d AS (
  SELECT p.point_id AS query_id, c.point_id AS neighbor_id,
         (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y) AS dist2
  FROM probes p CROSS JOIN corpus c
),
r AS (
  SELECT query_id, neighbor_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist2, neighbor_id) AS rn
  FROM d
)
SELECT query_id, neighbor_id, dist2, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= {K}
"""


@query("spatial_knn_join", oracle=_KNN_SQL)
def spatial_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    probes = synthetic_points(spark, N_PROBES, id_offset=PROBE_OFFSET)
    corpus = synthetic_points(spark, N_POINTS)
    return knn_join(spark, probes, corpus, k=K)


# --- grid-density clustering (DBSCAN-on-cells over the cell index) -----------

CLUSTER_EPS_MUL = 2.0  # cell side = 1/mul = 0.5 degrees
CLUSTER_MINPTS = 8
CELL_STRIDE = 64  # cell key = cx * CELL_STRIDE + cy; cy < 40 < stride
N_RIDGE = 2000
RIDGE_OFFSET = 2_000_000

# ridge fixture: a dense diagonal streak spanning ~20 adjacent cells (the
# base scatter alone is too uniform to form multi-cell clusters); exact
# doubles via the int-then-one-division rule (sources.points)
_RIDGE_SQL = f"""
    SELECT {RIDGE_OFFSET} + j AS point_id,
           1.0 + CAST(j * 5 AS DOUBLE) / 1000.0 AS x,
           4.0 + CAST(j * 25 AS DOUBLE) / 10000.0 AS y
    FROM (SELECT range AS j FROM range({N_RIDGE}))
"""

_CLUSTER_SQL = f"""
WITH RECURSIVE pts AS ({points_sql(N_POINTS)} UNION ALL {_RIDGE_SQL}),
cells AS (
  SELECT CAST(floor(x * {CLUSTER_EPS_MUL}) AS BIGINT) AS cx,
         CAST(floor(y * {CLUSTER_EPS_MUL}) AS BIGINT) AS cy
  FROM pts
),
dense AS (
  SELECT cx, cy, cx * {CELL_STRIDE} + cy AS key, COUNT(*) AS n
  FROM cells GROUP BY 1, 2 HAVING COUNT(*) >= {CLUSTER_MINPTS}
),
adj AS (
  SELECT a.key AS s, b.key AS d
  FROM dense a JOIN dense b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.key <> b.key
),
walk(node, lbl) AS (
  SELECT key, key FROM dense
  UNION
  SELECT p.d, w.lbl FROM walk w JOIN adj p ON p.s = w.node
),
labels AS (SELECT node, MIN(lbl) AS root FROM walk GROUP BY node)
SELECT l.root AS cluster_id, COUNT(*) AS n_cells, CAST(SUM(d.n) AS BIGINT) AS n_points
FROM labels l JOIN dense d ON d.key = l.node
GROUP BY 1 ORDER BY 1
"""


def _ridge_points(spark: SparkSession) -> DataFrame:
    j = F.col("id") - RIDGE_OFFSET
    return spark.range(RIDGE_OFFSET, RIDGE_OFFSET + N_RIDGE).select(
        F.col("id").alias("point_id"),
        (F.lit(1.0) + (j * 5).cast("double") / 1000.0).alias("x"),
        (F.lit(4.0) + (j * 25).cast("double") / 10000.0).alias("y"),
    )


@query("spatial_cluster_points", oracle=_CLUSTER_SQL)
def spatial_cluster_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering — DBSCAN's cell-grid variant over the
    engine's integer cell index: points hash into eps-cells, cells at or
    above MINPTS are core, and core cells merge across 8-neighbor
    adjacency into clusters via the shared connected-components machinery
    (cluster id = min cell key, the CC root rule). The fixture is the
    skewed point scatter (one hot cell) plus a dense diagonal ridge that
    snakes across ~20 adjacent cells — both multi-cell merge and
    singleton-core cases are exercised.

    Scale shape: ONE count-aggregate shuffle on the cell key (map-side
    partial); the dense-cell set is then tiny by construction (density
    threshold × bounded cell count), so adjacency is an 8-offset explode +
    broadcast hash join (never a theta join) and CC runs on the driver
    under DRIVER_CC_MAX_PAIRS. DBSCAN-exact point-level border handling
    would add one more broadcast join of points against core-cell
    neighborhoods — same exchange count. Full DuckDB oracle: recursive
    min-label reachability walk, the engine's root rule replayed
    symbolically."""
    from etf_topox_spark.operators.topology import connected_components

    pts = synthetic_points(spark, N_POINTS).unionByName(_ridge_points(spark))
    mul = F.lit(CLUSTER_EPS_MUL)
    dense = (
        pts.select(
            F.floor(F.col("x") * mul).cast("long").alias("cx"),
            F.floor(F.col("y") * mul).cast("long").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= CLUSTER_MINPTS)
        .withColumn("key", F.col("cx") * CELL_STRIDE + F.col("cy"))
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    nbr = dense.select(
        F.col("key").alias("s"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                    )
                    for dx, dy in offs
                ]
            )
        ).alias("o"),
    ).select("s", F.col("o.cx").alias("cx"), F.col("o.cy").alias("cy"))
    edges = nbr.join(
        F.broadcast(dense.select("cx", "cy", F.col("key").alias("d"))), ["cx", "cy"]
    ).filter(F.col("s") < F.col("d"))
    roots = connected_components(
        edges.select(F.col("s").alias("src"), F.col("d").alias("dst"))
    )
    labeled = dense.join(roots, dense.key == roots.node, "left").select(
        "key", "n", F.coalesce("root", F.col("key")).alias("root")
    )
    return (
        labeled.groupBy("root")
        .agg(F.count(F.lit(1)).alias("n_cells"), F.sum("n").alias("n_points"))
        .select(F.col("root").alias("cluster_id"), "n_cells", "n_points")
        .orderBy("cluster_id")
    )


# --- polygon scalar geometry (ST_Area / ST_Perimeter / ST_Centroid analog) ----

N_QUADS = 5000

# irregular-but-simple quads: a side-2 square anchored on the scatter
# lattice with each corner perturbed inside its own unit cell (so rings
# never self-intersect and stay CCW). Exact doubles: int mod then ONE
# division; the stat expressions below are written with IDENTICAL
# association order on both engines, so every +,-,*,/,sqrt is the same
# correctly-rounded IEEE op sequence → bit-equal results.
_QUAD_CORNERS = (
    # (corner, base dx, base dy, perturbation multipliers px, py)
    (0, 0.0, 0.0, 3571, 2857),
    (1, 2.0, 0.0, 6229, 4523),
    (2, 2.0, 2.0, 9341, 7919),
    (3, 0.0, 2.0, 5081, 8317),
)


def _quads_sql(n: int) -> str:
    cols = []
    for c, bx, by, px, py in _QUAD_CORNERS:
        cols.append(
            f"CAST((i * {KX}) % {M} AS DOUBLE) / {DIV} + {bx}"
            f" + CAST((i * {px}) % 1000 AS DOUBLE) / 1000.0 AS x{c}"
        )
        cols.append(
            f"CAST((i * {KY}) % {M} AS DOUBLE) / {DIV} + {by}"
            f" + CAST((i * {py}) % 1000 AS DOUBLE) / 1000.0 AS y{c}"
        )
    return (
        "SELECT i AS feature_id, "
        + ", ".join(cols)
        + f" FROM (SELECT range AS i FROM range({n}))"
    )


_POLY_STATS_SQL = f"""
WITH q AS ({_quads_sql(N_QUADS)}),
cr AS (
  SELECT feature_id, x0, y0, x1, y1, x2, y2, x3, y3,
         x0 * y1 - x1 * y0 AS c0, x1 * y2 - x2 * y1 AS c1,
         x2 * y3 - x3 * y2 AS c2, x3 * y0 - x0 * y3 AS c3
  FROM q
)
SELECT feature_id,
       (c0 + c1 + c2 + c3) / 2.0 AS area,
       sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))
     + sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
     + sqrt((x3 - x2) * (x3 - x2) + (y3 - y2) * (y3 - y2))
     + sqrt((x0 - x3) * (x0 - x3) + (y0 - y3) * (y0 - y3)) AS perimeter,
       ((x0 + x1) * c0 + (x1 + x2) * c1 + (x2 + x3) * c2 + (x3 + x0) * c3)
         / (3.0 * (c0 + c1 + c2 + c3)) AS centroid_x,
       ((y0 + y1) * c0 + (y1 + y2) * c1 + (y2 + y3) * c2 + (y3 + y0) * c3)
         / (3.0 * (c0 + c1 + c2 + c3)) AS centroid_y
FROM cr ORDER BY feature_id
"""


@query("geom_polygon_stats", oracle=_POLY_STATS_SQL)
def geom_polygon_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon scalar geometry — signed shoelace area, perimeter, and the
    area-weighted centroid (the ST_Area / ST_Perimeter / ST_Centroid
    family) over a synthetic corpus of irregular simple quads, computed
    entirely in Catalyst scalar expressions (whole-stage codegen; zero
    Python in the hot path, zero shuffles — a pure map over the ring
    table). The oracle evaluates the IDENTICAL expression tree in DuckDB:
    both engines run the same correctly-rounded IEEE op sequence, so
    doubles match bit-for-bit with no tolerance."""
    i = F.col("id")

    def ixd(mult: int, mod: int, div: float):
        return ((i * mult) % mod).cast("double") / div

    cols = [i.alias("feature_id")]
    for c, bx, by, px, py in _QUAD_CORNERS:
        cols.append((ixd(KX, M, DIV) + F.lit(bx) + ixd(px, 1000, 1000.0)).alias(f"x{c}"))
        cols.append((ixd(KY, M, DIV) + F.lit(by) + ixd(py, 1000, 1000.0)).alias(f"y{c}"))
    q = spark.range(0, N_QUADS).select(*cols)
    x = [F.col(f"x{c}") for c in range(4)]
    y = [F.col(f"y{c}") for c in range(4)]
    c_ = [x[k] * y[(k + 1) % 4] - x[(k + 1) % 4] * y[k] for k in range(4)]
    area2 = c_[0] + c_[1] + c_[2] + c_[3]

    def seg(k: int):
        a, b = k, (k + 1) % 4
        return F.sqrt((x[b] - x[a]) * (x[b] - x[a]) + (y[b] - y[a]) * (y[b] - y[a]))

    perimeter = seg(0) + seg(1) + seg(2) + seg(3)
    # left-assoc chains written explicitly (no 0.0 seed — it would flip the
    # sign of a -0.0 first term and drift from the oracle's bit pattern)
    cxt = [(x[k] + x[(k + 1) % 4]) * c_[k] for k in range(4)]
    cyt = [(y[k] + y[(k + 1) % 4]) * c_[k] for k in range(4)]
    cx = cxt[0] + cxt[1] + cxt[2] + cxt[3]
    cy = cyt[0] + cyt[1] + cyt[2] + cyt[3]
    return q.select(
        "feature_id",
        (area2 / 2.0).alias("area"),
        perimeter.alias("perimeter"),
        (cx / (F.lit(3.0) * area2)).alias("centroid_x"),
        (cy / (F.lit(3.0) * area2)).alias("centroid_y"),
    ).orderBy("feature_id")


# --- k-ring density smoothing (gridded KDE / heatmap surface) ----------------

_HEATMAP_SQL = f"""
WITH pts AS ({points_sql(N_POINTS)}),
counts AS (
  SELECT CAST(floor(x * {CLUSTER_EPS_MUL}) AS BIGINT) AS cx,
         CAST(floor(y * {CLUSTER_EPS_MUL}) AS BIGINT) AS cy,
         COUNT(*) AS n
  FROM pts GROUP BY 1, 2
)
SELECT a.cx, a.cy, ANY_VALUE(a.n) AS n, CAST(SUM(b.n) AS BIGINT) AS n_smooth
FROM counts a JOIN counts b
  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
GROUP BY a.cx, a.cy
ORDER BY a.cx, a.cy
"""


@query("spatial_heatmap_smooth", oracle=_HEATMAP_SQL)
def spatial_heatmap_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gridded density surface with 3×3 k-ring smoothing — the heatmap /
    KDE-on-cells op (each occupied cell reports its own point count and
    the uniform-kernel total over its 8-neighborhood). The box-kernel sum
    is exact integers, so engine and oracle agree bit-for-bit.

    Scale shape: ONE partial-aggregable count shuffle on the cell key
    reduces 10^12 points to ≤ #occupied-cells rows; the convolution is a
    9-offset explode + equi-join of that tiny cell table with itself (a
    broadcast at any realistic cell count — never a theta join, never a
    second pass over the points). Wider kernels are the same shape with
    (2r+1)² offsets; separable kernels would do two rank-1 passes."""
    pts = synthetic_points(spark, N_POINTS)
    mul = F.lit(CLUSTER_EPS_MUL)
    counts = (
        pts.select(
            F.floor(F.col("x") * mul).cast("long").alias("cx"),
            F.floor(F.col("y") * mul).cast("long").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    spread = counts.select(
        F.col("n").alias("nb_n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                    )
                    for dx, dy in offs
                ]
            )
        ).alias("o"),
    ).select(F.col("o.cx").alias("cx"), F.col("o.cy").alias("cy"), "nb_n")
    return (
        counts.join(spread, ["cx", "cy"])
        .groupBy("cx", "cy")
        .agg(F.first("n").alias("n"), F.sum("nb_n").alias("n_smooth"))
        .orderBy("cx", "cy")
    )


# --- ring simplification (collinear-vertex removal, ST_Simplify tol=0) -------

_SIMPLIFY_GRID = 8  # 8×8 unit squares, each edge densified into 4 subsegments
_SIMPLIFY_SUB = 4

# closed-form oracle: densified lattice squares simplify back to exactly
# their 4 corners + the closing repeat (interior points are exactly
# collinear — quarters are exact doubles, the cross product is exactly 0.0)
_SIMPLIFY_SQL = f"""
WITH feat AS (
  SELECT r.range * {_SIMPLIFY_GRID} + c.range AS feature_id,
         CAST(c.range AS DOUBLE) AS x0, CAST(r.range AS DOUBLE) AS y0
  FROM range(0, {_SIMPLIFY_GRID}) r, range(0, {_SIMPLIFY_GRID}) c
)
SELECT feature_id, CAST(i AS INTEGER) AS seq,
  CASE i WHEN 0 THEN x0 WHEN 1 THEN x0 + 1 WHEN 2 THEN x0 + 1 WHEN 3 THEN x0 ELSE x0 END AS x,
  CASE i WHEN 0 THEN y0 WHEN 1 THEN y0     WHEN 2 THEN y0 + 1 WHEN 3 THEN y0 + 1 ELSE y0 END AS y
FROM feat, (SELECT unnest([0, 1, 2, 3, 4]) AS i)
ORDER BY feature_id, seq
"""


@query("geom_simplify_collinear", oracle=_SIMPLIFY_SQL)
def geom_simplify_collinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collinear-vertex removal — ST_Simplify at tolerance 0 (the lossless
    ring-compaction every vector-tiling/export pipeline runs before
    serializing). The fixture densifies each mosaic edge into
    {_SIMPLIFY_SUB} exact-quarter subsegments, and the operator must
    recover exactly the original corners: ring endpoints are always kept;
    an interior vertex survives iff the cross product of its adjacent
    segments is non-zero.

    Scale shape: zero shuffles beyond the final presentation sort — the
    densify is a Catalyst higher-order transform on the ring arrays, the
    keep test is a lag/lead window WITHIN each ring partition (partitioned
    by feature, never global), all whole-stage-codegen. At 10^9 rings this
    is scan-bound. Douglas-Peucker at tol>0 is the same per-ring shape
    with a stack kernel in a mapInPandas partition."""
    rings = surface_mosaic(
        spark, rows=_SIMPLIFY_GRID, cols=_SIMPLIFY_GRID, defect="valid_mosaic"
    ).filter(F.col("is_exterior"))

    def densify(col: str) -> F.Column:
        # each edge (v_i, v_i+1) → SUB points at t = j/SUB (t=0 keeps v_i
        # exactly); the ring's closing vertex is appended verbatim
        return F.expr(
            f"""concat(
              flatten(transform(slice({col}, 1, size({col}) - 1), (v, i) ->
                transform(sequence(0, {_SIMPLIFY_SUB - 1}), j ->
                  v + (element_at({col}, i + 2) - v)
                    * (CAST(j AS DOUBLE) / {_SIMPLIFY_SUB}.0)))),
              array(element_at({col}, -1)))"""
        )

    d = rings.select(
        "feature_id",
        F.posexplode(F.arrays_zip(densify("xs").alias("x"), densify("ys").alias("y"))),
    ).select(
        "feature_id",
        F.col("pos").alias("idx"),
        F.col("col.x").alias("x"),
        F.col("col.y").alias("y"),
    )
    return simplify_collinear_points(d).orderBy("feature_id", "seq")


def simplify_collinear_points(d: DataFrame) -> DataFrame:
    """Core keep-rule over an exploded ring-point table (feature_id, idx,
    x, y): endpoints always survive; an interior vertex survives iff its
    adjacent-segment cross product is non-zero. Per-ring window only —
    no global sort, no shuffle beyond the feature partition."""
    from pyspark.sql import Window

    w = Window.partitionBy("feature_id").orderBy("idx")
    cross = (F.col("x") - F.lag("x").over(w)) * (F.lead("y").over(w) - F.col("y")) - (
        F.col("y") - F.lag("y").over(w)
    ) * (F.lead("x").over(w) - F.col("x"))
    return (
        d.withColumn("cross", cross)
        .filter(F.col("cross").isNull() | (F.col("cross") != 0.0))
        .withColumn("seq", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .select("feature_id", "seq", "x", "y")
    )


# --- trajectory step analysis (spatio-temporal window op) ---------------------

N_TRAJ = 20000
N_OBJECTS = 50  # → 400 ordered steps per object

_TRAJ_SQL = f"""
WITH pts AS ({points_sql(N_TRAJ)}),
tr AS (
  SELECT point_id % {N_OBJECTS} AS object_id,
         point_id // {N_OBJECTS} AS t, x, y
  FROM pts
),
st AS (
  SELECT object_id, t, x, y,
         x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM tr WINDOW w AS (PARTITION BY object_id ORDER BY t)
)
SELECT object_id, CAST(t AS BIGINT) AS t, x, y,
       sqrt(dx * dx + dy * dy) AS step_dist
FROM st WHERE dx IS NOT NULL
ORDER BY object_id, t
"""


@query("trajectory_steps", oracle=_TRAJ_SQL)
def trajectory_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step movement analysis over object trajectories — the
    spatio-temporal windowing every GPS/AIS pipeline runs (step vectors,
    distances; speeds divide by the step interval). Object id and tick
    derive from the deterministic point corpus, so the oracle replays the
    identical IEEE expression tree (dx*dx + dy*dy then one sqrt) and
    matches bit-for-bit.

    Scale shape: ONE hash exchange on object_id (the natural trajectory
    partitioning — billions of objects spread evenly; a single object's
    track fits a partition by construction), then lag windows inside each
    partition. No global sort: the presentation orderBy is the driver
    contract's, not the operator's."""
    from pyspark.sql import Window

    pts = synthetic_points(spark, N_TRAJ)
    tr = pts.select(
        (F.col("point_id") % N_OBJECTS).alias("object_id"),
        F.floor(F.col("point_id") / N_OBJECTS).alias("t"),
        "x",
        "y",
    )
    w = Window.partitionBy("object_id").orderBy("t")
    dx = F.col("x") - F.lag("x").over(w)
    dy = F.col("y") - F.lag("y").over(w)
    st = tr.select(
        "object_id", "t", "x", "y", dx.alias("dx"), dy.alias("dy")
    ).filter(F.col("dx").isNotNull())
    return st.select(
        "object_id",
        "t",
        "x",
        "y",
        F.sqrt(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")).alias("step_dist"),
    ).orderBy("object_id", "t")


# --- per-group convex hull (two-stage partial-hull merge) ----------------------

N_HULL_PTS = 1200
HULL_GROUPS = 8
_HKX, _HKY, _HM = 9241, 5437, 20000  # coprime multipliers → all points distinct

# O(n³) hull-edge oracle: a directed edge (a,b) lies on the CCW hull iff every
# other point c of the group is strictly left of it, or collinear and strictly
# between a and b (so only the MAXIMAL edge of a collinear run qualifies — the
# oracle yields exactly the strict-corner hull cycle). The shoelace sum over
# the directed cycle needs no ordering: each edge contributes ax*by - bx*ay.
# All-integer coordinates keep every product and sum exact in int64.
_HULL_SQL = f"""
WITH pts AS (
  SELECT i % {HULL_GROUPS} AS gid, i,
         (i * {_HKX}) % {_HM} AS x, (i * {_HKY}) % {_HM} AS y
  FROM (SELECT range AS i FROM range({N_HULL_PTS}))
),
edges AS (
  SELECT a.gid, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM pts a JOIN pts b ON a.gid = b.gid AND a.i <> b.i
  WHERE NOT EXISTS (
    SELECT 1 FROM pts c
    WHERE c.gid = a.gid AND c.i <> a.i AND c.i <> b.i
      AND NOT (
        (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) > 0
        OR ((b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) = 0
            AND (c.x - a.x) * (b.x - a.x) + (c.y - a.y) * (b.y - a.y) > 0
            AND (c.x - a.x) * (b.x - a.x) + (c.y - a.y) * (b.y - a.y)
                < (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))
      )
  )
)
SELECT gid AS group_id,
       CAST(COUNT(*) AS INT) AS n_hull,
       CAST(SUM(ax * by - bx * ay) AS BIGINT) AS area2,
       CAST(SUM((bx - ax) * (bx - ax) + (by - ay) * (by - ay)) AS BIGINT)
         AS edge_len2_sum
FROM edges GROUP BY gid ORDER BY gid
"""


def _hull_chain(points):
    """Andrew monotone chain with STRICT turns (collinear vertices dropped),
    returning the CCW hull cycle — the same strict-corner set the O(n³)
    oracle derives. Pure-python ints: exact, overflow-free."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def build(seq):
        st = []
        for p in seq:
            while (
                len(st) >= 2
                and (st[-1][0] - st[-2][0]) * (p[1] - st[-2][1])
                - (st[-1][1] - st[-2][1]) * (p[0] - st[-2][0])
                <= 0
            ):
                st.pop()
            st.append(p)
        return st

    lower = build(pts)
    upper = build(reversed(pts))
    return lower[:-1] + upper[:-1]


def hull_points(spark: SparkSession) -> DataFrame:
    """Deterministic integer point corpus for the hull op (distinct by
    construction: the x multiplier is coprime with the modulus, so x alone
    is injective for i < modulus)."""
    return spark.range(N_HULL_PTS).select(
        (F.col("id") % HULL_GROUPS).alias("group_id"),
        ((F.col("id") * _HKX) % _HM).alias("x"),
        ((F.col("id") * _HKY) % _HM).alias("y"),
    )


@query("geom_convex_hull", oracle=_HULL_SQL)
def geom_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group convex hull — vertex count, doubled shoelace area and the
    sum of squared edge lengths, all exact int64 (integer coordinates, so
    both engines agree bit-for-bit with no float summation-order hazard).

    Scale shape (the reason this is TWO stages): hull(S₁ ∪ S₂) =
    hull(hull(S₁) ∪ hull(S₂)), so stage 1 computes a PARTIAL hull per
    (group, input partition) — a map-side combine that collapses each
    partition's points to at most its hull (O(√n) points in expectation
    for random input) before anything shuffles — and stage 2 merges the
    partial hulls per group. At 10^12 points per group the exchange
    carries hull-sized fragments, not the raw points; the same algebra is
    why a streaming/incremental hull works. The per-group python loop in
    the kernels touches only partial-hull points (bounded), never the raw
    corpus."""
    import pandas as pd

    pts = hull_points(spark).withColumn("pid", F.spark_partition_id())

    def partial(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        hull = _hull_chain(list(zip(pdf["x"].tolist(), pdf["y"].tolist())))
        return pd.DataFrame(
            {
                "group_id": [int(key[0])] * len(hull),
                "x": [p[0] for p in hull],
                "y": [p[1] for p in hull],
            }
        )

    def final(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        hull = _hull_chain(list(zip(pdf["x"].tolist(), pdf["y"].tolist())))
        n = len(hull)
        area2 = 0
        len2 = 0
        for k in range(n):
            ax, ay = hull[k]
            bx, by = hull[(k + 1) % n]
            area2 += ax * by - bx * ay
            len2 += (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        return pd.DataFrame(
            {
                "group_id": [int(key[0])],
                "n_hull": [n],
                "area2": [area2],
                "edge_len2_sum": [len2],
            }
        )

    partials = pts.groupBy("group_id", "pid").applyInPandas(
        partial, "group_id long, x long, y long"
    )
    return (
        partials.groupBy("group_id")
        .applyInPandas(final, "group_id long, n_hull int, area2 long, edge_len2_sum long")
        .orderBy("group_id")
    )


# --- per-group diameter (farthest pair) over the two-stage hull ----------------

# Exact-pair oracle: brute-force max squared distance over ALL point pairs of
# the group (canonical a <lex b), tie-broken by the lexicographically least
# (ax, ay, bx, by). The engine searches only hull vertices — sound because a
# farthest-pair endpoint is always a STRICT hull corner: |P(t) - C|² is
# strictly convex along any segment, so a point interior to a collinear hull
# run is strictly closer to every C than one of the run's endpoints.
_DIAM_SQL = f"""
WITH pts AS (
  SELECT i % {HULL_GROUPS} AS gid,
         (i * {_HKX}) % {_HM} AS x, (i * {_HKY}) % {_HM} AS y
  FROM (SELECT range AS i FROM range({N_HULL_PTS}))
),
pairs AS (
  SELECT p.gid, p.x AS ax, p.y AS ay, q.x AS bx, q.y AS by,
         (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS dist2
  FROM pts p JOIN pts q
    ON p.gid = q.gid AND (p.x < q.x OR (p.x = q.x AND p.y < q.y))
),
r AS (
  SELECT gid, dist2, ax, ay, bx, by,
         ROW_NUMBER() OVER (PARTITION BY gid
                            ORDER BY dist2 DESC, ax, ay, bx, by) AS rn
  FROM pairs
)
SELECT gid AS group_id, CAST(dist2 AS BIGINT) AS diam2,
       CAST(ax AS BIGINT) AS ax, CAST(ay AS BIGINT) AS ay,
       CAST(bx AS BIGINT) AS bx, CAST(by AS BIGINT) AS by
FROM r WHERE rn = 1 ORDER BY group_id
"""


@query("geom_hull_diameter", oracle=_DIAM_SQL)
def geom_hull_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group diameter (farthest point pair) — exact int64 squared
    distance plus the canonical endpoint pair, computed over hull vertices
    only after the same two-stage partial-hull reduction as
    geom_convex_hull.

    Scale shape: stage 1's map-side partial hulls bound what shuffles, and
    the diameter search runs on the merged hull's strict corners — O(h²)
    integer numpy over h ≈ O(log n / √n-ish) vertices (a few dozen even at
    10^12 scattered points per group), so an all-pairs scan over hull
    vertices IS the right plan at scale; rotating calipers would save
    nothing measurable and adds orientation edge cases. Correctness of the
    hull-only search: every farthest-pair endpoint is a strict hull corner
    (strict convexity of squared distance along segments), so the engine
    sees every pair the brute-force oracle can pick, including ties."""
    import numpy as np
    import pandas as pd

    pts = hull_points(spark).withColumn("pid", F.spark_partition_id())

    def partial(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        hull = _hull_chain(list(zip(pdf["x"].tolist(), pdf["y"].tolist())))
        return pd.DataFrame(
            {
                "group_id": [int(key[0])] * len(hull),
                "x": [p[0] for p in hull],
                "y": [p[1] for p in hull],
            }
        )

    def final(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        hull = _hull_chain(list(zip(pdf["x"].tolist(), pdf["y"].tolist())))
        # coords < 2^15 → squared distances < 2^31: exact in int64
        hx = np.array([p[0] for p in hull], dtype=np.int64)
        hy = np.array([p[1] for p in hull], dtype=np.int64)
        dx = hx[:, None] - hx[None, :]
        dy = hy[:, None] - hy[None, :]
        d2 = dx * dx + dy * dy
        best = int(d2.max())
        ii, jj = np.nonzero(d2 == best)
        cands = []
        for i, j in zip(ii.tolist(), jj.tolist()):
            a, b = (hull[i], hull[j]) if hull[i] < hull[j] else (hull[j], hull[i])
            cands.append((a[0], a[1], b[0], b[1]))
        ax, ay, bx, by = min(cands)
        return pd.DataFrame(
            {
                "group_id": [int(key[0])],
                "diam2": [best],
                "ax": [ax],
                "ay": [ay],
                "bx": [bx],
                "by": [by],
            }
        )

    partials = pts.groupBy("group_id", "pid").applyInPandas(
        partial, "group_id long, x long, y long"
    )
    return (
        partials.groupBy("group_id")
        .applyInPandas(
            final, "group_id long, diam2 long, ax long, ay long, bx long, by long"
        )
        .orderBy("group_id")
    )


# --- bbox intersection join (2D range join via cell cover, dedup-free) ---------

N_RECT_A = 4000
N_RECT_B = 4000
_RM = 4096  # domain side
_RWMAX = 48  # max rect extent per axis
_RCELL = 64  # cover-cell side; a rect spans ≤ 2 cells per axis
_RPOS = _RM - _RWMAX  # position modulus keeps every rect inside the domain


def _rect_sql(n: int, kx: int, ky: int, kw: int, kh: int) -> str:
    return (
        f"SELECT i, (i * {kx}) % {_RPOS} AS x0, (i * {ky}) % {_RPOS} AS y0,\n"
        f"       (i * {kx}) % {_RPOS} + 1 + (i * {kw}) % {_RWMAX} AS x1,\n"
        f"       (i * {ky}) % {_RPOS} + 1 + (i * {kh}) % {_RWMAX} AS y1\n"
        f"FROM (SELECT range AS i FROM range({n}))"
    )


_RA = (40503, 9109, 293, 541)
_RB = (30011, 12007, 387, 769)

# naive theta-join oracle: strict interior overlap of half-open rects
_BBOX_SQL = f"""
WITH ra AS ({_rect_sql(N_RECT_A, *_RA)}),
rb AS ({_rect_sql(N_RECT_B, *_RB)})
SELECT a.i AS rect_a, b.i AS rect_b,
       CAST((LEAST(a.x1, b.x1) - GREATEST(a.x0, b.x0))
          * (LEAST(a.y1, b.y1) - GREATEST(a.y0, b.y0)) AS BIGINT) AS overlap_area
FROM ra a JOIN rb b
  ON a.x0 < b.x1 AND b.x0 < a.x1 AND a.y0 < b.y1 AND b.y0 < a.y1
ORDER BY rect_a, rect_b
"""


def _rects(spark: SparkSession, n: int, kx: int, ky: int, kw: int, kh: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("i"),
        ((F.col("id") * kx) % _RPOS).alias("x0"),
        ((F.col("id") * ky) % _RPOS).alias("y0"),
        ((F.col("id") * kx) % _RPOS + 1 + (F.col("id") * kw) % _RWMAX).alias("x1"),
        ((F.col("id") * ky) % _RPOS + 1 + (F.col("id") * kh) % _RWMAX).alias("y1"),
    )


@query("spatial_bbox_join", oracle=_BBOX_SQL)
def spatial_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle-intersection join (the 2D range join: bounding boxes,
    viewports, image crop regions) via grid-cell covering — each rect
    explodes to the cells it touches, pairs meet with a plain equi-join on
    the cell, and the overlap predicate confirms exactly.

    Dedup-free by construction: a pair sharing several cells is emitted
    ONLY at the cell containing the intersection's min corner
    (greatest(x0) // cell, greatest(y0) // cell) — the standard
    reporting-cell rule — so no DISTINCT shuffle ever runs. Scale shape:
    ONE equi-join exchange on cell id; cover fan-out is bounded (≤4 cells
    per rect at extent ≤ cell side); skew from hot cells is the pip_join
    problem and would reuse its recon-salting if cells grew dense. All
    integer, bit-exact vs the naive theta-join oracle."""
    ra = _rects(spark, N_RECT_A, *_RA)
    rb = _rects(spark, N_RECT_B, *_RB)

    def cover(df: DataFrame, tag: str) -> DataFrame:
        # _RCELL is a power of two, so the double division under floor is
        # exact; floor() returns LongType, which sequence() requires
        return df.select(
            F.col("i").alias(f"{tag}_i"),
            F.col("x0").alias(f"{tag}x0"),
            F.col("y0").alias(f"{tag}y0"),
            F.col("x1").alias(f"{tag}x1"),
            F.col("y1").alias(f"{tag}y1"),
            F.explode(
                F.sequence(
                    F.floor(F.col("x0") / _RCELL), F.floor((F.col("x1") - 1) / _RCELL)
                )
            ).alias("cx"),
            F.col("y0"),
            F.col("y1"),
        ).select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col("y0") / _RCELL), F.floor((F.col("y1") - 1) / _RCELL)
                )
            ).alias("cy"),
        ).drop("y0", "y1")

    ca = cover(ra, "a")
    cb = cover(rb, "b")
    ix0 = F.greatest("ax0", "bx0")
    iy0 = F.greatest("ay0", "by0")
    return (
        ca.join(cb, ["cx", "cy"])
        .where(
            (F.col("ax0") < F.col("bx1"))
            & (F.col("bx0") < F.col("ax1"))
            & (F.col("ay0") < F.col("by1"))
            & (F.col("by0") < F.col("ay1"))
            # reporting-cell rule: emit once, at the cell containing the
            # intersection's min corner (pure-integer range check)
            & (F.col("cx") * _RCELL <= ix0)
            & (ix0 < (F.col("cx") + 1) * _RCELL)
            & (F.col("cy") * _RCELL <= iy0)
            & (iy0 < (F.col("cy") + 1) * _RCELL)
        )
        .select(
            F.col("a_i").alias("rect_a"),
            F.col("b_i").alias("rect_b"),
            (
                (F.least("ax1", "bx1") - F.greatest("ax0", "bx0"))
                * (F.least("ay1", "by1") - F.greatest("ay0", "by0"))
            ).alias("overlap_area"),
        )
        .orderBy("rect_a", "rect_b")
    )


# --- spatial ANTI join: points contained by NO surface -----------------------

ANTI_GRID = 10  # 10×10 unit squares at the origin — points span [0, 20)²


_ANTI_SQL = f"""
WITH pts AS ({points_sql(N_POINTS)})
SELECT point_id, x, y
FROM pts WHERE x > {ANTI_GRID} OR y > {ANTI_GRID}
"""


@query("spatial_anti_join", oracle=_ANTI_SQL)
def spatial_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points covered by no polygon — the spatial complement of pip_join
    (the 'outside any administrative area / outside any raster footprint'
    filter). Implemented as pip_join → left_anti on point_id, so both PIP
    strategies (broadcast index / salted shuffle) serve the anti form
    unchanged. Oracle: the 10×10 unit grid admits a closed-form complement
    (a point on a grid line belongs to its lower-left square, so only
    strict overshoot is outside)."""
    points = synthetic_points(spark, N_POINTS)
    rings = surface_mosaic(spark, rows=ANTI_GRID, cols=ANTI_GRID, defect="valid_mosaic")
    inside = pip_join(spark, points, rings).select("point_id")
    return points.join(inside, "point_id", "left_anti").select("point_id", "x", "y")


# --- distance (radius) join -----------------------------------------------------

DIST_N = 4_000
DIST_R = 0.25  # radius AND blocking-cell side; 0.25/0.0625 are binary-exact

_DIST_SQL = f"""
WITH pa AS (SELECT * FROM ({points_sql(DIST_N)}) WHERE point_id % 2 = 0),
pb AS (SELECT * FROM ({points_sql(DIST_N, DIST_N)}) WHERE point_id % 2 = 0)
SELECT pa.point_id AS a_id, pb.point_id AS b_id,
       (pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y) AS dist2
FROM pa, pb
WHERE (pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y)
      <= {DIST_R * DIST_R}
ORDER BY a_id, b_id
"""


@query("spatial_distance_join", oracle=_DIST_SQL)
def spatial_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join (all pairs within DIST_R) — the spatial primitive between
    PIP and kNN: geofencing, proximity dedup, trajectory contact tracing.
    Grid blocking at cell side == radius: the probe side explodes to its
    3x3 neighbor cells, the build side keeps ONE cell each, so every
    qualifying pair meets in exactly one (build-cell) bucket — no DISTINCT.
    One equi-join exchange on the cell key; the exact IEEE predicate
    ((dx)^2+(dy)^2 <= r^2, all binary-exact constants) confirms. The
    scattered (cold) point family keeps the demo un-skewed; a hot cell
    would reuse pip_join's recon salting. Oracle: the naive theta join."""
    from pyspark.sql import functions as F

    from etf_topox_spark.sources.points import synthetic_points

    inv = 1.0 / DIST_R  # 4.0, exact
    pa = (
        synthetic_points(spark, DIST_N)
        .where(F.col("point_id") % 2 == 0)
        .select(
            F.col("point_id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            F.floor(F.col("x") * inv).alias("acx"),
            F.floor(F.col("y") * inv).alias("acy"),
        )
    )
    pb = (
        synthetic_points(spark, DIST_N, id_offset=DIST_N)
        .where(F.col("point_id") % 2 == 0)
        .select(
            F.col("point_id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.floor(F.col("x") * inv).alias("cx"),
            F.floor(F.col("y") * inv).alias("cy"),
        )
    )
    probe = pa.select(
        "a_id", "ax", "ay",
        F.explode(F.sequence(F.col("acx") - 1, F.col("acx") + 1)).alias("cx"),
        "acy",
    ).select(
        "a_id", "ax", "ay", "cx",
        F.explode(F.sequence(F.col("acy") - 1, F.col("acy") + 1)).alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(pb, ["cx", "cy"])
        .where(d2 <= F.lit(DIST_R * DIST_R))
        .select("a_id", "b_id", d2.alias("dist2"))
        .orderBy("a_id", "b_id")
    )


# --- discrete Hausdorff distance between point-set pairs ----------------------

# Point sets derived deterministically from lineitem on a 256² integer
# lattice (DISTINCT per group, so both engines see the same multiplicity-
# free sets); each group is paired with its cyclic successor. All-integer
# squared distances — MIN/MAX on int64, zero float anywhere, so the oracle
# match is exact by construction.
_HAUS_GROUPS = 256

_HAUS_PTS_SQL = f"""
  SELECT DISTINCT l_orderkey % {_HAUS_GROUPS} AS g,
         (l_partkey * 13) % 256 AS x,
         (l_suppkey * 29) % 256 AS y
  FROM lineitem
"""

_HAUSDORFF_SQL = f"""
WITH pts AS ({_HAUS_PTS_SQL}),
pair_min AS (
  SELECT a.g AS ga, a.x, a.y,
         MIN((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dmin2
  FROM pts a JOIN pts b ON b.g = (a.g + 1) % {_HAUS_GROUPS}
  GROUP BY 1, 2, 3
),
dir_ab AS (SELECT ga, MAX(dmin2) AS h2_ab FROM pair_min GROUP BY 1),
pair_min_r AS (
  SELECT b.g AS gb, b.x, b.y,
         MIN((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dmin2
  FROM pts a JOIN pts b ON b.g = (a.g + 1) % {_HAUS_GROUPS}
  GROUP BY 1, 2, 3
),
dir_ba AS (SELECT (gb + {_HAUS_GROUPS} - 1) % {_HAUS_GROUPS} AS ga,
           MAX(dmin2) AS h2_ba FROM pair_min_r GROUP BY 1)
SELECT a.ga AS group_a, (a.ga + 1) % {_HAUS_GROUPS} AS group_b,
       a.h2_ab, b.h2_ba,
       GREATEST(a.h2_ab, b.h2_ba) AS hausdorff2
FROM dir_ab a JOIN dir_ba b ON a.ga = b.ga
ORDER BY group_a
"""


@query("geom_hausdorff_discrete", oracle=_HAUSDORFF_SQL)
def geom_hausdorff_discrete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (vertex-to-vertex) Hausdorff distance between paired point
    sets — the shape-similarity gate a geometry-dedup or conflation
    pipeline runs on polygon vertex clouds: h(A,B) = max over a of min
    over b of |a-b|, symmetrized by the max of both directions. Squared
    integer distances end to end (the lattice is 256², dmin2 < 2^18), so
    engine and oracle agree bit-for-bit with no sqrt anywhere.

    Scale shape: ONE equi-join on the group key (each point set meets only
    its partner — never a cross join over sets), per-point MIN then
    per-group MAX, both partial-aggregable map-side. Pairs per group are
    bounded by set size²; sets past ~10⁴ points would reuse the radius-
    join cell blocking to prune the inner MIN to neighboring cells (the
    exact-certified pattern in operators/spatial.py)."""
    from etf_topox_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_orderkey") % _HAUS_GROUPS).alias("g"),
        ((F.col("l_partkey") * 13) % 256).alias("x"),
        ((F.col("l_suppkey") * 29) % 256).alias("y"),
    ).distinct()
    a = pts.select(F.col("g").alias("ga"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = pts.select(F.col("g").alias("gb"), F.col("x").alias("bx"), F.col("y").alias("by"))
    joined = a.join(b, (F.col("ga") + 1) % _HAUS_GROUPS == F.col("gb"))
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    # both directions from ONE pass over the pair join: each pair row
    # explodes into its a-side and b-side (side, point, d2) rows, so the
    # expensive |A|x|B| join runs once instead of once per direction (two
    # independent aggregations over an uncached subtree would re-execute
    # it — Spark reuses exchanges, not join results).
    pair = joined.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("ab").alias("side"), F.col("ga").alias("g"),
                    F.col("ax").alias("px"), F.col("ay").alias("py"),
                    d2.alias("d2"),
                ),
                F.struct(
                    F.lit("ba").alias("side"), F.col("ga").alias("g"),
                    F.col("bx").alias("px"), F.col("by").alias("py"),
                    d2.alias("d2"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    dmin = pair.groupBy("side", "g", "px", "py").agg(F.min("d2").alias("dmin2"))
    dirs = dmin.groupBy("g").agg(
        F.max(F.when(F.col("side") == "ab", F.col("dmin2"))).alias("h2_ab"),
        F.max(F.when(F.col("side") == "ba", F.col("dmin2"))).alias("h2_ba"),
    )
    return dirs.select(
        F.col("g").alias("group_a"),
        ((F.col("g") + 1) % _HAUS_GROUPS).alias("group_b"),
        "h2_ab",
        "h2_ba",
        F.greatest("h2_ab", "h2_ba").alias("hausdorff2"),
    ).orderBy("group_a")


# --- Douglas-Peucker ring simplification (tol > 0) -----------------------------

_DP_GRID = 8
_DP_SUB = 4          # densify each edge into quarters...
_DP_TOL = 0.2        # ...then simplify at this tolerance
_DP_BUMP_ODD = 0.375   # mid-edge bump height, odd features: ABOVE tol → kept
_DP_BUMP_EVEN = 0.0625  # even features: below tol → dropped

import numpy as _np  # noqa: E402  (kernel-side; keeps the module header Spark-only)


def dp_keep_mask(x: "_np.ndarray", y: "_np.ndarray", tol: float) -> "_np.ndarray":
    """Ramer-Douglas-Peucker keep mask for ONE polyline (closed rings pass
    their duplicated closing vertex; the degenerate anchor chord then
    measures distance-to-point, so no special casing). Iterative stack,
    vectorized distance pass per chord; argmax ties resolve to the lowest
    index (np.argmax), and a vertex is kept iff its distance STRICTLY
    exceeds tol. Coordinates in the fixtures are exact binary fractions,
    so cross products and squared distances are exact doubles and the
    keep decisions are reproducible bit-for-bit."""
    n = len(x)
    keep = _np.zeros(n, _np.bool_)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n < 3:
        return keep
    tol2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        px, py = x[i + 1 : j] - x[i], y[i + 1 : j] - y[i]
        dx, dy = x[j] - x[i], y[j] - y[i]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = px * px + py * py
        else:
            cr = dx * py - dy * px
            d2 = (cr * cr) / L2
        k = int(_np.argmax(d2))
        if d2[k] > tol2:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def dp_simplify_rings(rings: DataFrame, tol: float) -> DataFrame:
    """Douglas-Peucker over a rings frame (one array-typed ring per row) —
    the tol>0 companion of simplify_collinear_points, fulfilling its
    docstring's promise: the same per-ring shape, with the recursive
    chord-splitting stack in an Arrow kernel instead of a lag/lead window
    (DP's data-dependent splits are not expressible as a fixed-depth
    window). Map-only: each ring lives wholly in its row, so there is NO
    shuffle at all; 10^9 rings scan-bound exactly like the collinear pass.
    Ring length is bounded (vertex caps in any sane vector schema), so the
    per-ring python loop inside the kernel is bounded work per row."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fids, seqs, xs_o, ys_o = [], [], [], []
            for fid, xs, ys in zip(pdf["feature_id"], pdf["xs"], pdf["ys"]):
                x = _np.asarray(xs, _np.float64)
                y = _np.asarray(ys, _np.float64)
                m = dp_keep_mask(x, y, tol)
                k = int(m.sum())
                fids.append(_np.full(k, fid, _np.int64))
                seqs.append(_np.arange(k, dtype=_np.int32))
                xs_o.append(x[m])
                ys_o.append(y[m])
            if not fids:
                continue
            yield pd.DataFrame(
                {
                    "feature_id": _np.concatenate(fids),
                    "seq": _np.concatenate(seqs),
                    "x": _np.concatenate(xs_o),
                    "y": _np.concatenate(ys_o),
                }
            )

    return rings.mapInPandas(
        kernel, "feature_id long, seq int, x double, y double"
    )


def dp_fixture_rings(spark: SparkSession) -> DataFrame:
    f"""Densified-and-bumped mosaic rings: each unit-square edge becomes
    quarter points with the midpoint displaced perpendicular-outward by a
    per-feature bump height (odd feature_id: {_DP_BUMP_ODD} > tol, must
    survive; even: {_DP_BUMP_EVEN} < tol, must vanish along with the exact
    collinear quarter points). All coordinates are exact binary
    fractions."""
    import pandas as pd

    rings = surface_mosaic(
        spark, rows=_DP_GRID, cols=_DP_GRID, defect="valid_mosaic"
    ).filter(F.col("is_exterior"))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_f, out_x, out_y = [], [], []
            for fid, xs, ys in zip(pdf["feature_id"], pdf["xs"], pdf["ys"]):
                x = _np.asarray(xs, _np.float64)
                y = _np.asarray(ys, _np.float64)
                h = _DP_BUMP_ODD if fid % 2 else _DP_BUMP_EVEN
                nx, ny = [], []
                for e in range(len(x) - 1):
                    dx, dy = x[e + 1] - x[e], y[e + 1] - y[e]
                    for j in range(_DP_SUB):
                        t = j / _DP_SUB
                        px, py = x[e] + dx * t, y[e] + dy * t
                        if j == _DP_SUB // 2:  # midpoint → perpendicular bump
                            px += h * dy
                            py -= h * dx
                        nx.append(px)
                        ny.append(py)
                nx.append(x[-1])
                ny.append(y[-1])
                out_f.append(fid)
                out_x.append(_np.array(nx))
                out_y.append(_np.array(ny))
            yield pd.DataFrame(
                {"feature_id": out_f, "xs": out_x, "ys": out_y}
            )

    return rings.mapInPandas(
        kernel, "feature_id long, xs array<double>, ys array<double>"
    )


def _dp_sql() -> str:
    """Recursive-CTE Douglas-Peucker (upgrades this query from rows-only;
    VERDICT r3 precedent: give every recursion-shaped op a list/recursive
    oracle). Key identity: DP's kept set equals the UNION OF ENDPOINTS of
    every segment the splitting recursion ever creates — the root chord
    contributes {{0, n-1}}, and each split's argmax vertex k enters as an
    endpoint of both children — so the CTE only has to enumerate segments,
    never track the keep mask. The argmax subquery replays the kernel's
    exact float algebra ((cr*cr)/L2 on exact binary-fraction coords, the
    degenerate closed-ring chord falling back to distance-to-point) with
    the identical lowest-index tie (ORDER BY d2 DESC, v) and the identical
    STRICT tol² test."""
    n_feats = _DP_GRID * _DP_GRID
    tol2 = repr(float(_DP_TOL) * float(_DP_TOL))
    h = f"CASE WHEN fid % 2 = 1 THEN {_DP_BUMP_ODD} ELSE {_DP_BUMP_EVEN} END"
    l2 = "((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))"
    cr = "((b.x - a.x) * (w.y - a.y) - (b.y - a.y) * (w.x - a.x))"
    d2 = (
        f"CASE WHEN {l2} = 0"
        f" THEN (w.x - a.x) * (w.x - a.x) + (w.y - a.y) * (w.y - a.y)"
        f" ELSE ({cr} * {cr}) / {l2} END"
    )
    return f"""
WITH RECURSIVE feats AS (
  SELECT CAST(range AS BIGINT) AS fid,
         CAST(range % {_DP_GRID} AS DOUBLE) AS x0,
         CAST(range // {_DP_GRID} AS DOUBLE) AS y0
  FROM range({n_feats})
),
verts AS (
  SELECT fid, v,
         CASE WHEN v = 16 THEN x0 ELSE
           CASE v // 4 WHEN 0 THEN x0 WHEN 1 THEN x0 + 1
                       WHEN 2 THEN x0 + 1 ELSE x0 END
           + (CASE v // 4 WHEN 0 THEN 1 WHEN 2 THEN -1 ELSE 0 END) * ((v % 4) * 0.25)
           + CASE WHEN v % 4 = 2 THEN ({h})
                  * (CASE v // 4 WHEN 1 THEN 1 WHEN 3 THEN -1 ELSE 0 END)
             ELSE 0 END
         END AS x,
         CASE WHEN v = 16 THEN y0 ELSE
           CASE v // 4 WHEN 0 THEN y0 WHEN 1 THEN y0
                       WHEN 2 THEN y0 + 1 ELSE y0 + 1 END
           + (CASE v // 4 WHEN 1 THEN 1 WHEN 3 THEN -1 ELSE 0 END) * ((v % 4) * 0.25)
           - CASE WHEN v % 4 = 2 THEN ({h})
                  * (CASE v // 4 WHEN 0 THEN 1 WHEN 2 THEN -1 ELSE 0 END)
             ELSE 0 END
         END AS y
  FROM feats, (SELECT CAST(range AS BIGINT) AS v FROM range(17))
),
splits AS (
  SELECT fid, CAST(0 AS BIGINT) AS i, CAST(16 AS BIGINT) AS j FROM feats
  UNION ALL
  SELECT t.fid,
         CASE u.side WHEN 0 THEN t.i ELSE t.pick.k END AS i,
         CASE u.side WHEN 0 THEN t.pick.k ELSE t.j END AS j
  FROM (
    SELECT s.fid, s.i, s.j,
           (SELECT {{'k': w.v, 'd2': {d2}}}
            FROM verts w
            WHERE w.fid = s.fid AND w.v > s.i AND w.v < s.j
            ORDER BY {d2} DESC, w.v LIMIT 1) AS pick
    FROM splits s
    JOIN verts a ON a.fid = s.fid AND a.v = s.i
    JOIN verts b ON b.fid = s.fid AND b.v = s.j
    WHERE s.j - s.i >= 2
  ) t, (SELECT unnest([0, 1]) AS side) u
  WHERE t.pick.d2 > {tol2}
),
kept AS (
  -- DuckDB quirk: inside a WITH RECURSIVE clause, a bare UNION between
  -- CTE branches is treated as the recursive UNION ALL form — dedup must
  -- be an explicit DISTINCT over UNION ALL
  SELECT DISTINCT fid, v FROM (
    SELECT fid, i AS v FROM splits UNION ALL SELECT fid, j AS v FROM splits
  )
)
SELECT k.fid AS feature_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY k.fid ORDER BY k.v) - 1 AS INT) AS seq,
       verts.x, verts.y
FROM kept k JOIN verts ON verts.fid = k.fid AND verts.v = k.v
ORDER BY feature_id, seq
"""


@query("geom_simplify_dp", oracle=_dp_sql())
def geom_simplify_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Douglas-Peucker at tol={_DP_TOL} over the bumped fixture — the lossy
    polyline compaction every tile/export pipeline runs above the lossless
    collinear pass. Oracled since round 4 by a recursive-CTE replay of the
    chord-splitting recursion (_dp_sql docstring — the kept set is the
    endpoint union of every segment the recursion creates); the exact
    checks in tests/ additionally pin an independent python reference,
    the closed-form kept sets (even features: 4 corners + closing; odd:
    anchor + 4 bumps + closing — the tall bumps' chords eat the other
    corners, a classic DP artifact the test documents), and the
    within-tol guarantee on randomized polylines."""
    return dp_simplify_rings(dp_fixture_rings(spark), _DP_TOL).orderBy(
        "feature_id", "seq"
    )


# --- point along perimeter (ST_LineInterpolatePoint analog) -------------------

N_INTERP = 2000  # rects of family A; t = (i % 10) / 10 walks the ring

_INTERP_SQL = f"""
WITH r AS ({_rect_sql(N_INTERP, *_RA)}),
segs AS (
  SELECT i, s.seq,
    CASE s.seq WHEN 0 THEN x0 WHEN 1 THEN x1 WHEN 2 THEN x1 ELSE x0 END AS ax,
    CASE s.seq WHEN 0 THEN y0 WHEN 1 THEN y0 WHEN 2 THEN y1 ELSE y1 END AS ay,
    CASE s.seq WHEN 0 THEN x1 WHEN 1 THEN x1 WHEN 2 THEN x0 ELSE x0 END AS bx,
    CASE s.seq WHEN 0 THEN y0 WHEN 1 THEN y1 WHEN 2 THEN y1 ELSE y0 END AS by
  FROM r, (SELECT unnest([0, 1, 2, 3]) AS seq) s
),
lens AS (
  SELECT *,
    sqrt(CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS DOUBLE)) AS seglen,
    COALESCE(SUM(sqrt(CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS DOUBLE)))
      OVER (PARTITION BY i ORDER BY seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum_before,
    SUM(sqrt(CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS DOUBLE)))
      OVER (PARTITION BY i) AS total
  FROM segs
),
tgt AS (
  SELECT *, (CAST(i % 10 AS DOUBLE) / 10.0) * total AS target FROM lens
)
SELECT i AS rect_id, CAST(i % 10 AS DOUBLE) / 10.0 AS t,
       ax + ((target - cum_before) / seglen) * (bx - ax) AS x,
       ay + ((target - cum_before) / seglen) * (by - ay) AS y
FROM tgt
WHERE cum_before <= target AND target < cum_before + seglen
ORDER BY rect_id
"""


@query("geom_line_interpolate", oracle=_INTERP_SQL)
def geom_line_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_LineInterpolatePoint analog: the point at perimeter fraction t
    along each rectangle ring (t = (id % 10)/10 exercises every edge and
    the t=0 vertex case). Pure windowed Catalyst: segment lengths, an
    exclusive running sum, the ring total, then ONE filter picks the
    containing segment (cum_before ≤ t·total < cum_before+len is true for
    exactly one row; at an exact vertex hit the strict right bound hands
    the point to the NEXT segment at frac 0). Windows partition on the
    ring id — never global — so at 10^9 rings this is one exchange on the
    ring key and whole-stage codegen throughout. Integer coordinates keep
    sqrt/cumsum exact (axis-aligned integer lengths), so the oracle match
    is bit-exact; the same plan serves float rings with ordinary IEEE
    agreement."""
    from pyspark.sql import Window

    r = _rects(spark, N_INTERP, *_RA)
    seg = r.select(
        "i",
        F.posexplode(
            F.array(
                F.struct(F.col("x0").alias("ax"), F.col("y0").alias("ay"),
                         F.col("x1").alias("bx"), F.col("y0").alias("by")),
                F.struct(F.col("x1").alias("ax"), F.col("y0").alias("ay"),
                         F.col("x1").alias("bx"), F.col("y1").alias("by")),
                F.struct(F.col("x1").alias("ax"), F.col("y1").alias("ay"),
                         F.col("x0").alias("bx"), F.col("y1").alias("by")),
                F.struct(F.col("x0").alias("ax"), F.col("y1").alias("ay"),
                         F.col("x0").alias("bx"), F.col("y0").alias("by")),
            )
        ).alias("seq", "s"),
    ).select("i", "seq", "s.ax", "s.ay", "s.bx", "s.by")
    seglen = F.sqrt(
        ((F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
         + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))).cast("double")
    )
    w = Window.partitionBy("i").orderBy("seq")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy("i")
    lens = seg.select(
        "*",
        seglen.alias("seglen"),
        F.coalesce(F.sum(seglen).over(wprev), F.lit(0.0)).alias("cum_before"),
        F.sum(seglen).over(wall).alias("total"),
    )
    t = (F.col("i") % 10).cast("double") / F.lit(10.0)
    tgt = lens.select("*", (t * F.col("total")).alias("target"))
    frac = (F.col("target") - F.col("cum_before")) / F.col("seglen")
    return (
        tgt.where(
            (F.col("cum_before") <= F.col("target"))
            & (F.col("target") < F.col("cum_before") + F.col("seglen"))
        )
        .select(
            F.col("i").alias("rect_id"),
            t.alias("t"),
            (F.col("ax") + frac * (F.col("bx") - F.col("ax"))).alias("x"),
            (F.col("ay") + frac * (F.col("by") - F.col("ay"))).alias("y"),
        )
        .orderBy("rect_id")
    )


# --- rectangle union area per group (coordinate compression) ------------------

_UNION_GROUPS = 500  # 4000 family-A rects → 8 per group

_UNION_AREA_SQL = f"""
WITH r AS (
  SELECT i % {_UNION_GROUPS} AS grp, x0, y0, x1, y1
  FROM ({_rect_sql(N_RECT_A, *_RA)})
),
xc AS (SELECT DISTINCT grp, c AS xc FROM (
  SELECT grp, unnest([x0, x1]) AS c FROM r)),
yc AS (SELECT DISTINCT grp, c AS yc FROM (
  SELECT grp, unnest([y0, y1]) AS c FROM r)),
xseg AS (
  SELECT grp, xc AS xa, LEAD(xc) OVER (PARTITION BY grp ORDER BY xc) AS xb
  FROM xc
),
yseg AS (
  SELECT grp, yc AS ya, LEAD(yc) OVER (PARTITION BY grp ORDER BY yc) AS yb
  FROM yc
),
cells AS (
  SELECT x.grp, x.xa, x.xb, y.ya, y.yb
  FROM xseg x JOIN yseg y USING (grp)
  WHERE x.xb IS NOT NULL AND y.yb IS NOT NULL
),
covered AS (
  SELECT c.* FROM cells c
  WHERE EXISTS (
    SELECT 1 FROM r
    WHERE r.grp = c.grp AND r.x0 <= c.xa AND r.x1 >= c.xb
      AND r.y0 <= c.ya AND r.y1 >= c.yb)
)
SELECT grp, CAST(SUM((xb - xa) * (yb - ya)) AS BIGINT) AS union_area
FROM covered GROUP BY grp ORDER BY grp
"""


@query("geom_rect_union_area", oracle=_UNION_AREA_SQL)
def geom_rect_union_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area of the UNION of each group's rectangles (coverage area of
    detections / viewports / crop sets — the measure-of-union problem) by
    per-group coordinate compression: the group's distinct x- and y-cuts
    grid the plane into at most (2k−1)² cells, a cell is inside the union
    iff some rectangle contains it entirely (rectangles' edges lie on the
    cuts, so containment of the cell ⇔ containment of its min corner),
    and the union area is the exact integer sum of covered-cell areas.

    Scale shape: every stage keys on the group id — the cut windows, the
    cell cross join (bounded at (2k−1)² per group by construction), and
    the coverage semi-join — so groups parallelize perfectly and no
    global structure exists; a group's work is O(k³) for k rectangles,
    the right trade below ~10³ rects/group (beyond that a per-group Arrow
    sweepline kernel would take over, the pip-kernel pattern)."""
    r = _rects(spark, N_RECT_A, *_RA).select(
        (F.col("i") % _UNION_GROUPS).alias("grp"), "x0", "y0", "x1", "y1"
    )
    from pyspark.sql import Window

    def cuts(c0, c1, out):
        c = (
            r.select("grp", F.explode(F.array(c0, c1)).alias("c"))
            .distinct()
        )
        w = Window.partitionBy("grp").orderBy("c")
        return c.select(
            "grp", F.col("c").alias(f"{out}a"), F.lead("c").over(w).alias(f"{out}b")
        ).where(F.col(f"{out}b").isNotNull())

    cells = cuts("x0", "x1", "x").join(cuts("y0", "y1", "y"), "grp")
    covered = cells.join(
        r.select(
            F.col("grp").alias("rg"), F.col("x0").alias("rx0"),
            F.col("y0").alias("ry0"), F.col("x1").alias("rx1"),
            F.col("y1").alias("ry1"),
        ),
        (F.col("grp") == F.col("rg"))
        & (F.col("rx0") <= F.col("xa")) & (F.col("rx1") >= F.col("xb"))
        & (F.col("ry0") <= F.col("ya")) & (F.col("ry1") >= F.col("yb")),
        "left_semi",
    )
    return (
        covered.groupBy("grp")
        .agg(
            F.sum(
                (F.col("xb") - F.col("xa")) * (F.col("yb") - F.col("ya"))
            ).alias("union_area")
        )
        .orderBy("grp")
    )


# --- map matching: snap points to the nearest road segment --------------------

_MM_POINTS = 5000
_MM_GRID = 20  # unit road grid over the [0, 20)^2 point domain

_MAP_MATCH_SQL = f"""
WITH pts AS ({points_sql(_MM_POINTS)}),
roads AS (
  SELECT k.range * {_MM_GRID} + j.range AS road_id, 0 AS vert,
         CAST(j.range AS DOUBLE) AS ax, CAST(k.range AS DOUBLE) AS ay,
         CAST(j.range + 1 AS DOUBLE) AS bx, CAST(k.range AS DOUBLE) AS by
  FROM range({_MM_GRID + 1}) k, range({_MM_GRID}) j
  UNION ALL
  SELECT 100000 + j.range * {_MM_GRID} + k.range, 1,
         CAST(j.range AS DOUBLE), CAST(k.range AS DOUBLE),
         CAST(j.range AS DOUBLE), CAST(k.range + 1 AS DOUBLE)
  FROM range({_MM_GRID + 1}) j, range({_MM_GRID}) k
),
cand AS (
  SELECT p.point_id, r.road_id,
         CASE WHEN r.vert = 0
              THEN GREATEST(CAST(0 AS DOUBLE), r.ax - p.x, p.x - r.bx)
              ELSE ABS(p.x - r.ax) END AS dx,
         CASE WHEN r.vert = 0
              THEN ABS(p.y - r.ay)
              ELSE GREATEST(CAST(0 AS DOUBLE), r.ay - p.y, p.y - r.by) END AS dy,
         CASE WHEN r.vert = 0
              THEN LEAST(GREATEST(p.x, r.ax), r.bx) ELSE r.ax END AS sx,
         CASE WHEN r.vert = 0
              THEN r.ay ELSE LEAST(GREATEST(p.y, r.ay), r.by) END AS sy
  FROM pts p CROSS JOIN roads r
),
best AS (
  SELECT point_id, road_id, sx, sy, dx * dx + dy * dy AS d2,
         ROW_NUMBER() OVER (PARTITION BY point_id
                            ORDER BY dx * dx + dy * dy, road_id) AS rk
  FROM cand
)
SELECT point_id, road_id, sx, sy, sqrt(d2) AS dist
FROM best WHERE rk = 1 ORDER BY point_id
"""


@query("spatial_map_match", oracle=_MAP_MATCH_SQL)
def spatial_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map matching: snap every GPS-style point to its nearest road
    segment (a unit grid network over the point domain), reporting the
    matched road, the snapped coordinate (the segment's closest point)
    and the snap distance — the first stage of every trajectory-to-network
    pipeline. Point-to-segment distance for axis-aligned roads is the
    clamp-residual form (GREATEST(0, lo−p, p−hi) per axis), one
    deterministic IEEE chain shared verbatim with the oracle; the argmin
    tie-breaks on road_id through a per-point window.

    Scale shape: the road network BROADCASTS (real networks are the small
    side — millions of segments vs billions of pings) and the candidate
    generation is map-side; a network too big to broadcast would reuse
    the pip_join cell-blocking pattern, comparing each ping only against
    segments covering its cell neighborhood. The per-point argmin window
    partitions on point_id — maximal cardinality, no skew."""
    from pyspark.sql import Window

    pts = synthetic_points(spark, _MM_POINTS)
    g = _MM_GRID
    horiz = (
        spark.range(g + 1)
        .select(F.col("id").alias("k"))
        .crossJoin(spark.range(g).select(F.col("id").alias("j")))
        .select(
            (F.col("k") * g + F.col("j")).alias("road_id"),
            F.lit(0).alias("vert"),
            F.col("j").cast("double").alias("ax"),
            F.col("k").cast("double").alias("ay"),
            (F.col("j") + 1).cast("double").alias("bx"),
            F.col("k").cast("double").alias("by"),
        )
    )
    vert = (
        spark.range(g + 1)
        .select(F.col("id").alias("j"))
        .crossJoin(spark.range(g).select(F.col("id").alias("k")))
        .select(
            (F.lit(100000) + F.col("j") * g + F.col("k")).alias("road_id"),
            F.lit(1).alias("vert"),
            F.col("j").cast("double").alias("ax"),
            F.col("k").cast("double").alias("ay"),
            F.col("j").cast("double").alias("bx"),
            (F.col("k") + 1).cast("double").alias("by"),
        )
    )
    roads = horiz.unionByName(vert)
    cand = pts.crossJoin(F.broadcast(roads)).select(
        "point_id",
        "road_id",
        F.when(
            F.col("vert") == 0,
            F.greatest(F.lit(0.0), F.col("ax") - F.col("x"), F.col("x") - F.col("bx")),
        ).otherwise(F.abs(F.col("x") - F.col("ax"))).alias("dx"),
        F.when(F.col("vert") == 0, F.abs(F.col("y") - F.col("ay"))).otherwise(
            F.greatest(F.lit(0.0), F.col("ay") - F.col("y"), F.col("y") - F.col("by"))
        ).alias("dy"),
        F.when(
            F.col("vert") == 0, F.least(F.greatest(F.col("x"), F.col("ax")), F.col("bx"))
        ).otherwise(F.col("ax")).alias("sx"),
        F.when(
            F.col("vert") == 0, F.col("ay")
        ).otherwise(F.least(F.greatest(F.col("y"), F.col("ay")), F.col("by"))).alias("sy"),
    )
    d2 = F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")
    w = Window.partitionBy("point_id").orderBy(d2.asc(), "road_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "point_id", "road_id", "sx", "sy", F.sqrt(d2).alias("dist")
        )
        .orderBy("point_id")
    )


# --- trig-free bearing sectors over trajectory steps --------------------------

_BEARING_SQL = f"""
WITH pts AS ({points_sql(N_TRAJ)}),
tr AS (
  SELECT point_id % {N_OBJECTS} AS object_id,
         point_id // {N_OBJECTS} AS t, x, y
  FROM pts
),
st AS (
  SELECT object_id,
         x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM tr WINDOW w AS (PARTITION BY object_id ORDER BY t)
),
sect AS (
  SELECT object_id,
    CASE
      WHEN dy >= 0 AND dx > 0 AND dx >= dy THEN 'E'
      WHEN dy > 0 AND dx >= 0 AND dy > dx THEN 'N'
      WHEN dy > 0 AND dx < 0 AND dy >= -dx THEN 'N'
      WHEN dy >= 0 AND dx < 0 AND -dx > dy THEN 'W'
      WHEN dy < 0 AND dx < 0 AND -dx >= -dy THEN 'W'
      WHEN dy < 0 AND dx <= 0 AND -dy > -dx THEN 'S'
      WHEN dy < 0 AND dx > 0 AND -dy > dx THEN 'S'
      ELSE 'E'
    END AS sector
  FROM st WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0)
)
SELECT object_id, sector, COUNT(*) AS n
FROM sect GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("trajectory_bearing_sectors", oracle=_BEARING_SQL)
def trajectory_bearing_sectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-object heading census in four 90° sectors (E = |dx| dominant
    eastward, etc.) decided ENTIRELY by sign and magnitude comparisons of
    the step vector — no atan2, so there is no transcendental-libm parity
    risk between engines and the classification is exact on any input
    (boundaries tie toward E/N/W/S deterministically, zero steps drop).
    The same (object_id) window the trajectory_steps op uses; the census
    is #objects × 4 rows."""
    pts = synthetic_points(spark, N_TRAJ)
    tr = pts.select(
        (F.col("point_id") % N_OBJECTS).alias("object_id"),
        F.floor(F.col("point_id") / N_OBJECTS).alias("t"),
        "x",
        "y",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("object_id").orderBy("t")
    st = tr.select(
        "object_id",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    )
    dx, dy = F.col("dx"), F.col("dy")
    sector = (
        F.when((dy >= 0) & (dx > 0) & (dx >= dy), "E")
        .when((dy > 0) & (dx >= 0) & (dy > dx), "N")
        .when((dy > 0) & (dx < 0) & (dy >= -dx), "N")
        .when((dy >= 0) & (dx < 0) & (-dx > dy), "W")
        .when((dy < 0) & (dx < 0) & (-dx >= -dy), "W")
        .when((dy < 0) & (dx <= 0) & (-dy > -dx), "S")
        .when((dy < 0) & (dx > 0) & (-dy > dx), "S")
        .otherwise("E")
    )
    return (
        st.where(dx.isNotNull() & ~((dx == 0) & (dy == 0)))
        .select("object_id", sector.alias("sector"))
        .groupBy("object_id", "sector")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("object_id", "sector")
    )


# --------------------------------------------------------------------------
# Global spatial autocorrelation (Moran's I) over grid cells
# --------------------------------------------------------------------------

N_MORAN = 40_000  # points; odd ids collapse into one hot cell → strong
                  # positive autocorrelation signal around (10, 10)

_MORAN_SQL = f"""
WITH pts AS ({points_sql(40_000)}),
cells AS (
  SELECT CAST(floor(x) AS BIGINT) AS cx, CAST(floor(y) AS BIGINT) AS cy,
         COUNT(*) AS n
  FROM pts GROUP BY 1, 2
),
tot AS (SELECT COUNT(*) AS nc, CAST(SUM(n) AS BIGINT) AS s FROM cells),
dev AS (SELECT cx, cy, t.nc * n - t.s AS dv FROM cells, tot t),
pr AS (
  SELECT COUNT(*) AS w, CAST(SUM(a.dv * b.dv) AS BIGINT) AS num
  FROM dev a JOIN dev b
    ON abs(a.cx - b.cx) + abs(a.cy - b.cy) = 1
),
dn AS (SELECT CAST(SUM(dv * dv) AS BIGINT) AS den FROM dev)
SELECT t.nc AS n_cells, pr.w AS w_pairs, pr.num AS moran_num, dn.den AS moran_den,
       (CAST(pr.num AS DOUBLE) / CAST(dn.den AS DOUBLE))
       * (CAST(t.nc AS DOUBLE) / CAST(pr.w AS DOUBLE)) AS morans_i
FROM tot t, pr, dn
"""


@query("spatial_morans_i", oracle=_MORAN_SQL)
def spatial_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I — THE spatial-autocorrelation statistic — over
    per-cell point counts with rook (4-neighbor, binary-weight) adjacency.
    Exact-arithmetic form: with S = Σn and N = cell count, the deviation
    N·n_i − S is an integer (= N² × the rational (n_i − S/N)), so both the
    cross-product numerator Σ_{{i~j}} dev_i·dev_j and the variance
    denominator Σ dev_i² are exact int64 sums — the N² factors cancel in
    the ratio, and I = (num/den)·(N/W) is computed with one identical
    two-division expression tree on both engines (bit-exact doubles, the
    points regenerate in SQL bit-for-bit).

    Scale shape: ONE count shuffle on the cell key (map-side partial
    combine); the neighbor pairing is an equi-join of the cell table
    against its four unit-shifted copies (never a theta join — the
    shifted-copy trick turns |Δ|=1 adjacency into a hash join key), and
    the final reduces are single-row aggregates. At 10^12 points the cell
    table is bounded by the index resolution, not the data."""
    pts = synthetic_points(spark, N_MORAN)
    cells = (
        pts.groupBy(
            F.floor("x").alias("cx"), F.floor("y").alias("cy")
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.agg(
        F.count(F.lit(1)).alias("nc"), F.sum("n").alias("s")
    )
    dev = cells.crossJoin(F.broadcast(tot)).select(
        "cx", "cy", (F.col("nc") * F.col("n") - F.col("s")).alias("dv")
    )
    shifted = None
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        leg = dev.select(
            (F.col("cx") + dx).alias("cx"),
            (F.col("cy") + dy).alias("cy"),
            F.col("dv").alias("dv_a"),
        )
        shifted = leg if shifted is None else shifted.unionByName(leg)
    pairs = shifted.join(dev, ["cx", "cy"]).select("dv_a", "dv")
    pr = pairs.agg(
        F.count(F.lit(1)).alias("w"), F.sum(F.col("dv_a") * F.col("dv")).alias("num")
    )
    dn = dev.agg(F.sum(F.col("dv") * F.col("dv")).alias("den"))
    return (
        tot.crossJoin(pr)
        .crossJoin(dn)
        .select(
            F.col("nc").alias("n_cells"),
            F.col("w").alias("w_pairs"),
            F.col("num").alias("moran_num"),
            F.col("den").alias("moran_den"),
            (
                (F.col("num").cast("double") / F.col("den").cast("double"))
                * (F.col("nc").cast("double") / F.col("w").cast("double"))
            ).alias("morans_i"),
        )
    )


# --- STR (Sort-Tile-Recursive) bulk-load spatial partitioner -------------------
#
# The classic R-tree bulk-loading tiler (Leutenegger/Lopez/Edgington 1997,
# the partitioner Sedona/GeoSpark use for spatial RDD layout): rank points
# by x, cut into S equal-count vertical strips, rank each strip by y, cut
# into capacity-C leaves. The leaf inventory (count + bbox per leaf) is the
# spatial partitioning map a distributed engine broadcasts before a
# partitioned spatial join.

STR_N = 20000
STR_S = 8  # vertical strips
STR_CAP = 400  # points per leaf within a strip (2500/strip → 7 leaves)

_STR_SQL = f"""
WITH pts AS ({points_sql(20000)}),
r AS (SELECT point_id, x, y,
             ROW_NUMBER() OVER (ORDER BY x, point_id) - 1 AS rk FROM pts),
s AS (SELECT *, CAST((rk * {STR_S}) // {STR_N} AS INTEGER) AS strip FROM r),
t AS (SELECT *,
             CAST((ROW_NUMBER() OVER (PARTITION BY strip ORDER BY y, point_id) - 1)
                  // {STR_CAP} AS INTEGER) AS tile
      FROM s)
SELECT strip, tile, COUNT(*) AS n_pts,
       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
FROM t GROUP BY strip, tile ORDER BY strip, tile
"""


@query("spatial_str_pack", oracle=_STR_SQL)
def spatial_str_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR leaf inventory over the skewed point fixture.

    Scale shape — the global x-rank WITHOUT a global sort: the oracle's
    `ROW_NUMBER() OVER (ORDER BY x, point_id)` would be a single-partition
    window in Spark (the round-2 verdict's one named scale-killer shape),
    so the engine computes the identical rank distributively, TeraSort
    style: `repartitionByRange(x, point_id)` gives range-disjoint
    partitions in partition-id order, per-partition row_numbers are local
    windows, and the global offset of each partition is a ≤32-row count
    aggregate reduced on the driver and broadcast back as a literal map —
    the only collect is bounded by the partition count, never the data.
    The strip-internal y-rank partitions by strip (S-bounded, shuffles
    once). localCheckpoint(eager=True) pins the sampled range boundaries
    so the count pass and the rank pass see the same partitioning.

    NOTE: building this DataFrame runs TWO Spark actions at construction
    time (the eager checkpoint materialization + the ≤32-row offset-map
    collect) — unusual for a query-builder, but required so the offsets
    are computed against the exact pinned blocks the rank pass reads
    (ADVICE r3: eager=False left a window where evicted blocks could be
    resampled between the two passes; eager=True closes it)."""
    from pyspark.sql import Window

    pts = synthetic_points(spark, STR_N)
    ranged = (
        pts.repartitionByRange(32, "x", "point_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    base: dict[int, int] = {}
    acc = 0
    for row in sorted(sizes, key=lambda r: r["pid"]):
        base[row["pid"]] = acc
        acc += row["c"]
    offset = F.create_map(
        *[lit for p, b in base.items() for lit in (F.lit(p), F.lit(int(b)))]
    )
    wx = Window.partitionBy("pid").orderBy("x", "point_id")
    ranked = ranged.withColumn(
        "rk", (offset[F.col("pid")] + F.row_number().over(wx) - 1).cast("long")
    ).withColumn("strip", F.expr(f"CAST((rk * {STR_S}) DIV {STR_N} AS INT)"))
    wy = Window.partitionBy("strip").orderBy("y", "point_id")
    tiled = ranked.withColumn("rky", (F.row_number().over(wy) - 1).cast("long")).withColumn(
        "tile", F.expr(f"CAST(rky DIV {STR_CAP} AS INT)")
    )
    return (
        tiled.groupBy("strip", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("strip", "tile")
    )


# --- quadtree adaptive spatial partitioner (capacity split) --------------------
#
# The skew-adaptive counterpart to STR: recursively split any cell holding
# more than CAP points, to a depth limit. On the 50%-hot-cell fixture the
# sparse background resolves at level 5-6 while the hot square drives
# splits all the way down — the partition map a skew-aware spatial join
# builds before deciding salting/broadcast per region.

QT_N = 20000
QT_CAP = 512
QT_D = 14  # depth cap; the hot cell (0.008° square holding 10k points)
#            needs ~level-14 cells (20/2^14 ≈ 0.0012°) to approach CAP

_QT_SQL = f"""
WITH pts AS ({points_sql(20000)}),
e AS (
  SELECT l.range AS lvl,
         CAST(FLOOR(x * CAST(1 << l.range AS DOUBLE) / 20.0) AS BIGINT) AS cx,
         CAST(FLOOR(y * CAST(1 << l.range AS DOUBLE) / 20.0) AS BIGINT) AS cy
  FROM pts, range(0, {QT_D + 1}) l
),
c AS (SELECT lvl, cx, cy, COUNT(*) AS n FROM e GROUP BY 1, 2, 3),
j AS (
  SELECT c.lvl, c.cx, c.cy, c.n, p.n AS pn
  FROM c LEFT JOIN c p
    ON p.lvl = c.lvl - 1 AND p.cx = c.cx // 2 AND p.cy = c.cy // 2
)
SELECT CAST(lvl AS INTEGER) AS leaf_level, cx AS cell_x, cy AS cell_y, n AS n_pts
FROM j
WHERE (lvl = 0 OR pn > {QT_CAP}) AND (n <= {QT_CAP} OR lvl = {QT_D})
ORDER BY leaf_level, cell_x, cell_y
"""


@query("spatial_quadtree_partition", oracle=_QT_SQL)
def spatial_quadtree_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadtree leaf inventory: a cell is a leaf iff its parent overflowed
    (or it is the root) and it fits CAP (or the depth cap is hit).

    Scale shape: ONE pass — explode each point into its D+1 (level, cell)
    path entries and hash-aggregate (level, cx, cy) counts; Catalyst's
    partial aggregation collapses the ×15 row blow-up map-side, so the
    exchange carries per-partition DISTINCT cells, not points×levels. The
    leaf rule is a self-join of the (small) count table on the parent key
    — every key an exact equality, no iteration, no driver state. The
    float cell formula floor(x · 2^L / 20) uses an exact power-of-two
    literal (shiftleft, never pow()'s libm) so both engines round
    identically; parent/child indices relate by integer halving
    (floor-doubling property), which is what makes the one-shot
    explode+self-join equivalent to the textbook recursive split."""
    pts = synthetic_points(spark, QT_N)
    lvls = F.array([F.lit(l) for l in range(QT_D + 1)])
    p2 = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), lvl) AS DOUBLE)")
    e = pts.select(
        F.explode(lvls).alias("lvl"),
        F.col("x"),
        F.col("y"),
    ).select(
        "lvl",
        F.floor(F.col("x") * p2 / F.lit(20.0)).cast("long").alias("cx"),
        F.floor(F.col("y") * p2 / F.lit(20.0)).cast("long").alias("cy"),
    )
    c = e.groupBy("lvl", "cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    child = c.withColumn("plvl", F.col("lvl") - 1).withColumn(
        "pcx", F.expr("cx DIV 2")
    ).withColumn("pcy", F.expr("cy DIV 2"))
    parent = c.select(
        F.col("lvl").alias("plvl"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
        F.col("n").alias("pn"),
    )
    j = child.join(parent, ["plvl", "pcx", "pcy"], "left")
    return (
        j.filter(
            ((F.col("lvl") == 0) | (F.col("pn") > QT_CAP))
            & ((F.col("n") <= QT_CAP) | (F.col("lvl") == QT_D))
        )
        .select(
            F.col("lvl").cast("int").alias("leaf_level"),
            F.col("cx").alias("cell_x"),
            F.col("cy").alias("cell_y"),
            F.col("n").alias("n_pts"),
        )
        .orderBy("leaf_level", "cell_x", "cell_y")
    )


# --- Sutherland–Hodgman window clipping, pure Catalyst -------------------------
# ST_ClipByBox2D / raster-window clipping as FOUR unrolled half-plane
# passes over array<struct<x,y>> rings — every pass is one higher-order
# zip_with+flatten expression (whole-stage codegen, zero Python, zero
# shuffle), and the DuckDB oracle evaluates the IDENTICAL IEEE chain over
# list_zip (positional z[1]/z[2] = the same p/q operand order), so areas
# match bit-for-bit with no tolerance. Empty-after-clip rings short-circuit
# (a CASE guards the rotation slice) and report area 0.

_CLIP_X0, _CLIP_X1, _CLIP_Y0, _CLIP_Y1 = 4.0, 16.0, 4.0, 16.0
_CLIP_PLANES = (
    ("x", _CLIP_X0, True),
    ("x", _CLIP_X1, False),
    ("y", _CLIP_Y0, True),
    ("y", _CLIP_Y1, False),
)


def _clip_stage_spark(pts: str, axis: str, c: float, keep_ge: bool) -> str:
    op = ">=" if keep_ge else "<="
    t = lambda v: f"({v}.{axis} {op} {c}D)"
    if axis == "x":
        inter = (
            f"named_struct('x', CAST({c} AS DOUBLE), "
            f"'y', p.y + (q.y - p.y) * ({c}D - p.x) / (q.x - p.x))"
        )
    else:
        inter = (
            f"named_struct('x', p.x + (q.x - p.x) * ({c}D - p.y) / (q.y - p.y), "
            f"'y', CAST({c} AS DOUBLE))"
        )
    body = (
        f"CASE WHEN {t('p')} AND {t('q')} THEN array(q) "
        f"WHEN {t('p')} THEN array({inter}) "
        f"WHEN {t('q')} THEN array({inter}, q) "
        f"ELSE slice(array(q), 1, 0) END"
    )
    rot = f"concat(slice({pts}, 2, size({pts}) - 1), slice({pts}, 1, 1))"
    return (
        f"CASE WHEN size({pts}) = 0 THEN {pts} "
        f"ELSE flatten(zip_with({pts}, {rot}, (p, q) -> {body})) END"
    )


def _clip_stage_duck(pts: str, axis: str, c: float, keep_ge: bool) -> str:
    op = ">=" if keep_ge else "<="
    t = lambda v: f"({v}['{axis}'] {op} {c})"
    if axis == "x":
        inter = (
            f"{{'x': CAST({c} AS DOUBLE), "
            f"'y': z[1]['y'] + (z[2]['y'] - z[1]['y'])"
            f" * ({c} - z[1]['x']) / (z[2]['x'] - z[1]['x'])}}"
        )
    else:
        inter = (
            f"{{'x': z[1]['x'] + (z[2]['x'] - z[1]['x'])"
            f" * ({c} - z[1]['y']) / (z[2]['y'] - z[1]['y']), "
            f"'y': CAST({c} AS DOUBLE)}}"
        )
    body = (
        f"CASE WHEN {t('z[1]')} AND {t('z[2]')} THEN [z[2]] "
        f"WHEN {t('z[1]')} THEN [{inter}] "
        f"WHEN {t('z[2]')} THEN [{inter}, z[2]] "
        f"ELSE ([z[2]])[2:1] END"
    )
    zipped = (
        f"flatten(list_transform("
        f"list_zip({pts}, list_concat(({pts})[2:], ({pts})[1:1])), z -> {body}))"
    )
    return f"CASE WHEN len({pts}) = 0 THEN {pts} ELSE {zipped} END"


def _clip_oracle() -> str:
    struct_pts = (
        "["
        + ", ".join(f"{{'x': x{k}, 'y': y{k}}}" for k in range(4))
        + "]"
    )
    e = "pts"
    for axis, c, ge in _CLIP_PLANES:
        e = _clip_stage_duck(e, axis, c, ge)
    shoe = (
        "COALESCE(list_aggregate(list_transform("
        "list_zip(cp, list_concat(cp[2:], cp[1:1])), "
        "z -> z[1]['x'] * z[2]['y'] - z[2]['x'] * z[1]['y']), 'sum'), 0.0) / 2.0"
    )
    orig = (
        "(x0 * y1 - x1 * y0 + x1 * y2 - x2 * y1"
        " + x2 * y3 - x3 * y2 + x3 * y0 - x0 * y3) / 2.0"
    )
    return f"""
WITH q AS ({_quads_sql(N_QUADS)}),
r AS (SELECT feature_id, {struct_pts} AS pts,
             {orig} AS area_orig FROM q),
c AS (SELECT feature_id, area_orig, {e} AS cp FROM r)
SELECT feature_id, CAST(len(cp) AS INTEGER) AS n_clip,
       {shoe} AS area_clip, area_orig
FROM c ORDER BY feature_id
"""


@query("geom_clip_window", oracle=_clip_oracle())
def geom_clip_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip every quad of the synthetic corpus to the fixed window
    [{_CLIP_X0},{_CLIP_X1}]×[{_CLIP_Y0},{_CLIP_Y1}] with Sutherland–Hodgman
    (four unrolled half-plane passes) and report the clipped vertex count
    + shoelace area next to the original area — the raster-window /
    tile-boundary clipping primitive (ST_ClipByBox2D) every tiled
    geospatial pipeline runs before per-tile work.

    Scale shape: ZERO shuffles — the entire clip is a chain of
    higher-order array expressions (zip_with → CASE → flatten per plane)
    fused into one whole-stage-codegen projection over the ring table;
    at 10⁹ polygons this is scan-bound, exactly like geom_polygon_stats.
    Convex clip windows guarantee Sutherland–Hodgman correctness for the
    simple input rings; empty results short-circuit to area 0."""
    i = F.col("id")

    def ixd(mult: int, mod: int, div: float):
        return ((i * mult) % mod).cast("double") / div

    cols = [i.alias("feature_id")]
    for c, bx, by, px, py in _QUAD_CORNERS:
        cols.append((ixd(KX, M, DIV) + F.lit(bx) + ixd(px, 1000, 1000.0)).alias(f"x{c}"))
        cols.append((ixd(KY, M, DIV) + F.lit(by) + ixd(py, 1000, 1000.0)).alias(f"y{c}"))
    q = spark.range(0, N_QUADS).select(*cols)
    struct_pts = (
        "array(" + ", ".join(f"named_struct('x', x{k}, 'y', y{k})" for k in range(4)) + ")"
    )
    orig = (
        "(x0 * y1 - x1 * y0 + x1 * y2 - x2 * y1"
        " + x2 * y3 - x3 * y2 + x3 * y0 - x0 * y3) / 2.0"
    )
    r = q.selectExpr("feature_id", f"{struct_pts} AS pts", f"{orig} AS area_orig")
    e = "pts"
    for axis, c, ge in _CLIP_PLANES:
        e = _clip_stage_spark(e, axis, c, ge)
    clipped = r.selectExpr("feature_id", "area_orig", f"{e} AS cp")
    shoe = (
        "COALESCE(aggregate(zip_with(cp, "
        "concat(slice(cp, 2, size(cp) - 1), slice(cp, 1, 1)), "
        "(p, q) -> p.x * q.y - q.x * p.y), 0D, (a, v) -> a + v), 0D) / 2.0"
    )
    return clipped.selectExpr(
        "feature_id",
        "CAST(size(cp) AS INT) AS n_clip",
        f"CASE WHEN size(cp) = 0 THEN 0.0D ELSE {shoe} END AS area_clip",
        "area_orig",
    ).orderBy("feature_id")


# --- convex overlay: polygon x polygon intersection area join -----------------
# The ST_Intersection(ST_Area(...)) overlay primitive generalized from the
# fixed window above: each subject quad is clipped against the CONVEX
# clipper polygon owning its anchor cell (a rotated diamond, one per unit
# cell — think admin zones / antenna sectors / field parcels), via the same
# Sutherland–Hodgman half-plane chain but with PER-ROW edge coordinates
# (the clipper's corners ride in through a broadcast join) instead of
# plane constants. Both engines evaluate the identical IEEE chain, so the
# intersection areas value-hash bit-for-bit with no tolerance.

_N_OCELLS = 23  # clipper grid: one diamond per unit cell of the [0,23)^2 domain


def _diamond_sql(cx: str, cy: str) -> list[tuple[str, str]]:
    """CCW diamond corner expressions for the clipper of cell (cx, cy) —
    integer mod arithmetic + one division, identical text on both engines
    (both parse `%` on BIGINT and CAST .. AS DOUBLE the same way)."""
    ctr_x = f"(CAST({cx} AS DOUBLE) + 0.5)"
    ctr_y = f"(CAST({cy} AS DOUBLE) + 0.5)"
    r = [
        f"(0.3 + CAST(({cx} * {m1} + {cy} * {m2}) % 13 AS DOUBLE) / 26.0)"
        for m1, m2 in ((7, 11), (17, 5), (23, 3), (29, 19))
    ]
    return [
        (f"({ctr_x} + {r[0]})", ctr_y),
        (ctr_x, f"({ctr_y} + {r[1]})"),
        (f"({ctr_x} - {r[2]})", ctr_y),
        (ctr_x, f"({ctr_y} - {r[3]})"),
    ]


def _edge_stage_spark(pts: str, ax: str, ay: str, bx: str, by: str) -> str:
    """One Sutherland–Hodgman half-plane pass against the directed clipper
    edge (ax,ay)->(bx,by) of a CCW convex clipper (interior = left side).
    Same shape as _clip_stage_spark but with column-expression endpoints."""
    ex, ey = f"({bx} - {ax})", f"({by} - {ay})"

    def inside(v: str) -> str:
        return f"({ex} * ({v}.y - {ay}) - {ey} * ({v}.x - {ax}) >= 0D)"

    t = (
        f"((({ax} - p.x) * {ey} - ({ay} - p.y) * {ex})"
        f" / ((q.x - p.x) * {ey} - (q.y - p.y) * {ex}))"
    )
    inter = (
        f"named_struct('x', p.x + {t} * (q.x - p.x), "
        f"'y', p.y + {t} * (q.y - p.y))"
    )
    body = (
        f"CASE WHEN {inside('p')} AND {inside('q')} THEN array(q) "
        f"WHEN {inside('p')} THEN array({inter}) "
        f"WHEN {inside('q')} THEN array({inter}, q) "
        f"ELSE slice(array(q), 1, 0) END"
    )
    rot = f"concat(slice({pts}, 2, size({pts}) - 1), slice({pts}, 1, 1))"
    return (
        f"CASE WHEN size({pts}) = 0 THEN {pts} "
        f"ELSE flatten(zip_with({pts}, {rot}, (p, q) -> {body})) END"
    )


def _edge_stage_duck(pts: str, ax: str, ay: str, bx: str, by: str) -> str:
    ex, ey = f"({bx} - {ax})", f"({by} - {ay})"

    def inside(v: str) -> str:
        return f"({ex} * ({v}['y'] - {ay}) - {ey} * ({v}['x'] - {ax}) >= 0)"

    p, q = "z[1]", "z[2]"
    t = (
        f"((({ax} - {p}['x']) * {ey} - ({ay} - {p}['y']) * {ex})"
        f" / (({q}['x'] - {p}['x']) * {ey} - ({q}['y'] - {p}['y']) * {ex}))"
    )
    inter = (
        f"{{'x': {p}['x'] + {t} * ({q}['x'] - {p}['x']), "
        f"'y': {p}['y'] + {t} * ({q}['y'] - {p}['y'])}}"
    )
    body = (
        f"CASE WHEN {inside(p)} AND {inside(q)} THEN [{q}] "
        f"WHEN {inside(p)} THEN [{inter}] "
        f"WHEN {inside(q)} THEN [{inter}, {q}] "
        f"ELSE ([{q}])[2:1] END"
    )
    zipped = (
        f"flatten(list_transform("
        f"list_zip({pts}, list_concat(({pts})[2:], ({pts})[1:1])), z -> {body}))"
    )
    return f"CASE WHEN len({pts}) = 0 THEN {pts} ELSE {zipped} END"


def _overlay_oracle() -> str:
    struct_pts = (
        "[" + ", ".join(f"{{'x': x{k}, 'y': y{k}}}" for k in range(4)) + "]"
    )
    dia = _diamond_sql("ccx", "ccy")
    ccols = ", ".join(
        f"{dx} AS dax{k}, {dy} AS day{k}" for k, (dx, dy) in enumerate(dia)
    )
    zones = (
        f"SELECT ccx, ccy, {ccols} FROM ("
        f"SELECT (range // {_N_OCELLS}) AS ccx, (range % {_N_OCELLS}) AS ccy "
        f"FROM range({_N_OCELLS * _N_OCELLS}))"
    )
    # one CTE per half-plane pass — textual nesting would grow the SQL
    # ~6^4-fold (each stage references its input ring ~6 times); chained
    # CTEs keep the statement linear, mirroring the Spark side's chained
    # projections
    dcols = ", ".join(f"dax{k}, day{k}" for k in range(4))
    stage_ctes = ""
    prev = "d"
    for k in range(4):
        stg = _edge_stage_duck(
            "cp", f"dax{k}", f"day{k}", f"dax{(k + 1) % 4}", f"day{(k + 1) % 4}"
        )
        stage_ctes += (
            f"c{k} AS (SELECT feature_id, area_subject, ccx, ccy, {dcols}, "
            f"{stg} AS cp FROM {prev}),\n"
        )
        prev = f"c{k}"
    shoe = (
        "COALESCE(list_aggregate(list_transform("
        "list_zip(cp, list_concat(cp[2:], cp[1:1])), "
        "z -> z[1]['x'] * z[2]['y'] - z[2]['x'] * z[1]['y']), 'sum'), 0.0) / 2.0"
    )
    orig = (
        "(x0 * y1 - x1 * y0 + x1 * y2 - x2 * y1"
        " + x2 * y3 - x3 * y2 + x3 * y0 - x0 * y3) / 2.0"
    )
    return f"""
WITH q AS ({_quads_sql(N_QUADS)}),
s AS (SELECT feature_id, {struct_pts} AS pts, {orig} AS area_subject,
             CAST(floor(x0) AS BIGINT) AS ccx, CAST(floor(y0) AS BIGINT) AS ccy
      FROM q),
z AS ({zones}),
d AS (SELECT feature_id, pts AS cp, area_subject, ccx, ccy, {dcols}
      FROM s JOIN z USING (ccx, ccy)),
{stage_ctes}c AS (SELECT feature_id, area_subject, ccx, ccy, cp FROM c3)
SELECT feature_id, CAST(ccx AS INTEGER) AS cell_x, CAST(ccy AS INTEGER) AS cell_y,
       CAST(len(cp) AS INTEGER) AS n_clip,
       CASE WHEN len(cp) = 0 THEN 0.0 ELSE {shoe} END AS area_int,
       area_subject
FROM c
WHERE len(cp) >= 3
ORDER BY feature_id
"""


@query("geom_overlay_intersect_area", oracle=_overlay_oracle())
def geom_overlay_intersect_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex overlay join (the ST_Intersection + ST_Area pairing every
    parcel/zone overlay pipeline runs): each subject quad is clipped
    against the convex diamond clipper owning its anchor cell, via
    Sutherland–Hodgman with PER-ROW edge coordinates (four zip_with
    half-plane passes whose plane is read from the joined clipper row, not
    a constant), and reports the exact intersection area next to the
    subject area. Degenerate (<3-vertex) clips are dropped — they carry
    zero area by construction.

    Scale shape: clipper dimension broadcasts (one row per cell — at
    planet scale this is the zone table, Bloom-prunable); the clip chain
    itself is a single whole-stage-codegen projection, ZERO shuffles
    beyond the broadcast — at 10⁹ subjects this stays scan-bound. The
    DuckDB oracle replays the IDENTICAL IEEE chain, so areas value-hash
    bit-for-bit (no tolerance)."""
    i = F.col("id")

    def ixd(mult: int, mod: int, div: float):
        return ((i * mult) % mod).cast("double") / div

    cols = [i.alias("feature_id")]
    for c, bx, by, px, py in _QUAD_CORNERS:
        cols.append((ixd(KX, M, DIV) + F.lit(bx) + ixd(px, 1000, 1000.0)).alias(f"x{c}"))
        cols.append((ixd(KY, M, DIV) + F.lit(by) + ixd(py, 1000, 1000.0)).alias(f"y{c}"))
    q = spark.range(0, N_QUADS).select(*cols)
    struct_pts = (
        "array(" + ", ".join(f"named_struct('x', x{k}, 'y', y{k})" for k in range(4)) + ")"
    )
    orig = (
        "(x0 * y1 - x1 * y0 + x1 * y2 - x2 * y1"
        " + x2 * y3 - x3 * y2 + x3 * y0 - x0 * y3) / 2.0"
    )
    s = q.selectExpr(
        "feature_id",
        f"{struct_pts} AS pts",
        f"{orig} AS area_subject",
        "CAST(floor(x0) AS BIGINT) AS ccx",
        "CAST(floor(y0) AS BIGINT) AS ccy",
    )
    dia = _diamond_sql("ccx", "ccy")
    zones = (
        spark.range(0, _N_OCELLS * _N_OCELLS)
        .selectExpr(
            f"id DIV {_N_OCELLS} AS ccx",
            f"id % {_N_OCELLS} AS ccy",
        )
        .selectExpr(
            "ccx",
            "ccy",
            *[
                x
                for k, (dx, dy) in enumerate(dia)
                for x in (f"{dx} AS dax{k}", f"{dy} AS day{k}")
            ],
        )
    )
    d = s.join(F.broadcast(zones), ["ccx", "ccy"])
    # One projection per half-plane pass: each stage references its input
    # ring ~6 times, so textual nesting grows the expression tree ~6^4-fold
    # (measured: driver OOM at plan/codegen time); materializing each pass
    # as a named column keeps the tree linear — CollapseProject does not
    # inline non-cheap expressions referenced more than once, so the four
    # projections survive into the physical plan as a fused codegen chain.
    keep = ["feature_id", "area_subject", "ccx", "ccy"] + [
        f"da{ax}{k}" for k in range(4) for ax in ("x", "y")
    ]
    c = d.withColumnRenamed("pts", "cp")
    for k in range(4):
        stage = _edge_stage_spark(
            "cp", f"dax{k}", f"day{k}", f"dax{(k + 1) % 4}", f"day{(k + 1) % 4}"
        )
        c = c.selectExpr(*keep, f"{stage} AS cp")
    shoe = (
        "COALESCE(aggregate(zip_with(cp, "
        "concat(slice(cp, 2, size(cp) - 1), slice(cp, 1, 1)), "
        "(p, q) -> p.x * q.y - q.x * p.y), 0D, (a, v) -> a + v), 0D) / 2.0"
    )
    return (
        c.selectExpr(
            "feature_id",
            "CAST(ccx AS INT) AS cell_x",
            "CAST(ccy AS INT) AS cell_y",
            "CAST(size(cp) AS INT) AS n_clip",
            f"CASE WHEN size(cp) = 0 THEN 0.0D ELSE {shoe} END AS area_int",
            "area_subject",
        )
        .filter("n_clip >= 3")
        .orderBy("feature_id")
    )


# --- point-level DBSCAN (exact eps-disc density clustering) -------------------

# Smaller corpus than the cell-density variant: the exact point-level
# semantics needs eps-disc PAIR enumeration, and the oracle replays it as
# a naive all-pairs join — N is sized so the oracle's O(N²) stays cheap
# while the fixture still exercises every DBSCAN case: a ~1000-point clique
# (the hot blob, all pairwise within eps), a 300-point chain cluster (the
# ridge — core by chain neighbors only), scattered noise, and borders.
N_DB = 2000
N_DB_RIDGE = 300
DB_EPS = 0.05  # eps-disc radius; 1/eps = 20 exactly representable
DB_MINPTS = 8  # neighbor count INCLUDING self

_DB_RIDGE_SQL = f"""
    SELECT {RIDGE_OFFSET} + j AS point_id,
           1.0 + CAST(j * 5 AS DOUBLE) / 1000.0 AS x,
           4.0 + CAST(j * 25 AS DOUBLE) / 10000.0 AS y
    FROM (SELECT range AS j FROM range({N_DB_RIDGE}))
"""

_DBSCAN_SQL = f"""
WITH RECURSIVE pts AS ({points_sql(N_DB)} UNION ALL {_DB_RIDGE_SQL}),
nbr AS (
  SELECT a.point_id AS pa, b.point_id AS pb
  FROM pts a JOIN pts b
    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {DB_EPS} * {DB_EPS}
),
cnt AS (SELECT pa, COUNT(*) AS n FROM nbr GROUP BY pa),
core AS (SELECT pa AS id FROM cnt WHERE n >= {DB_MINPTS}),
edges AS (
  SELECT n.pa AS s, n.pb AS d
  FROM nbr n JOIN core c1 ON c1.id = n.pa JOIN core c2 ON c2.id = n.pb
  WHERE n.pa <> n.pb
),
walk(node, lbl) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.node
),
roots AS (SELECT node, MIN(lbl) AS root FROM walk GROUP BY node),
border AS (
  SELECT n.pa AS id, MIN(r.root) AS root
  FROM nbr n
  JOIN core c ON c.id = n.pb
  JOIN roots r ON r.node = n.pb
  WHERE n.pa <> n.pb AND n.pa NOT IN (SELECT id FROM core)
  GROUP BY n.pa
)
SELECT r.root AS cluster_id,
       COUNT(*) AS n_core,
       COALESCE(MAX(b.n_border), 0) AS n_border
FROM roots r
LEFT JOIN (SELECT root, COUNT(*) AS n_border FROM border GROUP BY root) b
  ON b.root = r.root
GROUP BY r.root
ORDER BY cluster_id
"""


def _db_ridge_points(spark: SparkSession) -> DataFrame:
    j = F.col("id") - RIDGE_OFFSET
    return spark.range(RIDGE_OFFSET, RIDGE_OFFSET + N_DB_RIDGE).select(
        F.col("id").alias("point_id"),
        (F.lit(1.0) + (j * 5).cast("double") / 1000.0).alias("x"),
        (F.lit(4.0) + (j * 25).cast("double") / 10000.0).alias("y"),
    )


@query("spatial_dbscan_points", oracle=_DBSCAN_SQL)
def spatial_dbscan_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact point-level DBSCAN (not the cell-density approximation of
    spatial_cluster_points): a point is CORE iff its eps-disc holds >=
    MINPTS points (self included); clusters are connected components of
    the core-core eps graph labeled by min point_id (the engine's CC root
    rule); a non-core point within eps of a core joins the smallest
    adjacent cluster root (the deterministic stand-in for scan-order
    border assignment); everything else is noise. Output: per-cluster
    core/border census.

    Scale shape: candidate pairs come from an eps-cell 9-neighborhood
    join (cell side = eps, so any pair within eps shares adjacent cells)
    — the shuffle carries (cell, id, x, y), never O(N²); the hot blob's
    single-cell clique is exactly the J14 hot-cell shape and would ride
    the salted-skew join at 10^12 points (SCALE.md §2). CC runs on the
    shared large-star/small-star machinery. The oracle replays the
    semantics as the naive all-pairs join + recursive min-label walk —
    same doubles bit-for-bit (one multiply/subtract tree, no sqrt)."""
    from etf_topox_spark.operators.topology import connected_components

    pts = synthetic_points(spark, N_DB).unionByName(_db_ridge_points(spark))
    inv = F.lit(1.0 / DB_EPS)
    cells = pts.select(
        "point_id", "x", "y",
        F.floor(F.col("x") * inv).cast("long").alias("cx"),
        F.floor(F.col("y") * inv).cast("long").alias("cy"),
    )
    # 9-neighborhood candidate join: left side explodes its 3x3 cell cover
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    lhs = cells.select(
        F.col("point_id").alias("pa"), F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.explode(F.array(*[
            F.struct((F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy"))
            for dx, dy in offs
        ])).alias("o"),
    ).select("pa", "ax", "ay", F.col("o.cx").alias("cx"), F.col("o.cy").alias("cy"))
    rhs = cells.select(
        "cx", "cy", F.col("point_id").alias("pb"),
        F.col("x").alias("bx"), F.col("y").alias("by"),
    )
    dx, dy = F.col("ax") - F.col("bx"), F.col("ay") - F.col("by")
    nbr = (
        lhs.join(rhs, ["cx", "cy"])
        .filter(dx * dx + dy * dy <= F.lit(DB_EPS * DB_EPS))
        .select("pa", "pb")
        .localCheckpoint(eager=False)
    )
    core = (
        nbr.groupBy("pa").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= DB_MINPTS)
        .select(F.col("pa").alias("id"))
        .localCheckpoint(eager=False)
    )
    pairs = (
        nbr.filter(F.col("pa") != F.col("pb"))
        .join(core.select(F.col("id").alias("pa")), "pa")
        .join(core.select(F.col("id").alias("pb")), "pb")
    )
    roots_cc = connected_components(
        pairs.filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    roots = core.join(roots_cc, core.id == roots_cc.node, "left").select(
        "id", F.coalesce("root", F.col("id")).alias("root")
    )
    border = (
        nbr.filter(F.col("pa") != F.col("pb"))
        .join(core.select(F.col("id").alias("pb")), "pb")
        .join(core.select(F.col("id").alias("pa")), "pa", "left_anti")
        .join(roots.select(F.col("id").alias("pb"), "root"), "pb")
        .groupBy("pa")
        .agg(F.min("root").alias("root"))
    )
    core_census = roots.groupBy("root").agg(F.count(F.lit(1)).alias("n_core"))
    border_census = border.groupBy("root").agg(F.count(F.lit(1)).alias("n_border"))
    return (
        core_census.join(border_census, "root", "left")
        .select(
            F.col("root").alias("cluster_id"),
            "n_core",
            F.coalesce("n_border", F.lit(0)).alias("n_border"),
        )
        .orderBy("cluster_id")
    )


# --- geofence enter/exit transition detection ---------------------------------

_FENCE = (8.0, 12.0, 8.0, 12.0)  # [x0, x1) x [y0, y1): captures the hot cell

_GEOFENCE_SQL = f"""
WITH pts AS ({points_sql(N_TRAJ)}),
tr AS (
  SELECT point_id % {N_OBJECTS} AS object_id,
         point_id // {N_OBJECTS} AS t, x, y,
         CAST(x >= {_FENCE[0]} AND x < {_FENCE[1]}
          AND y >= {_FENCE[2]} AND y < {_FENCE[3]} AS INTEGER) AS inside
  FROM pts
),
st AS (
  SELECT object_id, t, x, y, inside,
         LAG(inside) OVER (PARTITION BY object_id ORDER BY t) AS prev
  FROM tr
)
SELECT object_id, CAST(t AS BIGINT) AS t, x, y,
       CASE WHEN inside = 1 THEN 'enter' ELSE 'exit' END AS kind
FROM st
WHERE (prev IS NULL AND inside = 1) OR (prev IS NOT NULL AND prev <> inside)
ORDER BY object_id, t
"""


@query("spatial_geofence_transitions", oracle=_GEOFENCE_SQL)
def spatial_geofence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence enter/exit event detection over object trajectories — the
    fleet/asset-tracking staple: per object, per tick, an inside-fence
    flag; a transition row is emitted whenever the flag changes (plus an
    initial 'enter' when a track starts inside). Same trajectory corpus
    and total order as trajectory_steps.

    Scale shape: inside-test is a map-side predicate (at many fences it
    becomes the J10 PIP join first); then ONE hash exchange on object_id
    for the lag window. Transition rows are rare relative to ticks, so
    the output is a tiny fraction of the input — the filter sits above
    the window but below any wide operation."""
    from pyspark.sql import Window

    pts = synthetic_points(spark, N_TRAJ)
    x0, x1, y0, y1 = _FENCE
    inside = (
        (F.col("x") >= x0) & (F.col("x") < x1)
        & (F.col("y") >= y0) & (F.col("y") < y1)
    ).cast("int")
    tr = pts.select(
        (F.col("point_id") % N_OBJECTS).alias("object_id"),
        F.floor(F.col("point_id") / N_OBJECTS).alias("t"),
        "x", "y", inside.alias("inside"),
    )
    w = Window.partitionBy("object_id").orderBy("t")
    st = tr.withColumn("prev", F.lag("inside").over(w))
    return (
        st.filter(
            (F.col("prev").isNull() & (F.col("inside") == 1))
            | (F.col("prev").isNotNull() & (F.col("prev") != F.col("inside")))
        )
        .select(
            "object_id", "t", "x", "y",
            F.when(F.col("inside") == 1, "enter").otherwise("exit").alias("kind"),
        )
        .orderBy("object_id", "t")
    )


# --- discrete Voronoi: nearest-site assignment census --------------------------

N_VOR_SITES = 64
VOR_SITE_BASE = 3_000_000  # even ids → the scattered branch of the generator

_VOR_SITES_SQL = f"""
    SELECT j AS site_id,
           CAST((({VOR_SITE_BASE} + 2 * j) * {KX}) % {M} AS DOUBLE) / {DIV} AS sx,
           CAST((({VOR_SITE_BASE} + 2 * j) * {KY}) % {M} AS DOUBLE) / {DIV} AS sy
    FROM (SELECT range AS j FROM range({N_VOR_SITES}))
"""

_VORONOI_SQL = f"""
WITH pts AS ({points_sql(N_POINTS)}),
sites AS ({_VOR_SITES_SQL}),
d AS (
  SELECT p.point_id, s.site_id,
         (p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY p.point_id
           ORDER BY (p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy),
                    s.site_id) AS rn
  FROM pts p CROSS JOIN sites s
)
SELECT site_id, COUNT(*) AS n_points,
       CAST(SUM(CAST(d2 AS DECIMAL(30,6))) AS DOUBLE) AS sum_d2
FROM d WHERE rn = 1
GROUP BY site_id ORDER BY site_id
"""


@query("spatial_voronoi_assign", oracle=_VORONOI_SQL)
def spatial_voronoi_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Voronoi / nearest-facility assignment: every point joins
    its squared-L2-nearest of {N_VOR_SITES} sites (tie → lowest site_id),
    output the per-cell census (point count + exact decimal-summed total
    squared distance). The allocation primitive behind facility siting,
    k-means E-steps, and cell-tower attribution.

    Scale shape: the site table broadcasts (tiny by construction —
    facilities, centroids); the nested-loop candidate set reduces
    map-side via the partial-aggregable min(struct(d2, site_id)) before
    ONE exchange on point_id... in fact the argmin collapses INTO the
    broadcast-join stage, so the only full exchange carries one row per
    point; the site census is then a 64-row aggregate. At 10^9 sites the
    candidate set would come from the kNN cell index (J11) instead of the
    broadcast nested loop — same downstream algebra."""
    pts = synthetic_points(spark, N_POINTS)
    j = F.col("id")
    sites = spark.range(N_VOR_SITES).select(
        F.col("id").alias("site_id"),
        (((VOR_SITE_BASE + 2 * j) * KX) % M).cast("double").alias("sxn"),
        (((VOR_SITE_BASE + 2 * j) * KY) % M).cast("double").alias("syn"),
    ).select(
        "site_id",
        (F.col("sxn") / DIV).alias("sx"),
        (F.col("syn") / DIV).alias("sy"),
    )
    dx, dy = F.col("x") - F.col("sx"), F.col("y") - F.col("sy")
    d = pts.join(F.broadcast(sites)).select(
        "point_id",
        F.struct((dx * dx + dy * dy).alias("d2"), F.col("site_id")).alias("c"),
    )
    best = d.groupBy("point_id").agg(F.min("c").alias("c"))
    from pyspark.sql.types import DecimalType

    return (
        best.groupBy(F.col("c.site_id").alias("site_id"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("c.d2").cast(DecimalType(30, 6))).cast("double").alias("sum_d2"),
        )
        .orderBy("site_id")
    )
