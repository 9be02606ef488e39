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


@query("raster_contour_topology")
def raster_contour_topology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image summary of the traced-mask vector layer AFTER it passed
    the topology validators: loop counts/orientation, traced perimeter
    (crack count) and net enclosed area (shoelace sum — equals the fg
    pixel count exactly), plus boundary-duplication and edge-intersection
    error counts from the shared topology engine (both provably zero for
    crack loops: every undirected crack belongs to exactly one loop, and
    unit axis-aligned segments meet only at lattice endpoints). Rows-only
    for the driver; tests/test_raster_vector.py pins perimeter/net_area
    against the ORACLED image_mask_moments twin and checks the planted
    duplicate-ring defect raises DUP_BOUNDARY like the GML path."""
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
