"""Spatial joins over the cell index (SURVEY.md §2.B J10/J11/J14;
BASELINE.json:14 "point-in-polygon, kNN ... partitioning / shuffle / skew
handled explicitly").

Architecture (the two-stage cell join the north rule demands):
  stage 1  coarse equi-join on cell ids — points carry their cell, polygons
           carry their bbox-cover cells, both sides carry an explicit SALT
           column so one hot cell (the fixtures put 50% of points in one
           cell) spreads over SALT reducers instead of one;
  stage 2  exact residual evaluated in an Arrow kernel: integer ray-cast
           PIP (boundary-inclusive, winner = min feature_id per the
           FIXTURES.md §3 tie rule), entirely sign tests on scaled int64.

kNN is the classic grid search: cell-ring candidate join at doubling
expansion levels, per-probe top-k by window, with an exact stopping bound
(kth distance ≤ (level-1)·min cell extent) and a brute-force fallback for
any probe the grid can't certify — so results are exact, not approximate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etf_topox_spark.functions import cells as C
from etf_topox_spark.functions.coords import coord_to_int

DEFAULT_SALT = 8


# --------------------------------------------------------------------------
# exact PIP predicate (numpy, ragged candidate batches)
# --------------------------------------------------------------------------

def _pip_batch(px: np.ndarray, py: np.ndarray, rings_col) -> np.ndarray:
    """Boundary-inclusive even-odd test per candidate row. rings_col is a
    sequence of lists of {'xs': [...], 'ys': [...]} (all rings of the
    feature). All decisions are int64 sign tests."""
    seg_row: list[np.ndarray] = []
    X1: list[np.ndarray] = []
    Y1: list[np.ndarray] = []
    X2: list[np.ndarray] = []
    Y2: list[np.ndarray] = []
    for i, rings in enumerate(rings_col):
        for ring in rings:
            xs = np.asarray(ring["xs"], np.float64)
            ys = np.asarray(ring["ys"], np.float64)
            X1.append(xs[:-1]); Y1.append(ys[:-1])
            X2.append(xs[1:]);  Y2.append(ys[1:])
            seg_row.append(np.full(len(xs) - 1, i, np.int64))
    if not seg_row:
        return np.zeros(len(px), np.bool_)
    rows = np.concatenate(seg_row)
    x1 = coord_to_int(np.concatenate(X1)); y1 = coord_to_int(np.concatenate(Y1))
    x2 = coord_to_int(np.concatenate(X2)); y2 = coord_to_int(np.concatenate(Y2))
    qx = coord_to_int(px)[rows]
    qy = coord_to_int(py)[rows]

    # boundary: collinear and within bbox (inclusive)
    cross = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
    on_seg = (
        (cross == 0)
        & (np.minimum(x1, x2) <= qx) & (qx <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= qy) & (qy <= np.maximum(y1, y2))
    )

    # even-odd ray cast to +x: edge straddles the horizontal line through q
    straddle = (y1 > qy) != (y2 > qy)
    dy = y2 - y1
    lhs = (qx - x1) * dy
    rhs = (qy - y1) * (x2 - x1)
    hits = straddle & (((dy > 0) & (lhs < rhs)) | ((dy < 0) & (lhs > rhs)))

    n = len(px)
    inside = (np.bincount(rows, weights=hits.astype(np.int64), minlength=n).astype(np.int64) % 2) == 1
    boundary = np.bincount(rows, weights=on_seg.astype(np.int64), minlength=n) > 0
    return inside | boundary


# --------------------------------------------------------------------------
# J10: point-in-polygon join
# --------------------------------------------------------------------------

def pip_join(
    spark: SparkSession,
    points: DataFrame,  # point_id, x, y
    rings: DataFrame,   # feature_id, ring_idx, is_exterior, xs, ys
    res: int = 8,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """(point_id, feature_id) — winner is the min feature_id among
    boundary-inclusive containers (FIXTURES.md §3 tie rule)."""
    polys = rings.groupBy("feature_id").agg(
        F.collect_list(F.struct("xs", "ys")).alias("rings"),
        F.min(F.array_min("xs")).alias("xmin"),
        F.min(F.array_min("ys")).alias("ymin"),
        F.max(F.array_max("xs")).alias("xmax"),
        F.max(F.array_max("ys")).alias("ymax"),
    )
    cover = C.bbox_cover_udf(res)
    poly_cells = polys.withColumn(
        "cell", F.explode(cover("xmin", "ymin", "xmax", "ymax"))
    ).drop("xmin", "ymin", "xmax", "ymax")
    # explicit skew salting (J14 / north rule): replicate the polygon side
    # ×salt, split the point side by a hash — the hot cell's rows land on
    # `salt` reducers instead of one
    poly_salted = poly_cells.crossJoin(
        spark.range(salt).select(F.col("id").alias("salt"))
    )
    pts = points.withColumn("cell", C.latlng_to_cell_udf(res)("x", "y")).withColumn(
        "salt", F.pmod(F.xxhash64("point_id"), F.lit(salt))
    )
    cand = pts.join(poly_salted, ["cell", "salt"]).select(
        "point_id", "x", "y", "feature_id", "rings"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = _pip_batch(
                pdf["x"].to_numpy(), pdf["y"].to_numpy(), pdf["rings"].to_list()
            )
            yield pdf.loc[keep, ["point_id", "feature_id"]]

    hits = cand.mapInPandas(kernel, "point_id long, feature_id long")
    return hits.groupBy("point_id").agg(F.min("feature_id").alias("feature_id"))


# --------------------------------------------------------------------------
# J11: exact kNN join via doubling cell-ring expansion
# --------------------------------------------------------------------------

def knn_join(
    spark: SparkSession,
    probes: DataFrame,  # point_id, x, y
    corpus: DataFrame,  # point_id, x, y
    k: int = 5,
    res: int = 8,
    levels: tuple[int, ...] = (1, 2, 4),
) -> DataFrame:
    """(query_id, neighbor_id, dist2, rn) with rn ≤ k, ties broken by
    neighbor_id. Exact: a probe's result is accepted only when its kth
    distance is certified against the unexplored-cell bound; leftovers fall
    back to a brute-force cross join (rare by construction)."""
    cell_w = 360.0 / (1 << res)
    cell_h = 180.0 / (1 << res)
    wmin = min(cell_w, cell_h)

    corp = corpus.select(
        F.col("point_id").alias("neighbor_id"),
        F.col("x").alias("cx"),
        F.col("y").alias("cy"),
        C.latlng_to_cell_udf(res)("x", "y").alias("cell"),
    ).localCheckpoint(eager=False)
    pr = probes.select(
        F.col("point_id").alias("query_id"), "x", "y",
        C.latlng_to_cell_udf(res)("x", "y").alias("pcell"),
    )

    dist2 = (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) + (
        F.col("y") - F.col("cy")
    ) * (F.col("y") - F.col("cy"))
    win = W.partitionBy("query_id").orderBy("dist2", "neighbor_id")

    results = None
    pending = pr
    for lvl in levels:
        ring = C.cell_ring_udf(lvl)
        cand = (
            pending.withColumn("cell", F.explode(ring("pcell")))
            .join(corp, "cell")
            .withColumn("dist2", dist2)
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
        )
        # certification: kth distance (or missing candidates) vs the ring
        # guarantee — anything within (lvl-1)*wmin of the probe is covered
        safe_r2 = ((lvl - 1) * wmin) ** 2
        per_q = cand.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("found"), F.max("dist2").alias("dk")
        )
        done_q = per_q.filter(
            (F.col("found") == k) & (F.col("dk") <= F.lit(safe_r2))
        ).select("query_id")
        got = cand.join(done_q, "query_id").select(
            "query_id", "neighbor_id", "dist2", "rn"
        )
        results = got if results is None else results.unionByName(got)
        pending = pending.join(done_q, ["query_id"], "left_anti")
        pending = pending.localCheckpoint(eager=False)

    # exact fallback for uncertified probes (hot-cell edge cases)
    brute = (
        pending.crossJoin(corp.drop("cell"))
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "dist2", "rn")
    )
    return results.unionByName(brute)
