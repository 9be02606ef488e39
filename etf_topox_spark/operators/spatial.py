"""Spatial joins over the cell index (SURVEY.md §2.B J10/J11/J14;
BASELINE.json:14 "point-in-polygon, kNN ... partitioning / shuffle / skew
handled explicitly").

Architecture (the two-stage cell join the north rule demands):
  stage 1  coarse equi-key alignment on (cell, salt): points carry their
           cell, polygons carry their bbox-cover cells replicated over an
           explicit SALT column — the fixtures put 50% of points in one
           cell, and salting spreads that hot cell over SALT reducers;
  stage 2  exact residual evaluated per (cell, salt) group in a cogrouped
           Arrow kernel (X4): integer ray-cast PIP, boundary-inclusive,
           winner = min feature_id (FIXTURES.md §3 tie rule). The winner is
           decided inside the kernel — a point's containers all share its
           cell — so no extra shuffle follows.

kNN is the classic grid search: per-level cogrouped (probe-cell-ring ×
corpus-cell) kernels compute LOCAL top-k with numpy (no exploded candidate
rows through a Spark window — the hot cell would emit 25M of them), a tiny
global window merges per-probe, an exact certification bound (kth distance
≤ (level-1)·min cell extent) gates acceptance, and a brute-force fallback
covers uncertified probes — results are exact, not approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etf_topox_spark.functions import cells as C
from etf_topox_spark.functions.coords import coord_to_int

DEFAULT_SALT = 16


def _flatten_polys(polys: pd.DataFrame):
    """One polygon table per kernel call → flat segment arrays + per-polygon
    segment offsets (so parity aggregates with reduceat, no Python loops
    over points)."""
    segs_x1, segs_y1, segs_x2, segs_y2, bounds = [], [], [], [], [0]
    feats = polys["feature_id"].to_numpy()
    for rings in polys["rings"]:
        n_seg = 0
        for ring in rings:
            xs = np.asarray(ring["xs"], np.float64)
            ys = np.asarray(ring["ys"], np.float64)
            segs_x1.append(xs[:-1]); segs_y1.append(ys[:-1])
            segs_x2.append(xs[1:]);  segs_y2.append(ys[1:])
            n_seg += len(xs) - 1
        bounds.append(bounds[-1] + n_seg)
    return (
        coord_to_int(np.concatenate(segs_x1)),
        coord_to_int(np.concatenate(segs_y1)),
        coord_to_int(np.concatenate(segs_x2)),
        coord_to_int(np.concatenate(segs_y2)),
        np.asarray(bounds[:-1], np.int64),  # reduceat offsets
        feats,
    )


def _pip_group(pts: pd.DataFrame, polys: pd.DataFrame) -> pd.DataFrame:
    """Vectorized boundary-inclusive even-odd PIP of all group points vs all
    group polygons; returns the min-feature winner per contained point."""
    if len(pts) == 0 or len(polys) == 0:
        return pd.DataFrame({"point_id": pd.Series(dtype="int64"),
                             "feature_id": pd.Series(dtype="int64")})
    x1, y1, x2, y2, offs, feats = _flatten_polys(polys)
    qx = coord_to_int(pts["x"].to_numpy())
    qy = coord_to_int(pts["y"].to_numpy())
    n, m, p = len(qx), len(x1), len(feats)

    out_ids, out_feats = [], []
    big = np.int64(2**62)
    for s in range(0, n, 4096):
        e = min(s + 4096, n)
        QX = qx[s:e, None]
        QY = qy[s:e, None]
        cross = (x2 - x1)[None, :] * (QY - y1[None, :]) - (y2 - y1)[None, :] * (QX - x1[None, :])
        on_seg = (
            (cross == 0)
            & (np.minimum(x1, x2)[None, :] <= QX) & (QX <= np.maximum(x1, x2)[None, :])
            & (np.minimum(y1, y2)[None, :] <= QY) & (QY <= np.maximum(y1, y2)[None, :])
        )
        straddle = (y1[None, :] > QY) != (y2[None, :] > QY)
        dy = (y2 - y1)[None, :]
        lhs = (QX - x1[None, :]) * dy
        rhs = (QY - y1[None, :]) * (x2 - x1)[None, :]
        hits = straddle & (((dy > 0) & (lhs < rhs)) | ((dy < 0) & (lhs > rhs)))
        # per-polygon aggregation over contiguous segment blocks
        parity = np.add.reduceat(hits.astype(np.int64), offs, axis=1) % 2 == 1
        boundary = np.add.reduceat(on_seg.astype(np.int64), offs, axis=1) > 0
        inside = parity | boundary  # (chunk, p)
        winner = np.where(inside, feats[None, :], big).min(axis=1)
        got = winner < big
        out_ids.append(pts["point_id"].to_numpy()[s:e][got])
        out_feats.append(winner[got])
    return pd.DataFrame(
        {"point_id": np.concatenate(out_ids), "feature_id": np.concatenate(out_feats)}
    )


def pip_join(
    spark: SparkSession,
    points: DataFrame,  # point_id, x, y
    rings: DataFrame,   # feature_id, ring_idx, is_exterior, xs, ys
    res: int = 8,
    salt: int = DEFAULT_SALT,
    hot_threshold: int = 8_000,
) -> DataFrame:
    """(point_id, feature_id) — winner is the min feature_id among
    boundary-inclusive containers (FIXTURES.md §3 tie rule).

    Skew (J14 / north rule): a recon count over point cells finds hot
    cells; ONLY those are salted (points hashed over `salt` subgroups, the
    polygon side replicated ×salt for those cells alone). Cold cells stay
    one group — no group-count explosion, no polygon write amplification."""
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

    pts = points.withColumn("cell", C.latlng_to_cell_udf(res)("x", "y"))
    hot = (
        pts.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > hot_threshold)
        .select("cell", F.lit(True).alias("is_hot"))
        # eager: the recon result is tiny and broadcast twice; a LAZY local
        # checkpoint evaluated concurrently under two broadcasts can crash
        # the Python worker (segfault observed at 1M points, local[8])
    ).localCheckpoint(eager=True)
    pts_salted = (
        pts.join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"), F.pmod(F.xxhash64("point_id"), F.lit(salt))
            ).otherwise(F.lit(0)),
        )
        .drop("is_hot")
    )
    # NB: explode(when(is_hot, sequence, array(0))) after the broadcast left
    # join segfaults Spark 4.1's Python-worker Arrow reader at ~1M rows —
    # the semi/anti union branches below are the same semantics without the
    # conditional explode
    salts_df = spark.range(salt).select(F.col("id").alias("salt"))
    poly_hot = poly_cells.join(F.broadcast(hot.select("cell")), "cell", "left_semi").crossJoin(
        F.broadcast(salts_df)
    )
    poly_cold = poly_cells.join(
        F.broadcast(hot.select("cell")), "cell", "left_anti"
    ).withColumn("salt", F.lit(0).cast("long"))
    poly_salted = poly_hot.unionByName(poly_cold)

    def kernel(key, p_pdf: pd.DataFrame, g_pdf: pd.DataFrame) -> pd.DataFrame:
        return _pip_group(p_pdf, g_pdf)

    return (
        pts_salted.groupBy("cell", "salt")
        .cogroup(poly_salted.groupBy("cell", "salt"))
        .applyInPandas(kernel, "point_id long, feature_id long")
    )


# --------------------------------------------------------------------------
# J11: exact kNN join via doubling cell-ring expansion
# --------------------------------------------------------------------------

def _knn_group(k: int):
    def kernel(key, probes: pd.DataFrame, corpus: pd.DataFrame) -> pd.DataFrame:
        if len(probes) == 0 or len(corpus) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "dist2": pd.Series(dtype="float64"),
                }
            )
        cx = corpus["cx"].to_numpy()
        cy = corpus["cy"].to_numpy()
        cid = corpus["neighbor_id"].to_numpy()
        out_q, out_n, out_d = [], [], []
        px = probes["x"].to_numpy()
        py = probes["y"].to_numpy()
        qid = probes["query_id"].to_numpy()
        kk = min(k, len(cid))
        for s in range(0, len(px), 128):
            e = min(s + 128, len(px))
            dx = px[s:e, None] - cx[None, :]
            dy = py[s:e, None] - cy[None, :]
            d2 = dx * dx + dy * dy
            if len(cid) > kk:
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                # tie expansion: keep EVERYTHING at ≤ the kth distance so
                # the global merge can tie-break by neighbor_id exactly as
                # the oracle does (argpartition alone picks ties arbitrarily)
                kth = d2[np.arange(e - s)[:, None], part].max(axis=1)
                rows, cols = np.nonzero(d2 <= kth[:, None])
            else:
                rows, cols = np.nonzero(np.ones_like(d2, np.bool_))
            out_q.append(qid[s:e][rows])
            out_n.append(cid[cols])
            out_d.append(d2[rows, cols])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "dist2": np.concatenate(out_d),
            }
        )

    return kernel


def knn_join(
    spark: SparkSession,
    probes: DataFrame,  # point_id, x, y
    corpus: DataFrame,  # point_id, x, y
    k: int = 5,
    res: int = 8,
    # level 1's certification bound is (1-1)*wmin = 0 — nothing certifies,
    # so starting there only burns a pass; 2 then 4 certifies ~everything
    levels: tuple[int, ...] = (2, 4),
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """(query_id, neighbor_id, dist2, rn) with rn ≤ k, ties broken by
    neighbor_id. Exact (certification + brute-force fallback).

    Skew (SURVEY.md §4.3: "salting factor chosen from a cheap
    groupBy(cell).count() recon pass"): a recon aggregation finds cells
    whose corpus population exceeds `hot_threshold`; ONLY those cells are
    salted (corpus split over `salt` subgroups, probe side replicated ×salt
    for those cells alone). Salting everything would multiply the per-group
    kernel overhead across thousands of cold cells; salting nothing leaves
    one straggler task holding the hot cell. The global merge is unchanged
    because each (probe, corpus point) pair still meets exactly once."""
    cell_w = 360.0 / (1 << res)
    cell_h = 180.0 / (1 << res)
    wmin = min(cell_w, cell_h)
    hot_threshold = 8_000

    base = corpus.select(
        F.col("point_id").alias("neighbor_id"),
        F.col("x").alias("cx"),
        F.col("y").alias("cy"),
        C.latlng_to_cell_udf(res)("x", "y").alias("cell"),
    )
    hot = (
        base.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > hot_threshold)
        .select("cell", F.lit(True).alias("is_hot"))
    ).localCheckpoint(eager=True)
    corp = (
        base.join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"), F.pmod(F.xxhash64("neighbor_id"), F.lit(salt))
            ).otherwise(F.lit(0)),
        )
        .drop("is_hot")
    ).localCheckpoint(eager=False)
    salts_df = probes.sparkSession.range(salt).select(F.col("id").alias("salt"))
    pr = probes.select(
        F.col("point_id").alias("query_id"), "x", "y",
        C.latlng_to_cell_udf(res)("x", "y").alias("pcell"),
    )

    dist2_col = (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) + (
        F.col("y") - F.col("cy")
    ) * (F.col("y") - F.col("cy"))
    win = W.partitionBy("query_id").orderBy("dist2", "neighbor_id")

    results = None
    pending = pr
    for lvl in levels:
        ring = C.cell_ring_udf(lvl)
        ringed = pending.withColumn("cell", F.explode(ring("pcell")))
        # same union-branch shape as pip_join (conditional explode after a
        # broadcast left join crashes the Arrow worker at scale)
        ring_hot = ringed.join(
            F.broadcast(hot.select("cell")), "cell", "left_semi"
        ).crossJoin(F.broadcast(salts_df))
        ring_cold = ringed.join(
            F.broadcast(hot.select("cell")), "cell", "left_anti"
        ).withColumn("salt", F.lit(0).cast("long"))
        exploded = ring_hot.unionByName(ring_cold)
        # local top-k inside each (cell, salt) group (numpy); tiny merge after
        local = (
            exploded.groupBy("cell", "salt")
            .cogroup(corp.groupBy("cell", "salt"))
            .applyInPandas(_knn_group(k), "query_id long, neighbor_id long, dist2 double")
        )
        cand = (
            local.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
        )
        safe_r2 = ((lvl - 1) * wmin) ** 2
        per_q = cand.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("found"), F.max("dist2").alias("dk")
        )
        done_q = per_q.filter(
            (F.col("found") == k) & (F.col("dk") <= F.lit(safe_r2))
        ).select("query_id")
        got = cand.join(done_q, "query_id").select("query_id", "neighbor_id", "dist2", "rn")
        results = got if results is None else results.unionByName(got)
        pending = pending.join(done_q, ["query_id"], "left_anti").localCheckpoint(
            eager=False
        )

    # exact fallback for uncertified probes (rare by construction)
    brute = (
        pending.crossJoin(corp.drop("cell"))
        .withColumn("dist2", dist2_col)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "dist2", "rn")
    )
    return results.unionByName(brute)
