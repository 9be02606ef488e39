"""Spatial joins over the cell index (SURVEY.md §2.B J10/J11/J14;
BASELINE.json:14 "point-in-polygon, kNN ... partitioning / shuffle / skew
handled explicitly").

Architecture (the two-stage cell join the north rule demands):
  stage 1  coarse equi-key alignment on (cell, salt): points carry their
           cell, polygons carry their bbox-cover cells replicated over an
           explicit SALT column — the fixtures put 50% of points in one
           cell, and salting spreads that hot cell over SALT reducers;
  stage 2  exact residual evaluated per (cell, salt) group in a union-regrouped
           Arrow kernel (X4): integer ray-cast PIP, boundary-inclusive,
           winner = min feature_id (FIXTURES.md §3 tie rule). The winner is
           decided inside the kernel — a point's containers all share its
           cell — so no extra shuffle follows.

kNN is the classic grid search: per-level union-regrouped (probe-cell-ring ×
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


def _pack_segs(xs_list, ys_list) -> bytes:
    """Serialize a feature's ring segments into one int64 buffer
    [x1|y1|x2|y2] (coords int-scaled). Binary columns keep the cogroup
    exchange on primitive Arrow types — Spark 4.1's cogroup Arrow reader
    segfaults on list-of-struct-of-list columns (observed; the reason the
    shuffle path ships packed bytes, not nested rings)."""
    sx1, sy1, sx2, sy2 = [], [], [], []
    for xs, ys in zip(xs_list, ys_list):
        xs = np.asarray(xs, np.float64)
        ys = np.asarray(ys, np.float64)
        sx1.append(xs[:-1]); sy1.append(ys[:-1])
        sx2.append(xs[1:]);  sy2.append(ys[1:])
    arr = np.concatenate(
        [coord_to_int(np.concatenate(c)) for c in (sx1, sy1, sx2, sy2)]
    )
    return arr.astype("<i8").tobytes()


def _flatten_polys(polys: pd.DataFrame):
    """One packed-polygon table per kernel call → flat segment arrays +
    per-polygon reduceat offsets (no Python loops over points)."""
    feats = polys["feature_id"].to_numpy()
    bufs = [np.frombuffer(b, dtype="<i8").reshape(4, -1) for b in polys["segs"]]
    counts = np.asarray([b.shape[1] for b in bufs], np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return (
        np.concatenate([b[0] for b in bufs]),
        np.concatenate([b[1] for b in bufs]),
        np.concatenate([b[2] for b in bufs]),
        np.concatenate([b[3] for b in bufs]),
        offs,
        feats,
    )


PACKED_POLY_SCHEMA = (
    "feature_id long, xmin double, ymin double, xmax double, ymax double, segs binary"
)


def pack_features(rings: DataFrame) -> DataFrame:
    """rings → one row per feature: bbox + packed segment buffer (the flat
    form both spatial-join strategies and the cogroup exchange use).

    Partition-on-feature + one mapInPandas call per partition, re-grouping
    locally: groupBy().applyInPandas pays ~1 ms Arrow/invoke overhead per
    GROUP (measured), which at millions of features would dominate the
    actual packing work. The exchange still co-locates each feature."""

    def part_kernel(batches):
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        fids = pdf["feature_id"].to_numpy()
        order = np.argsort(fids, kind="stable")
        fids = fids[order]
        xs_vals = pdf["xs"].to_numpy()[order]
        ys_vals = pdf["ys"].to_numpy()[order]
        uniq, starts = np.unique(fids, return_index=True)
        bounds = np.append(starts, len(fids))
        recs = []
        for g, fid in enumerate(uniq):
            sl = slice(bounds[g], bounds[g + 1])
            xs_all = [np.asarray(x, np.float64) for x in xs_vals[sl]]
            ys_all = [np.asarray(y, np.float64) for y in ys_vals[sl]]
            recs.append((
                int(fid),
                min(x.min() for x in xs_all),
                min(y.min() for y in ys_all),
                max(x.max() for x in xs_all),
                max(y.max() for y in ys_all),
                _pack_segs(xs_vals[sl], ys_vals[sl]),
            ))
        yield pd.DataFrame(
            recs, columns=["feature_id", "xmin", "ymin", "xmax", "ymax", "segs"]
        )

    n_parts = int(rings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return rings.repartition(n_parts, "feature_id").mapInPandas(
        part_kernel, PACKED_POLY_SCHEMA
    )


_PIP_BIG = np.int64(2**62)


def _pip_winner(qx: np.ndarray, qy: np.ndarray, segs) -> np.ndarray:
    """Exact boundary-inclusive even-odd PIP of int-scaled query points vs a
    flattened segment set; returns the min-feature winner per point
    (_PIP_BIG where not contained). Chunked so the (chunk × m) int64
    temporaries stay cache-resident. Shared by the cogroup kernel and the
    broadcast mapInPandas kernel — one residual, two shuffle strategies."""
    x1, y1, x2, y2, offs, feats = segs
    n = len(qx)
    winner = np.full(n, _PIP_BIG, dtype=np.int64)
    # ~6 temporaries of chunk*m int64: keep them under ~4 MiB total
    m = max(len(x1), 1)
    chunk = max(64, min(4096, (4 * 1024 * 1024) // (8 * 6 * m) or 64))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
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
        winner[s:e] = np.where(inside, feats[None, :], _PIP_BIG).min(axis=1)
    return winner


def _pip_group(pts: pd.DataFrame, polys: pd.DataFrame) -> pd.DataFrame:
    """Vectorized boundary-inclusive even-odd PIP of all group points vs all
    group polygons; returns the min-feature winner per contained point."""
    if len(pts) == 0 or len(polys) == 0:
        return pd.DataFrame({"point_id": pd.Series(dtype="int64"),
                             "feature_id": pd.Series(dtype="int64")})
    segs = _flatten_polys(polys)
    qx = coord_to_int(pts["x"].to_numpy())
    qy = coord_to_int(pts["y"].to_numpy())
    winner = _pip_winner(qx, qy, segs)
    got = winner < _PIP_BIG
    return pd.DataFrame(
        {"point_id": pts["point_id"].to_numpy()[got], "feature_id": winner[got]}
    )


def _collect_cell_index(rings: DataFrame, res: int):
    """Driver-side cell→flattened-segments index for the broadcast PIP
    strategy. Returns {cell: (x1, y1, x2, y2, reduceat_offsets, feats)}
    with int-scaled coords — the same exact arithmetic as the cogroup
    kernel, so both strategies are value-identical.

    Bulk numpy build: ring coords flatten into ONE array, segments fall out
    of two boolean masks (drop each ring's last point for p1 / first for
    p2), per-feature bboxes are reduceat folds, the cell cover is the
    repeat/arange grid expansion, and the per-(cell, feature) segment
    gather is one fancy-index — no per-ring or per-feature Python loop, so
    raising broadcast_max_vertices no longer raises driver build time
    superlinearly (round-2 review note)."""
    pdf = (
        rings.select("feature_id", "xs", "ys")
        .toPandas()
        .sort_values("feature_id", kind="mergesort", ignore_index=True)
    )
    if len(pdf) == 0:
        return {}
    xs_list = [np.asarray(a, np.float64) for a in pdf["xs"]]
    ys_list = [np.asarray(a, np.float64) for a in pdf["ys"]]
    lens = np.fromiter((len(a) for a in xs_list), np.int64, len(xs_list))
    keep = lens > 0
    if not keep.all():
        xs_list = [a for a, k in zip(xs_list, keep) if k]
        ys_list = [a for a, k in zip(ys_list, keep) if k]
        pdf = pdf[keep].reset_index(drop=True)
        lens = lens[keep]
    fx = np.concatenate(xs_list)
    fy = np.concatenate(ys_list)
    ax, ay = coord_to_int(fx), coord_to_int(fy)
    row_fid = pdf["feature_id"].to_numpy()
    pt_ends = np.cumsum(lens)
    pt_starts = pt_ends - lens
    # per-ring segments from the flat arrays: p1 drops ring-last, p2 ring-first
    m1 = np.ones(pt_ends[-1], bool); m1[pt_ends - 1] = False
    m2 = np.ones(pt_ends[-1], bool); m2[pt_starts] = False
    x1, y1, x2, y2 = ax[m1], ay[m1], ax[m2], ay[m2]
    # feature row-groups (rows sorted by feature_id → segments are
    # feature-contiguous in the flat segment arrays)
    f_row_starts = np.flatnonzero(
        np.concatenate(([True], row_fid[1:] != row_fid[:-1]))
    )
    f_row_ends = np.concatenate((f_row_starts[1:], [len(row_fid)]))
    fids = row_fid[f_row_starts]
    seg_cum = np.concatenate(([0], np.cumsum(lens - 1)))
    seg_start_f = seg_cum[f_row_starts]
    seg_cnt_f = seg_cum[f_row_ends] - seg_start_f
    # per-feature bbox over the flat float coords
    f_pt_starts = np.concatenate(([0], pt_ends))[f_row_starts]
    xmin = np.minimum.reduceat(fx, f_pt_starts)
    xmax = np.maximum.reduceat(fx, f_pt_starts)
    ymin = np.minimum.reduceat(fy, f_pt_starts)
    ymax = np.maximum.reduceat(fy, f_pt_starts)
    # vectorized bbox cover (the grid expansion bbox_cover loops per box)
    n = np.int64(1) << np.int64(res)
    cx0 = np.clip(np.floor((xmin + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    cx1 = np.clip(np.floor((xmax + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    cy0 = np.clip(np.floor((ymin + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    cy1 = np.clip(np.floor((ymax + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    ch = cy1 - cy0 + 1
    cnt = (cx1 - cx0 + 1) * ch
    tot = int(cnt.sum())
    ofs = np.cumsum(cnt) - cnt
    k = np.arange(tot, dtype=np.int64) - np.repeat(ofs, cnt)
    gx = np.repeat(cx0, cnt) + k // np.repeat(ch, cnt)
    gy = np.repeat(cy0, cnt) + k % np.repeat(ch, cnt)
    pair_cell = C._xy_to_cell(gx.astype(np.uint64), gy.astype(np.uint64), res)
    pair_feat = np.repeat(np.arange(len(fids), dtype=np.int64), cnt)
    # sort pairs by cell, gather each pair's segment range with one index
    order = np.argsort(pair_cell, kind="stable")
    pc, pf = pair_cell[order], pair_feat[order]
    pcnt = seg_cnt_f[pf]
    pofs = np.cumsum(pcnt) - pcnt
    big = (
        np.arange(int(pcnt.sum()), dtype=np.int64)
        - np.repeat(pofs, pcnt)
        + np.repeat(seg_start_f[pf], pcnt)
    )
    gx1, gy1, gx2, gy2 = x1[big], y1[big], x2[big], y2[big]
    cell_starts = np.flatnonzero(np.concatenate(([True], pc[1:] != pc[:-1])))
    cell_ends = np.concatenate((cell_starts[1:], [len(pc)]))
    index = {}
    for s, e in zip(cell_starts, cell_ends):
        o0 = pofs[s]
        o1 = pofs[e - 1] + pcnt[e - 1]
        index[int(pc[s])] = (
            gx1[o0:o1], gy1[o0:o1], gx2[o0:o1], gy2[o0:o1],
            (pofs[s:e] - o0).astype(np.int64),
            fids[pf[s:e]],
        )
    return index


def pip_join_broadcast(
    spark: SparkSession,
    points: DataFrame,  # point_id, x, y
    rings: DataFrame,   # feature_id, ring_idx, is_exterior, xs, ys
    res: int = 8,
) -> DataFrame:
    """Shuffle-free PIP: the polygon side is a dim table, so broadcast a
    cell→segments index and evaluate the exact residual per point partition
    with mapInPandas. No shuffle → no hot-cell skew, no stragglers, and
    throughput scales with cores/executors (the broadcast half of the north
    rule's two-stage broadcast/shuffle join; Spark's own BHJ-vs-SMJ choice,
    lifted to the spatial kernel)."""
    index = _collect_cell_index(rings, res)
    bc = spark.sparkContext.broadcast(index)

    def kernel(batches):
        idx = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qx_f = pdf["x"].to_numpy()
            qy_f = pdf["y"].to_numpy()
            cells = C.latlng_to_cell(qx_f, qy_f, res)
            qx = coord_to_int(qx_f)
            qy = coord_to_int(qy_f)
            pid = pdf["point_id"].to_numpy()
            order = np.argsort(cells, kind="stable")
            cs = cells[order]
            starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
            ends = np.concatenate((starts[1:], [len(cs)]))
            out_ids, out_feats = [], []
            for s, e in zip(starts, ends):
                segs = idx.get(int(cs[s]))
                if segs is None:
                    continue
                sel = order[s:e]
                winner = _pip_winner(qx[sel], qy[sel], segs)
                got = winner < _PIP_BIG
                out_ids.append(pid[sel][got])
                out_feats.append(winner[got])
            if out_ids:
                yield pd.DataFrame(
                    {
                        "point_id": np.concatenate(out_ids),
                        "feature_id": np.concatenate(out_feats),
                    }
                )

    return points.mapInPandas(kernel, "point_id long, feature_id long")


def pip_join(
    spark: SparkSession,
    points: DataFrame,  # point_id, x, y
    rings: DataFrame,   # feature_id, ring_idx, is_exterior, xs, ys
    res: int = 8,
    salt: int = DEFAULT_SALT,
    hot_threshold: int = 8_000,
    strategy: str = "auto",
    broadcast_max_vertices: int = 2_000_000,
) -> DataFrame:
    """(point_id, feature_id) — winner is the min feature_id among
    boundary-inclusive containers (FIXTURES.md §3 tie rule).

    Strategy (the north rule's two-stage broadcast/shuffle join):
    - 'broadcast' — polygon side collected to a cell index and broadcast;
      points stream through mapInPandas with NO shuffle. Chosen
      automatically when total polygon vertices ≤ broadcast_max_vertices
      (same decision Spark's planner makes for broadcast-hash joins).
    - 'shuffle' — both sides shuffled on (cell, salt) through one tagged
      union into a partition-level kernel (regrouped locally); survives
      polygon sides too big for any one executor's memory.

    Skew (J14, shuffle path): a recon count over point cells finds hot
    cells; ONLY those are salted (points hashed over `salt` subgroups, the
    polygon side replicated ×salt for those cells alone). Cold cells stay
    one group — no group-count explosion, no polygon write amplification.
    The broadcast path needs no salting at all: points never shuffle, so a
    hot cell is just rows spread over whatever partitions they arrived in."""
    if strategy == "auto":
        n_verts = rings.agg(F.sum(F.size("xs"))).collect()[0][0] or 0
        strategy = "broadcast" if n_verts <= broadcast_max_vertices else "shuffle"
    if strategy == "broadcast":
        return pip_join_broadcast(spark, points, rings, res)

    polys = pack_features(rings)
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

    # tagged union instead of cogroup: ONE (cell, salt) exchange, then a
    # partition kernel that re-groups locally — cogrouped applyInPandas
    # pays ~1 ms Arrow/invoke overhead per GROUP, which at #occupied-cells
    # group counts dominates (see SCALE.md §2 per-group overhead). ids stay
    # exact: int64 with nulls coerces to float64 in pandas, lossless below
    # 2^53 (point/feature ids — asserted in the kernel).
    tagged = pts_salted.select(
        "cell",
        "salt",
        F.lit(0).alias("kind"),
        "point_id",
        "x",
        "y",
        F.lit(None).cast("long").alias("feature_id"),
        F.lit(None).cast("binary").alias("segs"),
    ).unionByName(
        poly_salted.select(
            "cell",
            "salt",
            F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("point_id"),
            F.lit(None).cast("double").alias("x"),
            F.lit(None).cast("double").alias("y"),
            "feature_id",
            "segs",
        )
    )

    def part_kernel(batches):
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        for _, g in pdf.groupby(["cell", "salt"], sort=False):
            pts_g = g[g["kind"] == 0]
            polys_g = g[g["kind"] == 1]
            if len(pts_g) == 0 or len(polys_g) == 0:
                continue
            pid = pts_g["point_id"].to_numpy()
            fid = polys_g["feature_id"].to_numpy()
            # exactness guard must survive python -O (asserts strip there)
            if not ((np.abs(pid) < 2**53).all() and (np.abs(fid) < 2**53).all()):
                raise ValueError("pip ids exceed float64-exact range (2^53)")
            out = _pip_group(
                pd.DataFrame({
                    "point_id": pid.astype(np.int64),
                    "x": pts_g["x"].to_numpy(),
                    "y": pts_g["y"].to_numpy(),
                }),
                pd.DataFrame({
                    "feature_id": fid.astype(np.int64),
                    "segs": polys_g["segs"].to_numpy(),
                }),
            )
            if len(out):
                yield out

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return tagged.repartition(n_parts, "cell", "salt").mapInPandas(
        part_kernel, "point_id long, feature_id long"
    )


# --------------------------------------------------------------------------
# J11: exact kNN join via doubling cell-ring expansion
# --------------------------------------------------------------------------

def _knn_pairs(
    qid: np.ndarray, px: np.ndarray, py: np.ndarray,
    cid: np.ndarray, cx: np.ndarray, cy: np.ndarray, k: int,
) -> pd.DataFrame:
    """Local top-k (with tie expansion) of one group's probes vs corpus."""
    out_q, out_n, out_d = [], [], []
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


def knn_join_broadcast(
    spark: SparkSession,
    probes: DataFrame,  # point_id, x, y
    corpus: DataFrame,  # point_id, x, y
    k: int = 5,
    res: int = 8,
    levels: tuple[int, ...] = (2, 4),
) -> DataFrame:
    """Shuffle-free exact kNN: the corpus is collected into a cell-sorted
    index, broadcast once, and every probe partition runs the full
    ring-expansion + certification + brute-force-fallback loop LOCALLY in
    numpy — one Spark job instead of the shuffle path's per-level
    join/window chain. Value-identical to knn_join(strategy='shuffle'):
    same tie rule (order by dist2 then neighbor_id), same certification
    bound ((level-1)·min cell extent)."""
    cell_w = 360.0 / (1 << res)
    cell_h = 180.0 / (1 << res)
    wmin = min(cell_w, cell_h)

    cdf = corpus.select("point_id", "x", "y").toPandas()  # Arrow path, no per-Row loop
    nid = cdf["point_id"].to_numpy(np.int64)
    cx = cdf["x"].to_numpy(np.float64)
    cy = cdf["y"].to_numpy(np.float64)
    ccell = C.latlng_to_cell(cx, cy, res)
    order = np.lexsort((nid, ccell))
    nid, cx, cy, ccell = nid[order], cx[order], cy[order], ccell[order]
    ucells = np.unique(ccell)
    # adaptive sub-resolution index for dense (hot) cells: a probe in a
    # 100k-point cell would otherwise top-k against ALL of them (~5 MB of
    # DRAM traffic per probe — measured to collapse multi-core scaling).
    # Points of each dense cell are re-indexed SUB_RES_DELTA levels finer;
    # the kernel ring-searches the fine grid first and certifies against
    # min(ring radius, distance to the coarse cell boundary).
    dense: dict = {}
    lo_all = np.searchsorted(ccell, ucells, side="left")
    hi_all = np.searchsorted(ccell, ucells, side="right")
    for cell, lo, hi in zip(ucells, lo_all, hi_all):
        if hi - lo <= KNN_DENSE_THRESHOLD:
            continue
        # deepen until the densest subcell is actually split — a
        # point-mass cluster (e.g. the fixtures' 0.008° hot spot) sails
        # straight through any fixed sub-resolution
        delta = KNN_SUB_RES_DELTA
        while delta < 30 - res:
            sub = C.latlng_to_cell(cx[lo:hi], cy[lo:hi], res + delta)
            _, counts = np.unique(sub, return_counts=True)
            if counts.max() <= KNN_DENSE_THRESHOLD:
                break
            delta += 3
        so = np.lexsort((nid[lo:hi], sub))
        dense[int(cell)] = (
            sub[so], cx[lo:hi][so], cy[lo:hi][so], nid[lo:hi][so], delta
        )
    bc = spark.sparkContext.broadcast((ucells, ccell, cx, cy, nid, dense))

    def kernel(batches):
        idx = bc.value
        for pdf in batches:
            out = _knn_partition(pdf, idx, k, res, levels, wmin)
            if out is not None:
                yield out

    return probes.mapInPandas(
        kernel, "query_id long, neighbor_id long, dist2 double, rn int"
    )


def _knn_topk_block(px, py, qid, gx, gy, gid, k):
    """Exact top-k of each probe vs the gathered candidate block;
    returns (query_id, neighbor_id, dist2, rn) arrays, ties by id."""
    out = []
    m = max(len(gx), 1)
    chunk = max(16, min(2048, (4 * 1024 * 1024) // (8 * 3 * m) or 16))
    for s in range(0, len(px), chunk):
        e = min(s + chunk, len(px))
        dx = px[s:e, None] - gx[None, :]
        dy = py[s:e, None] - gy[None, :]
        d2 = dx * dx + dy * dy
        kk = min(k, d2.shape[1])
        if d2.shape[1] > kk:
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            kth = d2[np.arange(e - s)[:, None], part].max(axis=1)
            rows_, cols = np.nonzero(d2 <= kth[:, None])
        else:
            rows_, cols = np.nonzero(np.ones_like(d2, np.bool_))
        out.append((qid[s:e][rows_], gid[cols], d2[rows_, cols]))
    q = np.concatenate([o[0] for o in out])
    n_ = np.concatenate([o[1] for o in out])
    d_ = np.concatenate([o[2] for o in out])
    # rank by (query, dist2, neighbor_id) and keep rn <= k
    oo = np.lexsort((n_, d_, q))
    q, n_, d_ = q[oo], n_[oo], d_[oo]
    starts = np.flatnonzero(np.concatenate(([True], q[1:] != q[:-1])))
    rn = np.arange(len(q)) - np.repeat(starts, np.diff(np.concatenate((starts, [len(q)])))) + 1
    keep = rn <= k
    return q[keep], n_[keep], d_[keep], rn[keep]


KNN_DENSE_THRESHOLD = 4_000
KNN_SUB_RES_DELTA = 5  # dense cells re-indexed 32× finer per axis


def _knn_fine_pass(gpx, gpy, gqid, fine, k, res, wmin, cell):
    """Dense-cell pre-pass: ring-search the cell's sub-resolution index.
    Returns (outs, certified_mask). Certification radius is capped by each
    probe's distance to the coarse-cell boundary — the fine index only
    holds THIS cell's points, so beyond that distance the gathered set is
    not guaranteed complete."""
    fcc, fcx, fcy, fnid, delta = fine
    res2 = res + delta
    wmin2 = wmin / (1 << delta)
    lonmin, latmin, lonmax, latmax = C.cell_bounds(np.array([cell]))
    dbound = np.minimum.reduce(
        [gpx - lonmin[0], lonmax[0] - gpx, gpy - latmin[0], latmax[0] - gpy]
    )
    pfine = C.latlng_to_cell(gpx, gpy, res2)
    forder = np.argsort(pfine, kind="stable")
    pf = pfine[forder]
    fstarts = np.flatnonzero(np.concatenate(([True], pf[1:] != pf[:-1])))
    fends = np.concatenate((fstarts[1:], [len(pf)]))
    outs = []
    certified = np.zeros(len(gpx), np.bool_)
    for fs, fe in zip(fstarts, fends):
        fsel = forder[fs:fe]
        fsel = fsel[np.argsort(gqid[fsel], kind="stable")]
        sqid = gqid[fsel]
        pend = np.ones(len(fsel), np.bool_)
        for lvl in (2, 4, 8):
            if not pend.any():
                break
            ring = C.cell_ring(np.array([pf[fs]]), lvl)[0]
            cells = np.unique(ring)
            cells = cells[cells >= 0]
            lo = np.searchsorted(fcc, cells, side="left")
            hi = np.searchsorted(fcc, cells, side="right")
            if not (hi - lo).sum():
                continue
            cand = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)])
            if len(cand) < k:
                continue
            q, n_, d_, rn = _knn_topk_block(
                gpx[fsel][pend], gpy[fsel][pend], sqid[pend],
                fcx[cand], fcy[cand], fnid[cand], k,
            )
            spend = sqid[pend]
            pos = np.searchsorted(spend, q)
            cnt = np.bincount(pos, minlength=len(spend))
            dk = np.full(len(spend), -np.inf)
            np.maximum.at(dk, pos, d_)
            safe_r = np.minimum((lvl - 1) * wmin2, dbound[fsel][pend])
            ok = (cnt >= k) & (dk <= safe_r * safe_r)
            if ok.any():
                keep = ok[pos]
                outs.append((q[keep], n_[keep], d_[keep], rn[keep]))
            idx_p = np.flatnonzero(pend)
            pend[idx_p[ok]] = False
        certified[fsel[~pend]] = True
    return outs, certified


def _knn_partition(pdf, idx, k, res, levels, wmin):
    """One probe partition vs the broadcast corpus index — module-level so
    it can be unit-profiled outside Spark."""
    ucells_, ccell_, cx_, cy_, nid_, dense_ = idx
    if len(pdf) == 0:
        return None

    def gather(cells):
        """Corpus rows whose cell is in `cells` (sorted searchsorted)."""
        cells = cells[cells >= 0]
        lo = np.searchsorted(ccell_, cells, side="left")
        hi = np.searchsorted(ccell_, cells, side="right")
        if not len(lo):
            return np.empty(0, np.int64)
        return np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)]) \
            if (hi - lo).sum() else np.empty(0, np.int64)

    px = pdf["x"].to_numpy()
    py = pdf["y"].to_numpy()
    qid = pdf["point_id"].to_numpy()
    pcell = C.latlng_to_cell(px, py, res)
    porder = np.argsort(pcell, kind="stable")
    pc = pcell[porder]
    starts = np.flatnonzero(np.concatenate(([True], pc[1:] != pc[:-1])))
    ends = np.concatenate((starts[1:], [len(pc)]))
    outs = []
    for s, e in zip(starts, ends):
        sel = porder[s:e]
        # sort the group by query_id so searchsorted-based certification
        # grouping below is valid
        sel = sel[np.argsort(qid[sel], kind="stable")]
        gpx, gpy, gqid = px[sel], py[sel], qid[sel]
        pending = np.ones(len(sel), np.bool_)
        fine = dense_.get(int(pc[s]))
        if fine is not None:
            fouts, cert = _knn_fine_pass(gpx, gpy, gqid, fine, k, res, wmin, pc[s])
            outs.extend(fouts)
            pending[cert] = False
        for lvl in levels:
            if not pending.any():
                break
            ring = C.cell_ring(np.array([pc[s]]), lvl)[0]
            cand = gather(np.unique(ring))
            if len(cand) < k:
                continue
            q, n_, d_, rn = _knn_topk_block(
                gpx[pending], gpy[pending], gqid[pending],
                cx_[cand], cy_[cand], nid_[cand], k,
            )
            # certified: found k AND kth distance within the ring's
            # guaranteed-covered radius
            safe_r2 = ((lvl - 1) * wmin) ** 2
            cnt = np.bincount(
                np.searchsorted(gqid[pending], q), minlength=pending.sum()
            )
            # -inf so maximum.at yields the true kth distance; probes with
            # no rows stay -inf but are rejected by cnt >= k
            dk = np.full(int(pending.sum()), -np.inf)
            np.maximum.at(dk, np.searchsorted(gqid[pending], q), d_)
            ok = (cnt >= k) & (dk <= safe_r2)
            if ok.any():
                keep = ok[np.searchsorted(gqid[pending], q)]
                outs.append((q[keep], n_[keep], d_[keep], rn[keep]))
            idx_pending = np.flatnonzero(pending)
            pending[idx_pending[ok]] = False
        if pending.any():  # exact brute-force fallback
            q, n_, d_, rn = _knn_topk_block(
                gpx[pending], gpy[pending], gqid[pending], cx_, cy_, nid_, k
            )
            outs.append((q, n_, d_, rn))
    if not outs:
        return None
    return pd.DataFrame(
        {
            "query_id": np.concatenate([o[0] for o in outs]),
            "neighbor_id": np.concatenate([o[1] for o in outs]),
            "dist2": np.concatenate([o[2] for o in outs]),
            "rn": np.concatenate([o[3] for o in outs]).astype(np.int32),
        }
    )


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
    strategy: str = "auto",
    broadcast_max_corpus: int = 5_000_000,
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
    because each (probe, corpus point) pair still meets exactly once.

    Strategy mirrors pip_join: 'broadcast' (corpus ≤ broadcast_max_corpus
    rows → cell-sorted index broadcast, probes mapInPandas, zero shuffles)
    or 'shuffle' (the salted tagged-union path above, for corpora too big
    to broadcast)."""
    if strategy == "auto":
        strategy = (
            "broadcast" if corpus.count() <= broadcast_max_corpus else "shuffle"
        )
    if strategy == "broadcast":
        return knn_join_broadcast(spark, probes, corpus, k=k, res=res, levels=levels)

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
        # local top-k inside each (cell, salt) group; tagged union + ONE
        # exchange + partition-level regroup instead of cogrouped
        # applyInPandas (per-GROUP invoke overhead — SCALE.md §2)
        tagged = exploded.select(
            "cell", "salt", F.lit(0).alias("kind"),
            F.col("query_id").alias("id"), "x", "y",
        ).unionByName(
            corp.select(
                "cell", "salt", F.lit(1).alias("kind"),
                F.col("neighbor_id").alias("id"),
                F.col("cx").alias("x"), F.col("cy").alias("y"),
            )
        )

        def part_kernel(batches, k=k):
            chunks = [b for b in batches if len(b)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            for _, g in pdf.groupby(["cell", "salt"], sort=False):
                pr_g = g[g["kind"] == 0]
                co_g = g[g["kind"] == 1]
                if len(pr_g) == 0 or len(co_g) == 0:
                    continue
                qid = pr_g["id"].to_numpy()
                cid = co_g["id"].to_numpy()
                # ids ride the union as nullable int64 (pandas float64);
                # exact below 2^53
                # exactness guard must survive python -O
                if not ((np.abs(qid) < 2**53).all() and (np.abs(cid) < 2**53).all()):
                    raise ValueError("knn ids exceed float64-exact range (2^53)")
                out = _knn_pairs(
                    qid.astype(np.int64),
                    pr_g["x"].to_numpy(), pr_g["y"].to_numpy(),
                    cid.astype(np.int64),
                    co_g["x"].to_numpy(), co_g["y"].to_numpy(), k,
                )
                if len(out):
                    yield out

        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        local = tagged.repartition(n_parts, "cell", "salt").mapInPandas(
            part_kernel, "query_id long, neighbor_id long, dist2 double"
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
