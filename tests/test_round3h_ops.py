"""Round-3h operators: STR bulk-load packing, quadtree adaptive
partitioning, and raster zonal statistics — independent numpy replicas of
the partitioning rules beside the DuckDB oracles, plus the structural
invariants (balanced strips, capacity bounds, adaptive depth on the hot
cell, pixel-mass conservation) the value-hash compare can't express."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etf_topox_spark.operators.spatial_queries import (
    QT_CAP,
    QT_D,
    QT_N,
    STR_CAP,
    STR_N,
    STR_S,
    spatial_quadtree_partition,
    spatial_str_pack,
)
from etf_topox_spark.sources.points import _coords

SF = "/root/testdata/sf0.001"


def _point_frame(n: int) -> pd.DataFrame:
    ids = np.arange(n, dtype=np.int64)
    x, y = _coords(ids)
    return pd.DataFrame({"point_id": ids, "x": x, "y": y})


def test_str_pack_matches_numpy_rule(spark):
    got = spatial_str_pack(spark, SF).toPandas()
    pts = _point_frame(STR_N)
    pts = pts.sort_values(["x", "point_id"], kind="mergesort").reset_index(drop=True)
    pts["strip"] = (np.arange(STR_N, dtype=np.int64) * STR_S) // STR_N
    frames = []
    for s, g in pts.groupby("strip"):
        g = g.sort_values(["y", "point_id"], kind="mergesort").reset_index(drop=True)
        g["tile"] = np.arange(len(g), dtype=np.int64) // STR_CAP
        frames.append(g)
    ref = (
        pd.concat(frames)
        .groupby(["strip", "tile"])
        .agg(
            n_pts=("point_id", "size"),
            x_min=("x", "min"),
            x_max=("x", "max"),
            y_min=("y", "min"),
            y_max=("y", "max"),
        )
        .reset_index()
    )
    assert len(got) == len(ref)
    for col in ["strip", "tile", "n_pts"]:
        assert (got[col].to_numpy(np.int64) == ref[col].to_numpy(np.int64)).all()
    for col in ["x_min", "x_max", "y_min", "y_max"]:
        assert (got[col].to_numpy() == ref[col].to_numpy()).all()
    # structure: every strip holds exactly N/S points; every leaf is full
    # at CAP except each strip's last
    per_strip = got.groupby("strip")["n_pts"].sum()
    assert (per_strip == STR_N // STR_S).all()
    last_tile = got.groupby("strip")["tile"].transform("max")
    assert (got.loc[got["tile"] != last_tile, "n_pts"] == STR_CAP).all()
    assert int(got["n_pts"].sum()) == STR_N


def _qt_cells(x: np.ndarray, y: np.ndarray, lvl: int):
    p = float(1 << lvl)
    return (
        np.floor(x * p / 20.0).astype(np.int64),
        np.floor(y * p / 20.0).astype(np.int64),
    )


def test_quadtree_matches_numpy_split_and_adapts_depth(spark):
    got = spatial_quadtree_partition(spark, SF).toPandas()
    pts = _point_frame(QT_N)
    x, y = pts["x"].to_numpy(), pts["y"].to_numpy()
    counts: list[dict] = []
    for lvl in range(QT_D + 1):
        cx, cy = _qt_cells(x, y, lvl)
        key, n = np.unique(cx << 32 | cy, return_counts=True)
        counts.append(dict(zip(key.tolist(), n.tolist())))
    leaves = {}
    assigned = 0
    for lvl in range(QT_D + 1):
        cx, cy = _qt_cells(x, y, lvl)
        for k, n in counts[lvl].items():
            kx, ky = k >> 32, k & 0xFFFFFFFF
            parent_over = lvl == 0 or counts[lvl - 1][(kx >> 1) << 32 | (ky >> 1)] > QT_CAP
            if parent_over and (n <= QT_CAP or lvl == QT_D):
                leaves[(lvl, kx, ky)] = n
                assigned += n
    ref = {(int(r.leaf_level), int(r.cell_x), int(r.cell_y)): int(r.n_pts) for r in got.itertuples()}
    assert ref == leaves
    # the leaf set tiles the input exactly once
    assert assigned == QT_N and int(got["n_pts"].sum()) == QT_N
    assert (got["n_pts"] <= QT_CAP).sum() == (got["n_pts"] > 0).sum() or (
        got.loc[got["n_pts"] > QT_CAP, "leaf_level"] == QT_D
    ).all()
    # adaptivity: the sparse background resolves shallow, the 0.008-degree
    # hot square (50% of the corpus) drives splits near the depth cap
    assert int(got["leaf_level"].min()) <= 6
    assert int(got["leaf_level"].max()) >= QT_D - 2
    assert len(got) > 50


def test_zonal_stats_conserve_pixel_mass(spark):
    from etf_topox_spark.operators.image_queries import (
        N_ZONAL_IMGS,
        raster_zonal_stats,
    )
    from etf_topox_spark.operators.images import TILE
    from etf_topox_spark.sources.images import PX_DEG, image_geo, image_meta, image_pixels

    got = raster_zonal_stats(spark, SF).toPandas()
    sum_px = 0
    sum_r = sum_g = sum_b = 0
    ids = np.arange(N_ZONAL_IMGS, dtype=np.int64)
    lons, lats = image_geo(ids)
    for i in range(N_ZONAL_IMGS):
        w, h, _, _ = image_meta(i)
        px = image_pixels(i, w, h).astype(np.int64)
        for ty in range(h // TILE):
            for tx in range(w // TILE):
                cx = lons[i] + (tx * TILE + TILE // 2) * PX_DEG
                cy = lats[i] + (ty * TILE + TILE // 2) * PX_DEG
                if cx > 20.0 or cy > 20.0:
                    continue
                t = px[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
                sum_px += TILE * TILE
                sum_r += int(t[..., 0].sum())
                sum_g += int(t[..., 1].sum())
                sum_b += int(t[..., 2].sum())
    assert int(got["n_px"].sum()) == sum_px
    assert int(got["sum_r"].sum()) == sum_r
    assert int(got["sum_g"].sum()) == sum_g
    assert int(got["sum_b"].sum()) == sum_b
    assert (got["max_r"] <= 255).all() and (got["min_b"] >= 0).all()
    assert (got["n_src"] >= 1).all()


def test_tile_cover_matches_numpy_and_monotone(spark):
    from etf_topox_spark.operators.image_queries import (
        COVER_N_IMGS,
        COVER_Z0,
        COVER_Z1,
        raster_tile_cover,
    )
    from etf_topox_spark.sources.images import image_geo, image_meta

    got = raster_tile_cover(spark, SF).toPandas().set_index("zoom")
    ids = np.arange(COVER_N_IMGS, dtype=np.int64)
    lon, lat = image_geo(ids)
    w = np.array([image_meta(int(i))[0] for i in ids], np.int64)
    h = np.array([image_meta(int(i))[1] for i in ids], np.int64)
    xe, ye = lon + w / 1024.0, lat + h / 1024.0
    for z in range(COVER_Z0, COVER_Z1 + 1):
        p2 = float(1 << z)
        tx0 = np.floor(lon * p2 / 20.0).astype(np.int64)
        ty0 = np.floor(lat * p2 / 20.0).astype(np.int64)

        def hi(e):
            v = e * p2 / 20.0
            f = np.floor(v)
            raw = np.where(v == f, f - 1, f).astype(np.int64)
            return np.minimum((1 << z) - 1, raw)

        tx1, ty1 = hi(xe), hi(ye)
        nt = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
        tiles = set()
        for i in range(COVER_N_IMGS):
            for tx in range(tx0[i], tx1[i] + 1):
                for ty in range(ty0[i], ty1[i] + 1):
                    tiles.add((tx, ty))
        row = got.loc[z]
        assert int(row["n_tile_refs"]) == int(nt.sum())
        assert int(row["max_tiles_per_image"]) == int(nt.max())
        assert int(row["n_distinct_tiles"]) == len(tiles)
        assert int(row["n_distinct_tiles"]) <= int(row["n_tile_refs"])
    # deeper zoom → finer tiles → never fewer refs
    refs = got["n_tile_refs"].to_numpy()
    assert (np.diff(refs) >= 0).all()


def test_cms_one_sided_error_and_topk(spark):
    from etf_topox_spark.operators.aggregates import (
        CMS_A,
        CMS_B,
        CMS_D,
        CMS_P,
        CMS_TOPK,
        CMS_W,
        agg_cms_heavy_hitters,
    )

    got = agg_cms_heavy_hitters(spark, SF).toPandas()
    k = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_partkey"])[
        "l_partkey"
    ].to_numpy(np.int64)
    keys, exact = np.unique(k, return_counts=True)
    counters = np.zeros((CMS_D, CMS_W), np.int64)
    for j in range(CMS_D):
        b = ((k * CMS_A[j] + CMS_B[j]) % CMS_P) % CMS_W
        counters[j] = np.bincount(b, minlength=CMS_W)
    est = np.min(
        [
            counters[j][((keys * CMS_A[j] + CMS_B[j]) % CMS_P) % CMS_W]
            for j in range(CMS_D)
        ],
        axis=0,
    )
    # CMS is one-sided for EVERY key, not just the returned ones
    assert (est >= exact).all()
    order = np.lexsort((keys, -est))[:CMS_TOPK]
    assert got["partkey"].tolist() == keys[order].tolist()
    assert got["cms_est"].tolist() == est[order].tolist()
    assert got["exact_n"].tolist() == exact[order].tolist()
    assert (got["cms_est"] >= got["exact_n"]).all()


def test_image_pyramid_matches_numpy(spark):
    from etf_topox_spark.operators.image_queries import (
        N_PYRSTAT_IMGS,
        PYRSTAT_LEVELS,
        image_pyramid_stats,
    )
    from etf_topox_spark.sources.images import image_meta, image_pixels

    got = image_pyramid_stats(spark, SF).toPandas()
    acc = {}
    for i in range(N_PYRSTAT_IMGS):
        w, h, _, _ = image_meta(i)
        px = image_pixels(i, w, h).astype(np.int64)
        for lvl in range(PYRSTAT_LEVELS + 1):
            if lvl > 0:
                hh, ww, _ = px.shape
                px = px.reshape(hh // 2, 2, ww // 2, 2, 3).sum(axis=(1, 3)) // 4
            for ci, ch in enumerate("rgb"):
                c = px[..., ci]
                k = (lvl, ch)
                n, s, mn, mx = acc.get(k, (0, 0, 256, -1))
                acc[k] = (n + c.size, s + int(c.sum()), min(mn, int(c.min())), max(mx, int(c.max())))
    for r in got.itertuples():
        n, s, mn, mx = acc[(int(r.level), r.channel)]
        assert (int(r.n_px), int(r.sum_v), int(r.min_v), int(r.max_v)) == (n, s, mn, mx)
    assert len(got) == 3 * (PYRSTAT_LEVELS + 1)
    # each level quarters the pixel count exactly (all fixture dims % 4 == 0)
    per_level = got.groupby("level")["n_px"].first()
    for lvl in range(1, PYRSTAT_LEVELS + 1):
        assert per_level[lvl] * 4 == per_level[lvl - 1]


def test_image_integral_boxsum_matches_bruteforce(spark):
    """SAT corner algebra == direct numpy box sums over the generator
    pixels, aggregated the same way (and n_px is constant 128·N per box:
    every box is 8×16 or 16×8)."""
    from etf_topox_spark.operators.image_queries import (
        N_SAT_IMGS,
        SAT_K,
        image_integral_boxsum,
    )
    from etf_topox_spark.sources.images import image_meta, image_pixels

    got = (
        image_integral_boxsum(spark, SF)
        .toPandas()
        .set_index(["box_id", "channel"])
        .sort_index()
    )
    acc = {}
    for i in range(N_SAT_IMGS):
        w, h, _, _ = image_meta(i)
        px = image_pixels(i, w, h).astype(np.int64)
        for k in range(SAT_K):
            bw = 8 * (1 + (k % 2))
            bh = 8 * (1 + ((k + 1) % 2))
            x0 = (i * 7 + k * 31) % (w - bw)
            y0 = (i * 5 + k * 17) % (h - bh)
            blk = px[y0 : y0 + bh, x0 : x0 + bw]
            for ci, ch in enumerate("rgb"):
                c = blk[..., ci]
                n, s, mn, mx = acc.get((k, ch), (0, 0, 256, -1))
                acc[(k, ch)] = (
                    n + c.size,
                    s + int(c.sum()),
                    min(mn, int(c.min())),
                    max(mx, int(c.max())),
                )
    assert len(got) == 3 * SAT_K
    for (k, ch), (n, s, mn, mx) in acc.items():
        row = got.loc[(k, ch)]
        assert (int(row.n_px), int(row.sum_v), int(row.min_v), int(row.max_v)) == (
            n,
            s,
            mn,
            mx,
        )
        assert n == 128 * N_SAT_IMGS
