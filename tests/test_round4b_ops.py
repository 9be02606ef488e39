"""Round-4b operator tests: DEM sampling/warp, stay points, histogram
equalization, cloud-cover cells — each checked against an INDEPENDENT
python/numpy replay (not the DuckDB oracle, which the sweep already runs),
so a shared misunderstanding between query and oracle can't hide."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etf_topox_spark.registry import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def _dem() -> np.ndarray:
    from etf_topox_spark.operators.raster_watershed import P, WS

    x = np.arange(WS)
    y = np.arange(WS)
    px = ((x // P) * 7919 + 13) % P
    py = ((y // P) * 104729 + 7) % P
    hx = np.abs(x % P - px)
    hy = np.abs(y % P - py)
    return hx[None, :] + hy[:, None]  # [gy, gx]


def test_bilinear_sample_matches_numpy_replay(spark):
    from etf_topox_spark.operators.raster_sample import D2, MICRO, N_SAMPLE
    from etf_topox_spark.operators.raster_watershed import WS
    from etf_topox_spark.sources.points import _coords

    out = QUERIES["raster_bilinear_sample"](spark, SF).toPandas()
    assert len(out) == N_SAMPLE

    ids = np.arange(N_SAMPLE, dtype=np.int64)
    x, y = _coords(ids)
    mx = np.round(x * 1_000_000).astype(np.int64)
    my = np.round(y * 1_000_000).astype(np.int64)
    ux, uy = mx * (WS - 1), my * (WS - 1)
    gx0, fx = ux // MICRO, ux % MICRO
    gy0, fy = uy // MICRO, uy % MICRO
    dem = _dem()
    h00 = dem[gy0, gx0]
    h10 = dem[gy0, gx0 + 1]
    h01 = dem[gy0 + 1, gx0]
    h11 = dem[gy0 + 1, gx0 + 1]
    val = (MICRO - fy) * ((MICRO - fx) * h00 + fx * h10) + fy * (
        (MICRO - fx) * h01 + fx * h11
    )
    got = out.sort_values("point_id")
    assert (got["val_num"].to_numpy() == val).all()
    assert (got["h_floor"].to_numpy() == val // D2).all()
    # the interpolant is bounded by the 4 corner heights
    lo = np.minimum.reduce([h00, h10, h01, h11]) * D2
    hi = np.maximum.reduce([h00, h10, h01, h11]) * D2
    assert ((val >= lo) & (val <= hi)).all()


def test_affine_resample_matches_numpy_replay(spark):
    from etf_topox_spark.operators.raster_sample import C
    from etf_topox_spark.operators.raster_watershed import WS

    out = QUERIES["raster_affine_resample"](spark, SF).toPandas()
    ty, tx = np.mgrid[0:WS, 0:WS]
    sx_num = 4 * (tx - C) + 3 * (ty - C) + 5 * C
    sy_num = -3 * (tx - C) + 4 * (ty - C) + 5 * C
    # nearest int of num/5 (numerators may be negative: true floor here)
    sx = (2 * sx_num + 5) // 10
    sy = (2 * sy_num + 5) // 10
    inb = (sx >= 0) & (sx < WS) & (sy >= 0) & (sy < WS)
    dem = _dem()
    h = dem[sy[inb], sx[inb]]
    rep = (
        pd.DataFrame({"h": h, "sx": sx[inb], "sy": sy[inb]})
        .groupby("h")
        .agg(n_cells=("sx", "size"), sum_sx=("sx", "sum"), sum_sy=("sy", "sum"))
        .reset_index()
    )
    got = out.sort_values("h").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), rep.astype("int64"), check_names=False
    )
    # the rotation keeps the grid's interior covered: most targets resolve
    assert inb.mean() > 0.5


def test_stay_points_match_python_replay(spark):
    from etf_topox_spark.operators.trajectory_stay import (
        EPS2,
        KX,
        KY,
        MIN_LEN,
        N_OBJECTS,
        N_TRAJ,
    )

    out = QUERIES["trajectory_stay_points"](spark, SF).toPandas()

    i = np.arange(N_TRAJ, dtype=np.int64)
    obj, t = i % N_OBJECTS, i // N_OBJECTS
    ax = ((obj * 131 + (t // 50) * 517) % 20000).astype(np.float64) / 1000
    ay = ((obj * 277 + (t // 50) * 839) % 20000).astype(np.float64) / 1000
    dwell = (t // 25) % 2 == 0
    x = np.where(dwell, ax + ((i * KX) % 800).astype(np.float64) / 1e6,
                 ((i * KX) % 20000).astype(np.float64) / 1000)
    y = np.where(dwell, ay + ((i * KY) % 800).astype(np.float64) / 1e6,
                 ((i * KY) % 20000).astype(np.float64) / 1000)
    df = pd.DataFrame({"obj": obj, "t": t, "x": x, "y": y}).sort_values(["obj", "t"])
    stays = []
    for o, g in df.groupby("obj"):
        dx = g["x"].diff().to_numpy()
        dy = g["y"].diff().to_numpy()
        f = (dx * dx + dy * dy <= EPS2)[1:]  # per step t=1..
        ts = g["t"].to_numpy()[1:]
        xs = g["x"].to_numpy()[1:]
        ys = g["y"].to_numpy()[1:]
        run = 0
        for k in range(len(f) + 1):
            if k < len(f) and f[k]:
                run += 1
            else:
                if run >= MIN_LEN:
                    sl = slice(k - run, k)
                    stays.append(
                        (o, ts[sl][0], ts[sl][-1], run,
                         float(np.round(xs[sl], 6).sum().round(9)),
                         float(np.round(ys[sl], 6).sum().round(9)))
                    )
                run = 0
    rep = pd.DataFrame(
        stays, columns=["object_id", "start_t", "end_t", "n_steps", "cx", "cy"]
    ).sort_values(["object_id", "start_t"]).reset_index(drop=True)
    got = out.sort_values(["object_id", "start_t"]).reset_index(drop=True)
    assert len(got) == len(rep)
    for c in ("object_id", "start_t", "end_t", "n_steps"):
        assert (got[c].to_numpy() == rep[c].to_numpy()).all(), c
    # decimal(30,6) centroid sums agree with the rounded-replay to 1e-6
    assert np.allclose(got["cx_sum"], rep["cx"], atol=2e-6)
    assert np.allclose(got["cy_sum"], rep["cy"], atol=2e-6)
    # every object dwells each 50-tick anchor epoch → 8 stays apiece
    assert (got.groupby("object_id").size() == 8).all()


def test_histogram_equalization_matches_numpy_replay(spark):
    from etf_topox_spark.operators.image_enhance import N_EQ_IMGS
    from etf_topox_spark.sources.images import image_meta, image_pixels

    out = QUERIES["image_histogram_equalization"](spark, SF).toPandas()
    acc_n = np.zeros((3, 16), np.int64)
    acc_s = np.zeros((3, 16), np.int64)
    total = 0
    for i in range(N_EQ_IMGS):
        w, h, _, _ = image_meta(i)
        red = image_pixels(i, w, h)[:, :, 0]
        hist = np.bincount(red.ravel(), minlength=256).astype(np.int64)
        c = hist.cumsum()
        occ = hist > 0
        cmin = int(c[occ].min())
        e = ((c - cmin) * 255) // (int(c[-1]) - cmin)
        np.add.at(acc_n[i % 3], (e >> 4)[occ], hist[occ])
        np.add.at(acc_s[i % 3], (e >> 4)[occ], (e * hist)[occ])
        total += w * h
    for r in out.itertuples(index=False):
        assert acc_n[r.size_class, r.band] == r.n_pixels
        assert acc_s[r.size_class, r.band] == r.sum_eq
    # mass conservation: every pixel lands in exactly one band
    assert out["n_pixels"].sum() == total


def test_cloud_cover_matches_numpy_replay(spark):
    from etf_topox_spark.operators.image_enhance import (
        CELL_MILLI,
        CLOUD_T,
        N_CLOUD_IMGS,
    )
    from etf_topox_spark.sources.images import (
        GEO_KX,
        GEO_KY,
        GEO_M,
        image_meta,
        image_pixels,
    )

    out = QUERIES["image_cloud_cover_cells"](spark, SF).toPandas()
    acc: dict[tuple[int, int], list[int]] = {}
    for i in range(N_CLOUD_IMGS):
        w, h, _, _ = image_meta(i)
        bright = image_pixels(i, w, h).astype(np.int64).sum(axis=2)
        key = (
            ((i * GEO_KX) % GEO_M) // CELL_MILLI,
            ((i * GEO_KY) % GEO_M) // CELL_MILLI,
        )
        a = acc.setdefault(key, [0, 0, 0])
        a[0] += 1
        a[1] += bright.size
        a[2] += int((bright >= CLOUD_T).sum())
    assert len(out) == len(acc)
    for r in out.itertuples(index=False):
        a = acc[(r.cell_x, r.cell_y)]
        assert (r.n_images, r.n_pixels, r.n_cloud) == tuple(a)
    # the synthetic interference pattern is bright-heavy nowhere: cloud
    # share stays a proper fraction in every cell
    assert (out["n_cloud"] < out["n_pixels"]).all()
