"""Round-4 operator tests: CDC/SCD2, distribution windows, exact corr,
point-level DBSCAN, geofence transitions, flow accumulation, palette
quantization, template matching — each checked against an INDEPENDENT
python/numpy replay (not the DuckDB oracle, which the sweep already runs),
so a shared misunderstanding between query and oracle can't hide."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.registry import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


# --- SCD2 ---------------------------------------------------------------------


def test_scd2_versions_reconstruct_log(spark):
    out = QUERIES["scd2_dimension_build"](spark, SF).toPandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    # observation counts conserve the change log exactly
    assert out["n_observations"].sum() == len(orders)
    per_key = orders.groupby("o_custkey").size()
    got = out.groupby("custkey")["n_observations"].sum()
    pd.testing.assert_series_equal(
        got.sort_index(), per_key.sort_index(), check_names=False
    )
    # exactly one current version per key, and it is the max version
    cur = out[out["is_current"]]
    assert len(cur) == out["custkey"].nunique()
    assert (cur.groupby("custkey")["version"].max()
            == out.groupby("custkey")["version"].max()).all()
    # validity chains: valid_to(k) == valid_from(k+1); runs change attr
    for _, g in out[out["custkey"] < out["custkey"].min() + 40].groupby("custkey"):
        g = g.sort_values("version")
        assert (g["valid_to"].iloc[:-1].to_numpy()
                == g["valid_from"].iloc[1:].to_numpy()).all()
        assert (g["attr"].iloc[:-1].to_numpy() != g["attr"].iloc[1:].to_numpy()).all()


def test_cdc_upsert_matches_pandas_replay(spark):
    out = QUERIES["cdc_upsert_snapshot"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    last = (
        ev.sort_values(["ts", "event_id"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )
    keep = last[last["event_type"] != "error"].sort_index()
    assert set(out["user_id"]) == set(keep.index)
    m = out.set_index("user_id").sort_index()
    assert (m["last_event_id"] == keep["event_id"]).all()
    assert (m["last_type"] == keep["event_type"]).all()
    n_ops = ev.groupby("user_id").size()
    assert (m["n_ops"] == n_ops.loc[m.index]).all()


def test_streaming_cdc_equals_batch(spark):
    s = QUERIES["streaming_cdc_upsert"](spark, SF).toPandas()
    b = QUERIES["cdc_upsert_snapshot"](spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        s.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


# --- distribution windows / exact corr -----------------------------------------


def test_window_distribution_properties(spark):
    out = QUERIES["window_distribution"](spark, SF).toPandas()
    for _, g in out.groupby("c_nationkey"):
        sizes = g["quartile"].value_counts()
        assert sizes.max() - sizes.min() <= 1  # NTILE equi-height
        assert g["pct_rank"].between(0, 1).all()
        assert (g["cume"].to_numpy() == np.sort(g["cume"].to_numpy())).all()
        assert g["cume"].iloc[-1] == 1.0


def test_corr_covar_matches_numpy(spark):
    out = QUERIES["agg_corr_covar"](spark, SF).toPandas().set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        x, y = g["l_quantity"].to_numpy(), g["l_extendedprice"].to_numpy()
        assert out.loc[flag, "covar_qty_price"] == pytest.approx(
            np.cov(x, y, ddof=1)[0, 1], rel=1e-9
        )
        assert out.loc[flag, "corr_qty_price"] == pytest.approx(
            np.corrcoef(x, y)[0, 1], rel=1e-9
        )


# --- point-level DBSCAN / geofence ---------------------------------------------


def _dbscan_replay():
    from etf_topox_spark.operators.spatial_queries import (
        DB_EPS, DB_MINPTS, N_DB, N_DB_RIDGE, RIDGE_OFFSET,
    )
    from etf_topox_spark.sources.points import _coords

    ids = np.arange(N_DB, dtype=np.int64)
    x, y = _coords(ids)
    j = np.arange(N_DB_RIDGE, dtype=np.int64)
    x = np.concatenate([x, 1.0 + (j * 5).astype(np.float64) / 1000.0])
    y = np.concatenate([y, 4.0 + (j * 25).astype(np.float64) / 10000.0])
    ids = np.concatenate([ids, RIDGE_OFFSET + j])
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    nbr = d2 <= DB_EPS * DB_EPS
    core = nbr.sum(axis=1) >= DB_MINPTS
    # CC over core-core adjacency, min-id labels
    lbl = ids.astype(object).copy()
    changed = True
    core_adj = nbr & core[:, None] & core[None, :]
    while changed:
        changed = False
        for i in np.where(core)[0]:
            m = min(lbl[k] for k in np.where(core_adj[i])[0])
            if m < lbl[i]:
                lbl[i] = m
                changed = True
    out = {}
    for i in np.where(core)[0]:
        out.setdefault(lbl[i], [0, 0])[0] += 1
    for i in np.where(~core)[0]:
        roots = [lbl[k] for k in np.where(nbr[i] & core)[0] if k != i]
        if roots:
            out[min(roots)][1] += 1
    return out


def test_dbscan_matches_bruteforce_replay(spark):
    got = QUERIES["spatial_dbscan_points"](spark, SF).toPandas()
    want = _dbscan_replay()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nc, nb = want[r["cluster_id"]]
        assert (r["n_core"], r["n_border"]) == (nc, nb)


def test_geofence_transitions_replay(spark):
    from etf_topox_spark.operators.spatial_queries import _FENCE, N_OBJECTS, N_TRAJ
    from etf_topox_spark.sources.points import _coords

    got = QUERIES["spatial_geofence_transitions"](spark, SF).toPandas()
    ids = np.arange(N_TRAJ, dtype=np.int64)
    x, y = _coords(ids)
    df = pd.DataFrame(
        {"object_id": ids % N_OBJECTS, "t": ids // N_OBJECTS, "x": x, "y": y}
    ).sort_values(["object_id", "t"])
    x0, x1, y0, y1 = _FENCE
    df["inside"] = ((df.x >= x0) & (df.x < x1) & (df.y >= y0) & (df.y < y1)).astype(int)
    rows = []
    for oid, g in df.groupby("object_id"):
        prev = None
        for _, r in g.iterrows():
            if (prev is None and r.inside == 1) or (prev is not None and prev != r.inside):
                rows.append((oid, r.t, "enter" if r.inside else "exit"))
            prev = r.inside
    want = pd.DataFrame(rows, columns=["object_id", "t", "kind"])
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["object_id", "t", "kind"]].reset_index(drop=True),
        want.astype({"object_id": got["object_id"].dtype, "t": got["t"].dtype}),
    )


# --- flow accumulation -----------------------------------------------------------


def test_flow_accumulation_matches_numpy_push(spark):
    from etf_topox_spark.operators.raster_watershed import P, WS

    got = QUERIES["raster_flow_accumulation"](spark, SF).toPandas()
    gx, gy = np.meshgrid(np.arange(WS, dtype=np.int64),
                         np.arange(WS, dtype=np.int64), indexing="xy")

    def h(x, y):
        px = ((x // P) * 7919 + 13) % P
        py = ((y // P) * 104729 + 7) % P
        return np.abs(x % P - px) + np.abs(y % P - py)

    h0 = h(gx, gy)
    best_score = np.full((WS, WS), -1000, np.int64)
    nxt = (gy * WS + gx).copy()
    d8 = [(0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1)]
    for i, (dx, dy) in enumerate(d8):
        nx, ny = gx + dx, gy + dy
        inb = (nx >= 0) & (nx < WS) & (ny >= 0) & (ny < WS)
        drop = np.where(inb, h0 - h(np.clip(nx, 0, WS - 1), np.clip(ny, 0, WS - 1)),
                        -1000)
        score = np.where(inb, drop * 8 + (7 - i), -1000)
        upd = (score > best_score) & (score >= 8)
        best_score = np.maximum(best_score, score)
        nxt = np.where(upd, ny * WS + nx, nxt)
    nxt = nxt.ravel()
    # topological push: acc[v] += 1 + acc[u] along edges in descending-h order
    acc = np.zeros(WS * WS, np.int64)
    order = np.argsort(-h0.ravel(), kind="stable")
    for u in order:
        v = nxt[u]
        if v != u:
            acc[v] += 1 + acc[u]
    want = pd.Series(acc).value_counts().sort_index()
    got_s = got.set_index("acc")["n_cells"]
    assert (got_s.sort_index() == want).all() and len(got_s) == len(want)


# --- palette quantization / template matching ------------------------------------


def test_color_quantize_matches_numpy(spark):
    from etf_topox_spark.operators.image_quantize import N_QUANT_IMGS, _PALETTE
    from etf_topox_spark.sources.images import image_meta, image_pixels

    got = QUERIES["image_color_quantize"](spark, SF).toPandas().set_index("palette_idx")
    pal = np.array(_PALETTE, np.int64)
    n_px = np.zeros(8, np.int64)
    err = np.zeros(8, np.int64)
    for i in range(N_QUANT_IMGS):
        w, h, _, _ = image_meta(i)
        px = image_pixels(i, w, h).reshape(-1, 3).astype(np.int64)
        d = ((px[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
        idx = d.argmin(axis=1)
        n_px += np.bincount(idx, minlength=8)
        err += np.bincount(idx, weights=d[np.arange(len(idx)), idx],
                           minlength=8).astype(np.int64)
    for k in range(8):
        if n_px[k]:
            assert got.loc[k, "n_pixels"] == n_px[k]
            assert got.loc[k, "sum_sq_err"] == err[k]
    assert got["n_pixels"].sum() == n_px.sum()


def test_template_match_matches_bruteforce(spark):
    from etf_topox_spark.operators.image_quantize import TM_K, _template
    from etf_topox_spark.sources.images import image_meta, image_pixels

    got = QUERIES["image_template_match"](spark, SF).toPandas().set_index("image_id")
    tmpl = _template()
    for i in (0, 1, 2, 5):
        w, h, _, _ = image_meta(i)
        red = image_pixels(i, w, h)[..., 0].astype(np.int64)
        oh, ow = h - TM_K + 1, w - TM_K + 1
        ssd = np.zeros((oh, ow), np.int64)
        for yy in range(oh):
            for xx in range(ow):
                win = red[yy:yy + TM_K, xx:xx + TM_K]
                ssd[yy, xx] = ((win - tmpl) ** 2).sum()
        flat = int(ssd.argmin())
        r = got.loc[f"img-{i:012d}"]
        assert (r["best_y"], r["best_x"]) == (flat // ow, flat % ow)
        assert r["min_ssd"] == ssd.reshape(-1)[flat]


# --- batch 2: hillshade census / voronoi assignment ------------------------------


def test_hillshade_census_matches_numpy(spark):
    from etf_topox_spark.operators.raster_watershed import P, WS

    got = QUERIES["raster_hillshade_census"](spark, SF).toPandas()
    assert got["n_cells"].sum() == (WS - 2) ** 2
    gx, gy = np.meshgrid(np.arange(WS, dtype=np.int64),
                         np.arange(WS, dtype=np.int64), indexing="xy")

    def h(x, y):
        px = ((x // P) * 7919 + 13) % P
        py = ((y // P) * 104729 + 7) % P
        return np.abs(x % P - px) + np.abs(y % P - py)

    z = h(gx, gy)
    gxv = (z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:]) - (
        z[:-2, :-2] + 2 * z[1:-1, :-2] + z[2:, :-2]
    )
    gyv = (z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:]) - (
        z[:-2, :-2] + 2 * z[:-2, 1:-1] + z[:-2, 2:]
    )
    illum = (gxv + gyv + 8).ravel()
    want = pd.Series(illum).value_counts().sort_index()
    got_s = got.set_index("illum")["n_cells"].sort_index()
    assert len(got_s) == len(want) and (got_s.to_numpy() == want.to_numpy()).all()


def test_voronoi_assignment_matches_numpy(spark):
    from etf_topox_spark.operators.spatial_queries import (
        N_POINTS, N_VOR_SITES, VOR_SITE_BASE,
    )
    from etf_topox_spark.sources.points import DIV, KX, KY, M, _coords

    got = QUERIES["spatial_voronoi_assign"](spark, SF).toPandas()
    assert got["n_points"].sum() == N_POINTS
    x, y = _coords(np.arange(N_POINTS, dtype=np.int64))
    j = np.arange(N_VOR_SITES, dtype=np.int64)
    sx = (((VOR_SITE_BASE + 2 * j) * KX) % M).astype(np.float64) / DIV
    sy = (((VOR_SITE_BASE + 2 * j) * KY) % M).astype(np.float64) / DIV
    d2 = (x[:, None] - sx[None, :]) ** 2 + (y[:, None] - sy[None, :]) ** 2
    idx = d2.argmin(axis=1)  # first min = lowest site_id
    counts = np.bincount(idx, minlength=N_VOR_SITES)
    sums = np.zeros(N_VOR_SITES)
    np.add.at(sums, idx, np.round(d2[np.arange(len(idx)), idx], 6))
    m = got.set_index("site_id")
    for k in range(N_VOR_SITES):
        if counts[k]:
            assert m.loc[k, "n_points"] == counts[k]
            assert m.loc[k, "sum_d2"] == pytest.approx(sums[k], abs=1e-5)


def test_geo_phash_dedup_planted_pairs(spark):
    from etf_topox_spark.operators.image_queries import (
        DUP_PREFIX, GEO_HAM_T, N_DUP_IMAGES,
    )

    got = QUERIES["image_geo_phash_dedup"](spark, SF).toPandas()
    # every planted dup shares its original's location AND phash → all
    # N_DUP_IMAGES (dup, orig) pairs must surface with hamming 0
    # ("dup_" < "img" lexicographically, so the copy lands in img_a)
    planted = got[got["img_a"] == DUP_PREFIX + got["img_b"]]
    assert len(planted) == N_DUP_IMAGES
    assert (planted["hamming"] == 0).all()
    assert got["hamming"].between(0, GEO_HAM_T).all()
    # pairs only within one blocking cell: recompute cells from the ids
    from etf_topox_spark.operators.image_queries import GEO_CELL_DEG
    from etf_topox_spark.sources.images import GEO_KX, GEO_KY, GEO_M

    for col in ("img_a", "img_b"):
        i0 = got[col].str[-12:].astype(np.int64)
        assert ((i0 * GEO_KX) % GEO_M // (GEO_CELL_DEG * 1000) == got["cell_x"]).all()
        assert ((i0 * GEO_KY) % GEO_M // (GEO_CELL_DEG * 1000) == got["cell_y"]).all()


def test_footprint_overlap_matches_numpy_bruteforce(spark):
    from etf_topox_spark.operators.image_queries import (
        FOOT_PX_U, FOOT_SCALE, N_FOOT,
    )
    from etf_topox_spark.sources.images import GEO_KX, GEO_KY, GEO_M

    got = QUERIES["image_footprint_overlap"](spark, SF).toPandas()

    i = np.arange(N_FOOT, dtype=np.int64)
    w = np.select([i % 3 == 0, i % 3 == 1], [64, 128], 96)
    h = np.select([i % 3 == 0, i % 3 == 1], [64, 96], 128)
    x0 = ((i * GEO_KX) % GEO_M) * FOOT_SCALE
    x1 = x0 + w * FOOT_PX_U
    y0 = ((i * GEO_KY) % GEO_M) * FOOT_SCALE
    y1 = y0 + h * FOOT_PX_U
    iw = np.minimum(x1[:, None], x1[None, :]) - np.maximum(x0[:, None], x0[None, :])
    ih = np.minimum(y1[:, None], y1[None, :]) - np.maximum(y0[:, None], y0[None, :])
    a, b = np.where((iw > 0) & (ih > 0) & (i[:, None] < i[None, :]))
    assert len(got) == len(a)
    exp = pd.DataFrame({
        "img_a": [f"img-{v:012d}" for v in a],
        "img_b": [f"img-{v:012d}" for v in b],
        "iw": iw[a, b], "ih": ih[a, b], "inter_area": iw[a, b] * ih[a, b],
    }).sort_values(["img_a", "img_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["img_a", "img_b"]).reset_index(drop=True).astype(exp.dtypes),
        exp,
    )


def test_geo_knn_retrieval_invariants(spark):
    from etf_topox_spark.operators.image_queries import KNN_K, KNN_Q_MOD, N_PHASH_IMAGES
    from etf_topox_spark.sources.images import GEO_KX, GEO_KY, GEO_M

    got = QUERIES["image_geo_knn_retrieval"](spark, SF).toPandas()
    n_queries = len([i for i in range(N_PHASH_IMAGES) if i % KNN_Q_MOD == 0])
    assert len(got) == n_queries * KNN_K
    assert (got["query_id"] != got["neighbor_id"]).all()
    g = got.sort_values(["query_id", "knn_rank"]).groupby("query_id")
    assert (g["knn_rank"].apply(lambda s: list(s) == list(range(1, KNN_K + 1)))).all()
    # d2 nondecreasing within each query, and exactly the K smallest overall
    assert (g["d2"].apply(lambda s: s.is_monotonic_increasing)).all()
    qi = got["query_id"].str[-12:].astype(np.int64)
    ni = got["neighbor_id"].str[-12:].astype(np.int64)
    dmx = (qi * GEO_KX) % GEO_M - (ni * GEO_KX) % GEO_M
    dmy = (qi * GEO_KY) % GEO_M - (ni * GEO_KY) % GEO_M
    assert (got["d2"] == dmx * dmx + dmy * dmy).all()


def _cov_fixture():
    from etf_topox_spark.operators.image_queries import (
        FOOT_PX_U, FOOT_SCALE, N_COV_PTS, N_FOOT, _PX_MICRO_DEN, _PX_MICRO_NUM,
    )
    from etf_topox_spark.sources.images import GEO_KX, GEO_KY, GEO_M

    i = np.arange(N_COV_PTS, dtype=np.int64)
    hot = i % 2 == 1
    px = np.where(hot, 10_300_000 + (i * 13619) % 8000, ((i * 13619) % 20000) * 1000)
    py = np.where(hot, 10_700_000 + (i * 7387) % 8000, ((i * 7387) % 20000) * 1000)
    j = np.arange(N_FOOT, dtype=np.int64)
    w = np.select([j % 3 == 0, j % 3 == 1], [64, 128], 96)
    h = np.select([j % 3 == 0, j % 3 == 1], [64, 96], 128)
    x0 = ((j * GEO_KX) % GEO_M) * 1000
    x1 = x0 + w * _PX_MICRO_NUM // _PX_MICRO_DEN
    y0 = ((j * GEO_KY) % GEO_M) * 1000
    y1 = y0 + h * _PX_MICRO_NUM // _PX_MICRO_DEN
    return i, px, py, j, x0, x1, y0, y1


def test_point_coverage_matches_numpy_bruteforce(spark):
    got = QUERIES["image_footprint_point_coverage"](spark, SF).toPandas()
    pid, px, py, j, x0, x1, y0, y1 = _cov_fixture()
    inside = (
        (px[None, :] >= x0[:, None]) & (px[None, :] < x1[:, None])
        & (py[None, :] >= y0[:, None]) & (py[None, :] < y1[:, None])
    )
    n_cov = inside.sum(axis=1)
    keep = np.where(n_cov > 0)[0]
    assert len(got) == len(keep)
    m = got.set_index("image_id")
    for k in keep:
        r = m.loc[f"img-{k:012d}"]
        assert r["n_covered"] == n_cov[k]
        assert r["sum_point_id"] == pid[inside[k]].sum()


def test_coverage_gap_census_matches_numpy(spark):
    from etf_topox_spark.operators.image_queries import GAP_CELL_U, GAP_MACRO

    got = QUERIES["spatial_coverage_gap_census"](spark, SF).toPandas()
    _, _, _, j, x0, x1, y0, y1 = _cov_fixture()
    covered = np.zeros((80, 80), bool)
    for a, b_, c, d in zip(x0 // GAP_CELL_U, (x1 - 1) // GAP_CELL_U,
                           y0 // GAP_CELL_U, (y1 - 1) // GAP_CELL_U):
        covered[a:b_ + 1, c:d + 1] = True
    gaps = ~covered
    m = got.set_index(["macro_x", "macro_y"])["n_gap_cells"]
    total = 0
    for mx in range(80 // GAP_MACRO):
        for my in range(80 // GAP_MACRO):
            n = gaps[mx * GAP_MACRO:(mx + 1) * GAP_MACRO,
                     my * GAP_MACRO:(my + 1) * GAP_MACRO].sum()
            total += n
            if n:
                assert m.loc[(mx, my)] == n
            else:
                assert (mx, my) not in m.index
    assert m.sum() == total


def test_brightness_geo_trend_matches_numpy(spark):
    from etf_topox_spark.operators.image_queries import N_PHASH_IMAGES
    from etf_topox_spark.sources.images import (
        GEO_KY, GEO_M, image_meta, image_pixels,
    )

    got = QUERIES["image_brightness_geo_trend"](spark, SF).toPandas()
    rows = {0: [], 1: [], 2: []}
    for i in range(N_PHASH_IMAGES):
        w, h, _, _ = image_meta(i)
        t = int((image_pixels(i, w, h).astype(np.int64).sum(axis=-1) // 3).sum())
        rows[i % 3].append(((i * GEO_KY) % GEO_M, t))
    assert len(got) == 3
    for sc, pairs in rows.items():
        x = np.array([p[0] for p in pairs], dtype=object)
        y = np.array([p[1] for p in pairs], dtype=object)
        r = got.set_index("size_class").loc[sc]
        n = len(pairs)
        assert (r["n"], r["sum_x"], r["sum_y"]) == (n, sum(x), sum(y))
        assert r["sum_xy"] == sum(a * b for a, b in pairs)
        assert r["sum_x2"] == sum(a * a for a in x)
        assert r["slope_num"] == n * r["sum_xy"] - r["sum_x"] * r["sum_y"]
        assert r["slope_den"] == n * r["sum_x2"] - r["sum_x"] * r["sum_x"]


def test_streaming_image_geo_dedup_cross_batch(spark):
    import os, tempfile

    from etf_topox_spark.streaming.events import (
        _N_STREAM_DUP, _stage_image_stream_dir,
    )

    got = QUERIES["streaming_image_geo_dedup"](spark, SF).toPandas()
    # the staging really is two files -> two micro-batches under
    # maxFilesPerTrigger=1; every planted batch-2 duplicate is only
    # catchable if batch 1's per-cell state survived the boundary
    d = _stage_image_stream_dir(spark, SF)
    assert sorted(os.listdir(d)) == ["0_base.parquet", "1_dups.parquet"]
    planted = got[got["dup_id"].str.startswith("dup_")]
    assert len(planted) == _N_STREAM_DUP
    assert (planted["orig_id"] == planted["dup_id"].str[4:]).all()


def test_coverage_depth_histogram_consistency(spark):
    hist = QUERIES["spatial_coverage_depth_histogram"](spark, SF).toPandas()
    gaps = QUERIES["spatial_coverage_gap_census"](spark, SF).toPandas()
    # depth-0 cells ARE the gap census, and the histogram covers the grid
    assert hist.set_index("depth").loc[0, "n_cells"] == gaps["n_gap_cells"].sum()
    assert hist["n_cells"].sum() == 80 * 80
    # total cell-touches equals the rect->cell explode mass
    _, _, _, j, x0, x1, y0, y1 = _cov_fixture()
    from etf_topox_spark.operators.image_queries import GAP_CELL_U
    # clip to the 80x80 audit grid: window-edge footprints spill past it
    touches = (
        (np.minimum((x1 - 1) // GAP_CELL_U, 79) - x0 // GAP_CELL_U + 1)
        * (np.minimum((y1 - 1) // GAP_CELL_U, 79) - y0 // GAP_CELL_U + 1)
    ).sum()
    assert (hist["depth"] * hist["n_cells"]).sum() == touches
