"""Round-4e operator tests: Borůvka MST, block-matching flow, FAST
corners — independent python/numpy replays and structural properties."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etf_topox_spark.registry import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def _mst_edges_np():
    from etf_topox_spark.operators.graph_mst import M_EXTRA, N_MST

    eid = np.arange(N_MST - 1, dtype=np.int64)
    back = np.stack([eid, eid, eid + 1], axis=1)
    e = np.arange(M_EXTRA, dtype=np.int64)
    u, v = (e * 641) % N_MST, (e * 331 + 7) % N_MST
    keep = u != v
    extra = np.stack([e[keep] + N_MST - 1, u[keep], v[keep]], axis=1)
    edges = np.concatenate([back, extra])
    w = ((edges[:, 0] * 48271) % 99991) * 4096 + edges[:, 0]
    return edges, w


def test_mst_matches_kruskal_replay(spark):
    """Three independent derivations must agree: Borůvka (engine), Prim
    (DuckDB oracle, run in the sweep) and Kruskal (here) — the MST is
    unique because all weights are distinct."""
    from etf_topox_spark.operators.graph_mst import N_MST

    out = QUERIES["graph_mst_boruvka"](spark, SF).toPandas()
    edges, w = _mst_edges_np()
    order = np.argsort(w, kind="stable")
    parent = np.arange(N_MST)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    picked = []
    for idx in order:
        eid, u, v = edges[idx]
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            picked.append((eid, u, v, w[idx]))
        if len(picked) == N_MST - 1:
            break
    rep = pd.DataFrame(picked, columns=["eid", "u", "v", "w"]).sort_values("eid")
    got = out.sort_values("eid").reset_index(drop=True)
    assert len(got) == N_MST - 1
    pd.testing.assert_frame_equal(
        got.astype("int64"), rep.reset_index(drop=True).astype("int64")
    )
    # spanning: the picked edges connect all nodes
    roots = {find(n) for n in range(N_MST)}
    assert len(roots) == 1


def test_block_flow_matches_numpy_replay(spark):
    from etf_topox_spark.operators.image_flow import BLK, N_OF_PAIRS, SEARCH
    from etf_topox_spark.sources.images import image_meta, image_pixels

    out = QUERIES["image_block_flow"](spark, SF).toPandas()
    checked = 0
    for pair_id, g in out.groupby("pair_id"):
        w, h, _, _ = image_meta(pair_id)
        ra = image_pixels(pair_id, w, h)[:, :, 0].astype(np.int64)
        rb = image_pixels(pair_id + 3 * N_OF_PAIRS, w, h)[:, :, 0].astype(np.int64)
        for r in g.itertuples(index=False):
            y0, x0 = r.by * BLK, r.bx * BLK
            a = ra[y0:y0 + BLK, x0:x0 + BLK]
            best = None
            for dy in range(-SEARCH, SEARCH + 1):
                for dx in range(-SEARCH, SEARCH + 1):
                    d = a - rb[y0 + dy:y0 + dy + BLK, x0 + dx:x0 + dx + BLK]
                    ssd = int((d * d).sum())
                    if best is None or ssd < best[0]:
                        best = (ssd, dy, dx)
            assert (r.best_ssd, r.best_dy, r.best_dx) == best
            checked += 1
    assert checked == len(out) > 0


def test_fast_corners_match_numpy_replay(spark):
    from etf_topox_spark.operators.image_corners import (
        FAST_N,
        FAST_T,
        N_FC_IMGS,
        RING,
    )
    from etf_topox_spark.sources.images import image_meta, image_pixels

    out = QUERIES["image_fast_corners"](spark, SF).toPandas()
    acc = np.zeros((3, 4), np.int64)
    for i in range(N_FC_IMGS):
        w, h, _, _ = image_meta(i)
        g = image_pixels(i, w, h)[:, :, 1].astype(np.int64)
        c = g[3:h - 3, 3:w - 3]
        nb = np.zeros_like(c)
        nd = np.zeros_like(c)
        for dx, dy in RING:
            nbr = g[3 + dy:h - 3 + dy, 3 + dx:w - 3 + dx]
            nb += nbr > c + FAST_T
            nd += nbr < c - FAST_T
        acc[i % 3] += [
            c.size, int((nb >= FAST_N).sum()), int((nd >= FAST_N).sum()),
            int(nb[nb >= FAST_N].sum()),
        ]
    for r in out.itertuples(index=False):
        assert list(acc[r.size_class]) == [
            r.n_interior, r.n_bright_corners, r.n_dark_corners,
            r.sum_bright_score,
        ]


def test_skeletonize_matches_fullraster_replay(spark):
    """Single-node full-raster numpy replay of the identical subpass rule;
    also pins the ghost-zone correctness (tiles + halo == whole raster)
    and skeleton-subset-of-mask."""
    from etf_topox_spark.operators.raster_skeleton import (
        BAND,
        MASK_T,
        N_ITERS,
        _dem_mask,
        _thin_numpy,
    )
    from etf_topox_spark.operators.raster_watershed import WS

    out = QUERIES["raster_skeletonize"](spark, SF).toPandas()
    m0 = _dem_mask(0, 0, WS, WS)
    m = _thin_numpy(m0.copy(), 2 * N_ITERS)
    assert ((m == 1) <= (m0 == 1)).all()  # skeleton subset of mask
    xs = np.arange(WS)
    for r in out.itertuples(index=False):
        sl = slice(r.band * BAND, (r.band + 1) * BAND)
        assert r.n_fg_initial == int(m0[sl].sum())
        assert r.n_fg_skeleton == int(m[sl].sum())
        assert r.sum_x == int((m[sl] * xs[None, :]).sum())
    # thinning genuinely thins: global skeleton mass is a small fraction
    assert out["n_fg_skeleton"].sum() < out["n_fg_initial"].sum() / 3


def test_hexbin_matches_numpy_replay(spark):
    from etf_topox_spark.operators.spatial_hexbin import (
        _CQX,
        _CQY,
        _CRY,
        N_HEX,
    )
    from etf_topox_spark.sources.points import _coords

    out = QUERIES["spatial_hexbin"](spark, SF).toPandas()
    assert out["n_points"].sum() == N_HEX  # every point lands in one hex
    ids = np.arange(N_HEX, dtype=np.int64)
    x, y = _coords(ids)
    fq = x * float(_CQX) + y * float(_CQY)
    fr = y * float(_CRY)
    fs = -fq - fr
    rq, rr, rs = np.round(fq), np.round(fr), np.round(fs)
    dq, dr, ds = np.abs(rq - fq), np.abs(rr - fr), np.abs(rs - fs)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    hq = np.where(fix_q, -rr - rs, rq).astype(np.int64)
    hr = np.where(fix_r, -rq - rs, rr).astype(np.int64)
    import pandas as pd
    rep = (
        pd.DataFrame({"hq": hq, "hr": hr})
        .groupby(["hq", "hr"]).size().reset_index(name="n")
    )
    got = {(r.hex_q, r.hex_r): r.n_points for r in out.itertuples(index=False)}
    assert len(got) == len(rep)
    for r in rep.itertuples(index=False):
        assert got[(r.hq, r.hr)] == r.n
