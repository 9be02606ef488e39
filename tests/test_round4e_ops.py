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


def test_strahler_matches_numpy_replay(spark):
    """Independent numpy replay: fixed-point iteration over the D8
    successor map (the oracle's algorithm but a third implementation),
    plus the convergence claim behind S_ROUNDS — the iteration is a
    FIXED POINT by round 30 (one more round changes nothing)."""
    from etf_topox_spark.operators.raster_strahler import S_ROUNDS
    from etf_topox_spark.operators.raster_watershed import _D8, P, WS

    out = QUERIES["raster_strahler_order"](spark, SF).toPandas()

    x, y = np.arange(WS), np.arange(WS)
    px = ((x // P) * 7919 + 13) % P
    py = ((y // P) * 104729 + 7) % P
    h = np.abs(x % P - px)[None, :] + np.abs(y % P - py)[:, None]
    best = np.full((WS, WS), -1000, np.int64)
    pick = (y[:, None] * WS + x[None, :]).copy()
    for i, (dx, dy) in enumerate(_D8):
        xx, yy = x[None, :] + dx, y[:, None] + dy
        inb = (xx >= 0) & (xx < WS) & (yy >= 0) & (yy < WS)
        hh = np.where(inb, h[np.clip(yy, 0, WS - 1), np.clip(xx, 0, WS - 1)],
                      10**6)
        score = np.where(inb, (h - hh) * 8 + (7 - i), -1000)
        upd = score > best
        best = np.where(upd, score, best)
        pick = np.where(upd & (score >= 8),
                        np.clip(yy, 0, WS - 1) * WS + np.clip(xx, 0, WS - 1),
                        pick)
    nxt = pick.ravel()
    n = WS * WS
    ords = np.ones(n, np.int64)
    prev30 = None
    for it in range(S_ROUNDS):
        m1 = np.zeros(n, np.int64)
        m2 = np.zeros(n, np.int64)
        for v in range(n):
            p = nxt[v]
            if p == v:
                continue
            o = ords[v]
            if o > m1[p]:
                m2[p] = m1[p]
                m1[p] = o
            elif o > m2[p]:
                m2[p] = o
        new = np.where(m1 == 0, 1, np.maximum(m1, m2 + 1))
        if it == 29:
            prev30 = new.copy()
        ords = new
    assert prev30 is not None and (ords == prev30).all()  # converged by 30
    rep = pd.DataFrame({"o": ords, "pid": np.arange(n)}).groupby("o").agg(
        n_cells=("pid", "size"), sum_pid=("pid", "sum")).reset_index()
    got = out.sort_values("strahler_order").reset_index(drop=True)
    assert (got["strahler_order"].to_numpy() == rep["o"].to_numpy()).all()
    assert (got["n_cells"].to_numpy() == rep["n_cells"].to_numpy()).all()
    assert (got["sum_pid"].to_numpy() == rep["sum_pid"].to_numpy()).all()
