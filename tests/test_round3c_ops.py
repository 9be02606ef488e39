"""Invariant tests for the round-3c operators (beyond the DuckDB oracles
tools/sweep.py replays): geometric certification of the convex hull (every
hull edge has the whole group on its left; every non-hull point is inside),
two-stage == single-stage hull equivalence, and a direct numpy oracle for
the image gradient energy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etf_topox_spark.operators.image_queries import (
    N_GRAD_IMAGES,
    image_gradient_energy,
)
from etf_topox_spark.operators.spatial_queries import (
    HULL_GROUPS,
    N_HULL_PTS,
    _HKX,
    _HKY,
    _HM,
    _hull_chain,
    geom_convex_hull,
)
from etf_topox_spark.sources.images import image_meta, image_pixels


def _group_points(gid: int) -> list[tuple[int, int]]:
    i = np.arange(N_HULL_PTS, dtype=np.int64)
    sel = i[i % HULL_GROUPS == gid]
    return list(zip(((sel * _HKX) % _HM).tolist(), ((sel * _HKY) % _HM).tolist()))


def test_hull_chain_geometric_certificate():
    """For each group: every input point lies left-of-or-on every directed
    hull edge (convexity + containment), hull vertices are strict corners
    (no three consecutive collinear), and the hull is a subset of the
    input."""
    for gid in range(HULL_GROUPS):
        pts = _group_points(gid)
        hull = _hull_chain(pts)
        assert len(hull) >= 3
        assert set(hull) <= set(pts)
        px = np.array([p[0] for p in pts], dtype=np.int64)
        py = np.array([p[1] for p in pts], dtype=np.int64)
        n = len(hull)
        for k in range(n):
            ax, ay = hull[k]
            bx, by = hull[(k + 1) % n]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            assert (cross >= 0).all(), f"group {gid}: point right of hull edge {k}"
        # strict corners: consecutive edge pairs never collinear
        for k in range(n):
            ax, ay = hull[k - 1]
            bx, by = hull[k]
            cx, cy = hull[(k + 1) % n]
            assert (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0


def test_hull_two_stage_equals_single_stage(spark, sf_oracle):
    got = geom_convex_hull(spark, sf_oracle).toPandas().sort_values("group_id")
    rows = []
    for gid in range(HULL_GROUPS):
        hull = _hull_chain(_group_points(gid))
        n = len(hull)
        area2 = sum(
            hull[k][0] * hull[(k + 1) % n][1] - hull[(k + 1) % n][0] * hull[k][1]
            for k in range(n)
        )
        len2 = sum(
            (hull[(k + 1) % n][0] - hull[k][0]) ** 2
            + (hull[(k + 1) % n][1] - hull[k][1]) ** 2
            for k in range(n)
        )
        rows.append((gid, n, area2, len2))
    exp = pd.DataFrame(rows, columns=["group_id", "n_hull", "area2", "edge_len2_sum"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), exp.astype("int64")
    )
    # CCW orientation: doubled shoelace area is strictly positive
    assert (exp["area2"] > 0).all()


def _grad_numpy(i: int) -> tuple[int, int, int]:
    w, h, _, _ = image_meta(i)
    px = image_pixels(i, w, h).astype(np.int64)
    g = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
    gx = g[1:-1, 2:] - g[1:-1, :-2]
    gy = g[2:, 1:-1] - g[:-2, 1:-1]
    m = np.abs(gx) + np.abs(gy)
    return int(m.sum()), int(m.max()), int(m.size)


def test_gradient_energy_matches_numpy(spark, sf_oracle):
    got = image_gradient_energy(spark, sf_oracle).toPandas()
    assert len(got) == N_GRAD_IMAGES
    byid = got.set_index("image_id")
    for i in (0, 1, 2, 7, 299):
        e, mx, npx = _grad_numpy(i)
        row = byid.loc[f"img-{i:012d}"]
        assert (int(row.grad_energy), int(row.grad_max), int(row.n_interior)) == (
            e,
            mx,
            npx,
        )
    w, h, _, _ = image_meta(0)
    # constant image scores zero by the formula — sanity of the score's
    # semantics (blur/flat detection): energy of a constant raster is 0
    g = np.full((h, w), 7, dtype=np.int64)
    gx = g[1:-1, 2:] - g[1:-1, :-2]
    gy = g[2:, 1:-1] - g[:-2, 1:-1]
    assert int((np.abs(gx) + np.abs(gy)).sum()) == 0


def _rects_np(n, kx, ky, kw, kh):
    from etf_topox_spark.operators.spatial_queries import _RPOS, _RWMAX

    i = np.arange(n, dtype=np.int64)
    x0 = (i * kx) % _RPOS
    y0 = (i * ky) % _RPOS
    return i, x0, y0, x0 + 1 + (i * kw) % _RWMAX, y0 + 1 + (i * kh) % _RWMAX


def test_bbox_join_matches_numpy_brute_force(spark, sf_oracle):
    """Cell-cover join == O(n²) numpy brute force: same pair set (no dup
    emission from multi-cell pairs, no miss from the reporting-cell rule),
    same exact overlap areas."""
    from etf_topox_spark.operators.spatial_queries import (
        _RA,
        _RB,
        N_RECT_A,
        N_RECT_B,
        spatial_bbox_join,
    )

    got = spatial_bbox_join(spark, sf_oracle).toPandas()
    ai, ax0, ay0, ax1, ay1 = _rects_np(N_RECT_A, *_RA)
    bi, bx0, by0, bx1, by1 = _rects_np(N_RECT_B, *_RB)
    wx = np.minimum(ax1[:, None], bx1[None, :]) - np.maximum(ax0[:, None], bx0[None, :])
    wy = np.minimum(ay1[:, None], by1[None, :]) - np.maximum(ay0[:, None], by0[None, :])
    hit = (wx > 0) & (wy > 0)
    ii, jj = np.nonzero(hit)
    exp = pd.DataFrame(
        {
            "rect_a": ai[ii],
            "rect_b": bi[jj],
            "overlap_area": (wx * wy)[ii, jj],
        }
    ).sort_values(["rect_a", "rect_b"])
    assert len(got) == len(exp) > 1000
    # exactly-once emission: pair keys are unique
    assert not got.duplicated(["rect_a", "rect_b"]).any()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"),
        exp.reset_index(drop=True).astype("int64"),
    )


def test_hull_diameter_endpoints_and_value(spark, sf_oracle):
    """Diameter == numpy brute force over ALL group points (not just hull
    vertices), and both endpoints are strict hull corners."""
    from etf_topox_spark.operators.spatial_queries import geom_hull_diameter

    got = geom_hull_diameter(spark, sf_oracle).toPandas().set_index("group_id")
    for gid in range(HULL_GROUPS):
        pts = _group_points(gid)
        px = np.array([p[0] for p in pts], dtype=np.int64)
        py = np.array([p[1] for p in pts], dtype=np.int64)
        d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
        best = int(d2.max())
        row = got.loc[gid]
        assert int(row.diam2) == best
        a, b = (int(row.ax), int(row.ay)), (int(row.bx), int(row.by))
        assert a < b
        hull = set(_hull_chain(pts))
        assert a in hull and b in hull
        assert (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 == best
