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
