"""Polygon rasterization (operators/raster_burn.py).

The driver checks raster_burn_polygons against the integer even-odd DuckDB
oracle; these tests pin what the oracle can't see: single-node full-grid
replay equality, tile-size invariance (the tile decomposition is a pure
refactoring), bbox containment inside the source polygon hull, and the
burn -> contour-trace round trip with operators/raster_vector.py (the
traced loops of a burned mask enclose exactly the burned pixel count —
the two halves of the raster<->vector engine are mutual inverses on area).
"""

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.raster_burn import (
    BW,
    N_POLY,
    POLYGONS,
    _EDGES_BY_PID,
    burn_stats,
)
from etf_topox_spark.operators.raster_vector import trace_mask_loops


def _inside_mask(pid: int) -> np.ndarray:
    """Full-grid even-odd mask for one polygon — the same cleared-denominator
    integer predicate as the kernel, evaluated single-node."""
    gx = np.arange(BW, dtype=np.int64)
    gy = np.arange(BW, dtype=np.int64)
    GX, GY = np.meshgrid(gx, gy)
    cross = np.zeros((BW, BW), dtype=np.int64)
    for x1, y1, x2, y2 in _EDGES_BY_PID.get(pid, ()):
        yspan = (y1 <= GY) & (GY < y2)
        dy = y2 - y1
        lhs = 2 * x1 * dy + (x2 - x1) * (2 * GY + 1 - 2 * y1)
        rhs = (2 * GX + 1) * dy
        cross += (yspan & (lhs > rhs)).astype(np.int64)
    return (cross % 2) == 1


@pytest.fixture(scope="module")
def replay() -> pd.DataFrame:
    gx = np.arange(BW, dtype=np.int64)
    gy = np.arange(BW, dtype=np.int64)
    GX, GY = np.meshgrid(gx, gy)
    rows = []
    for pid in range(N_POLY):
        m = _inside_mask(pid)
        if m.any():
            fx, fy = GX[m], GY[m]
            rows.append(
                (pid, int(m.sum()), int(fx.min()), int(fy.min()),
                 int(fx.max()), int(fy.max()), int(fx.sum()), int(fy.sum()))
            )
    return pd.DataFrame(rows, columns=[
        "poly_id", "n_px", "min_x", "min_y", "max_x", "max_y", "sum_x", "sum_y",
    ])


def test_distributed_burn_matches_single_node_replay(spark, replay):
    got = burn_stats(spark).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), replay.reset_index(drop=True),
        check_dtype=False,
    )


def test_tile_size_invariance(spark):
    a = burn_stats(spark, tile=64).toPandas()
    b = burn_stats(spark, tile=32).toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_every_polygon_burns_inside_its_hull(replay):
    # all N_POLY polygons produce interior pixel centers, and every burned
    # bbox sits inside the vertex hull's bbox (a center strictly outside
    # the hull can never have odd parity)
    assert len(replay) == N_POLY
    for _, r in replay.iterrows():
        pts = POLYGONS[int(r.poly_id)]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert min(xs) <= r.min_x and r.max_x <= max(xs)
        assert min(ys) <= r.min_y and r.max_y <= max(ys)


def test_burn_then_trace_round_trip():
    # contour-tracing a burned mask must enclose exactly the burned pixels:
    # sum of signed crack-loop areas == +/- n_px for every polygon's mask
    # (holes trace with opposite orientation, so the net is the pixel count)
    for pid in range(0, N_POLY, 3):
        m = _inside_mask(pid)
        n_px = int(m.sum())
        if n_px == 0:
            continue
        loops = trace_mask_loops(m, pid)
        assert loops, f"poly {pid}: burned mask traced no loops"
        net2 = sum(a2 for _, _, a2 in loops)
        assert abs(net2) == 2 * n_px, (
            f"poly {pid}: traced net area {net2 / 2} != burned {n_px}"
        )
