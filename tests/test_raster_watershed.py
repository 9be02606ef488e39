"""D8 watershed delineation (operators/raster_watershed.py).

The driver checks raster_watershed against the recursive-CTE oracle;
these tests pin a numpy iterative-follow replay, the strict-descent
invariant that bounds the pointer-doubling depth, and that basins really
cross stripe blocks (the emergent-catchment claim)."""

import numpy as np
import pytest

from etf_topox_spark.operators.raster_watershed import (
    P,
    WS,
    _D8,
    watershed_basins,
)


def _h(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    px = ((x // P) * 7919 + 13) % P
    py = ((y // P) * 104729 + 7) % P
    return np.abs(x % P - px) + np.abs(y % P - py)


@pytest.fixture(scope="module")
def flow():
    GX, GY = np.meshgrid(np.arange(WS, dtype=np.int64), np.arange(WS, dtype=np.int64))
    h0 = _h(GX, GY)
    best = np.full((WS, WS), -1000, dtype=np.int64)
    nx, ny = GX.copy(), GY.copy()
    for i, (dx, dy) in enumerate(_D8):
        cx, cy = GX + dx, GY + dy
        inb = (cx >= 0) & (cx < WS) & (cy >= 0) & (cy < WS)
        drop = np.where(inb, h0 - _h(np.clip(cx, 0, WS - 1), np.clip(cy, 0, WS - 1)), -1000)
        score = np.where(inb, drop * 8 + (7 - i), -1000)
        take = (score > best) & (score >= 8)
        nx = np.where(take, cx, nx)
        ny = np.where(take, cy, ny)
        best = np.maximum(best, score)
    return GX, GY, h0, nx, ny


def test_strict_descent_bounds_path(flow):
    GX, GY, h0, nx, ny = flow
    moved = (nx != GX) | (ny != GY)
    assert (_h(nx, ny)[moved] < h0[moved]).all()
    assert h0.max() <= 2 * (P - 1)  # the 7-round doubling bound


def test_basins_match_numpy_replay(spark, flow):
    GX, GY, h0, nx, ny = flow
    cx, cy = nx.copy(), ny.copy()
    for _ in range(2 * P):  # follow to fixpoint
        cx, cy = nx[cy, cx], ny[cy, cx]
    root = cy * WS + cx
    got = {(r.pit_x, r.pit_y): (r.n_cells, r.sum_h, r.max_h)
           for r in watershed_basins(spark).collect()}
    exp = {}
    for r in np.unique(root):
        m = root == r
        exp[(int(r % WS), int(r // WS))] = (
            int(m.sum()), int(h0[m].sum()), int(h0[m].max())
        )
    assert got == exp
    assert sum(n for n, _, _ in got.values()) == WS * WS


def test_flow_crosses_stripe_blocks(flow):
    GX, GY, h0, nx, ny = flow
    cx, cy = nx.copy(), ny.copy()
    for _ in range(2 * P):
        cx, cy = nx[cy, cx], ny[cy, cx]
    crossed = ((cx // P) != (GX // P)) | ((cy // P) != (GY // P))
    assert crossed.any(), "no cell drains into a neighboring block?!"
