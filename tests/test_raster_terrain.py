"""Terrain derivatives (operators/raster_terrain.py).

The driver checks both queries against SQL twins; these tests pin numpy
replays of the Horn gradients and the focal median, plus census-mass
conservation."""

import numpy as np
import pytest

from etf_topox_spark.operators.raster_terrain import (
    SLOPE_BAND,
    SLOPE_CAP,
    focal_median,
    slope_aspect,
)
from etf_topox_spark.operators.raster_watershed import P, WS


def _h(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    px = ((x // P) * 7919 + 13) % P
    py = ((y // P) * 104729 + 7) % P
    return np.abs(x % P - px) + np.abs(y % P - py)


@pytest.fixture(scope="module")
def dem():
    GX, GY = np.meshgrid(np.arange(WS, dtype=np.int64), np.arange(WS, dtype=np.int64))
    return _h(GX, GY)


def test_slope_aspect_matches_numpy_horn(spark, dem):
    z = dem
    gx = (z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:]) - (
        z[:-2, :-2] + 2 * z[1:-1, :-2] + z[2:, :-2]
    )
    gy = (z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:]) - (
        z[:-2, :-2] + 2 * z[:-2, 1:-1] + z[:-2, 2:]
    )
    s2 = gx * gx + gy * gy
    aspect = np.full(gx.shape, 7, dtype=np.int64)
    conds = [
        (gx == 0) & (gy == 0),
        (gx > 0) & (np.abs(gy) <= gx),
        (gy > 0) & (np.abs(gx) <= gy),
        (gx < 0) & (np.abs(gy) <= -gx),
        (gy < 0) & (np.abs(gx) <= -gy),
        (gx > 0) & (gy > 0),
        (gx < 0) & (gy > 0),
        (gx < 0) & (gy < 0),
    ]
    vals = [-1, 0, 2, 4, 6, 1, 3, 5]
    done = np.zeros(gx.shape, dtype=bool)
    for c, v in zip(conds, vals):
        take = c & ~done
        aspect[take] = v
        done |= c
    band = np.minimum(s2 // SLOPE_BAND, SLOPE_CAP)
    exp = {}
    for a in np.unique(aspect):
        for b in np.unique(band[aspect == a]):
            m = (aspect == a) & (band == b)
            exp[(int(a), int(b))] = (int(m.sum()), int(s2[m].sum()))
    got = {(r.aspect, r.slope_band): (r.n_cells, r.sum_slope_sq)
           for r in slope_aspect(spark).collect()}
    assert got == exp
    assert sum(n for n, _ in got.values()) == (WS - 2) ** 2


def test_focal_median_matches_numpy(spark, dem):
    z = dem
    stack = np.stack([
        z[1 + dy:WS - 1 + dy, 1 + dx:WS - 1 + dx]
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ])
    med = np.sort(stack, axis=0)[4]
    got = {r.med: r.n_cells for r in focal_median(spark).collect()}
    vals, cnts = np.unique(med, return_counts=True)
    assert got == {int(v): int(c) for v, c in zip(vals, cnts)}
    assert sum(got.values()) == (WS - 2) ** 2
