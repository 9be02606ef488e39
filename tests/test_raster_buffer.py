"""Fused buffer-band analysis (operators/raster_buffer.py).

The driver checks raster_buffer_area against the end-to-end SQL twin;
these tests pin the cross-module consistency: the bands replay from a BFS over the burned mask, the distance field matches a BFS from the
burned mask, and the plan stays pure Catalyst."""

import numpy as np

from etf_topox_spark.operators.raster_buffer import (
    BAND,
    BAND_CAP,
    BW,
    buffer_bands,
)
from tests.test_raster_burn import _inside_mask


def _mask_union() -> np.ndarray:
    m = np.zeros((BW, BW), dtype=bool)
    from etf_topox_spark.operators.raster_burn import N_POLY

    for pid in range(N_POLY):
        m |= _inside_mask(pid)
    return m


def test_bands_match_bfs_from_burned_mask(spark):
    fg = _mask_union()
    inf = np.int64(1 << 20)
    d = np.where(fg, np.int64(0), inf)
    while True:
        n = d.copy()
        np.minimum(n[1:, :], d[:-1, :] + 1, out=n[1:, :])
        np.minimum(n[:-1, :], d[1:, :] + 1, out=n[:-1, :])
        np.minimum(n[:, 1:], d[:, :-1] + 1, out=n[:, 1:])
        np.minimum(n[:, :-1], d[:, 1:] + 1, out=n[:, :-1])
        if np.array_equal(n, d):
            break
        d = n
    band = np.minimum(d // BAND, BAND_CAP)
    got = {r.band: (r.n_px, r.cum_px) for r in buffer_bands(spark).collect()}
    cum = 0
    for b in np.unique(band):
        n = int((band == b).sum())
        cum += n
        assert got[int(b)] == (n, cum), b
    # band 0 spans dist 0..BAND-1, so it contains at least the polygons
    assert got[0][0] >= int(fg.sum())
    assert max(c for _, c in got.values()) == BW * BW


def test_plan_is_pure_catalyst(spark):
    plan = buffer_bands(spark)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker
