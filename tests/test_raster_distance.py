"""Exact L1 distance transform (operators/raster_distance.py).

The driver checks raster_distance_l1 against the identical-window DuckDB
oracle; these tests pin an INDEPENDENT evaluation order — multi-source
BFS over the 4-connected grid, which equals the L1 metric transform in
free space — and the zero-Python plan claim."""

import numpy as np
import pytest

from etf_topox_spark.operators.raster_ccl import H, W, raster_fg
from etf_topox_spark.operators.raster_distance import (
    l1_distance_field,
    raster_distance_l1,
)


@pytest.fixture(scope="module")
def bfs_dist() -> np.ndarray:
    GX, GY = np.meshgrid(
        np.arange(W, dtype=np.int64), np.arange(H, dtype=np.int64)
    )
    fg = raster_fg(GX, GY)
    inf = np.int64(1 << 20)
    d = np.where(fg, np.int64(0), inf)
    while True:
        n = d.copy()
        np.minimum(n[1:, :], d[:-1, :] + 1, out=n[1:, :])
        np.minimum(n[:-1, :], d[1:, :] + 1, out=n[:-1, :])
        np.minimum(n[:, 1:], d[:, :-1] + 1, out=n[:, 1:])
        np.minimum(n[:, :-1], d[:, 1:] + 1, out=n[:, :-1])
        if np.array_equal(n, d):
            return d
        d = n


def test_field_matches_bfs_replay(spark, bfs_dist):
    got = l1_distance_field(spark).toPandas()
    assert len(got) == W * H
    exp = bfs_dist[got["gy"].to_numpy(), got["gx"].to_numpy()]
    assert (got["dist"].to_numpy() == exp).all()


def test_histogram_and_checksum(spark, bfs_dist):
    GX, GY = np.meshgrid(
        np.arange(W, dtype=np.int64), np.arange(H, dtype=np.int64)
    )
    fg = raster_fg(GX, GY)
    rows = raster_distance_l1(spark, "").collect()
    got = {r.dist: (r.n_px, r.sum_xy) for r in rows}
    for dist in np.unique(bfs_dist):
        m = bfs_dist == dist
        assert got[int(dist)] == (int(m.sum()), int((GX[m] + GY[m]).sum()))
    assert got[0][0] == int(fg.sum())  # dist-0 class IS the foreground
    assert sum(n for n, _ in got.values()) == W * H


def test_plan_is_pure_catalyst(spark):
    plan = l1_distance_field(spark)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, marker
