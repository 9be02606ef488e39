"""Halo-exchange focal analysis (operators/raster_focal.py).

The driver checks raster_focal_halo against the scatter-and-regroup DuckDB
oracle; these tests pin single-node replay equality, tile-size invariance,
and that the halo exchange is load-bearing (dropping received halo pixels
changes the answer — the stage-2 path is not vacuous)."""

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.raster_ccl import H, W, raster_fg
from etf_topox_spark.operators.raster_focal import (
    _focal_sum,
    _hist_rows,
    _interior_slices,
    _stage1,
    focal_histogram,
)


@pytest.fixture(scope="module")
def replay() -> pd.DataFrame:
    GX, GY = np.meshgrid(
        np.arange(W, dtype=np.int64), np.arange(H, dtype=np.int64)
    )
    fg = raster_fg(GX, GY)
    ns = _focal_sum(fg)
    rows = _hist_rows(fg, ns)
    return (
        pd.DataFrame(rows, columns=["is_fg", "nsum", "n_px"])
        .sort_values(["is_fg", "nsum"])
        .reset_index(drop=True)
    )


def test_distributed_matches_single_node_replay(spark, replay):
    got = focal_histogram(spark).toPandas()
    pd.testing.assert_frame_equal(got, replay, check_dtype=False)
    assert int(got["n_px"].sum()) == W * H  # every pixel counted once


def test_tile_size_invariance(spark):
    a = focal_histogram(spark, tile=64).toPandas()
    b = focal_histogram(spark, tile=32).toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_halo_exchange_is_load_bearing(replay):
    # recompute the stage-1 + stage-2 decomposition single-node, but drop
    # every received halo pixel: the border-ring focal sums must change,
    # proving stage 2 genuinely depends on the exchanged strips
    t, tiles_x, tiles_y = 64, W // 64, H // 64
    agg: dict[tuple[int, int], int] = {}

    def add(rows):
        for is_fg, nsum, cnt in rows:
            agg[(is_fg, nsum)] = agg.get((is_fg, nsum), 0) + cnt

    for tid in range(tiles_x * tiles_y):
        tx, ty = tid % tiles_x, tid // tiles_x
        GX, GY = np.meshgrid(
            np.arange(tx * t, tx * t + t, dtype=np.int64),
            np.arange(ty * t, ty * t + t, dtype=np.int64),
        )
        fg = raster_fg(GX, GY)
        ns = _focal_sum(fg)  # NO halo: zero padding at tile edges
        add(_hist_rows(fg, ns))
    wrong = (
        pd.DataFrame(
            [(k[0], k[1], v) for k, v in agg.items()],
            columns=["is_fg", "nsum", "n_px"],
        )
        .sort_values(["is_fg", "nsum"])
        .reset_index(drop=True)
    )
    assert not wrong.equals(replay), "halo-free tiles reproduced the truth?!"


def test_stage1_emits_only_fg_border_halo():
    pdf = _stage1(0, 64, W // 64, H // 64)
    halo = pdf[pdf["kind"] == 1]
    # every halo row is a genuine fg pixel on this tile's 1-px border ring
    for _, r in halo.iterrows():
        assert raster_fg(np.array([r.gx]), np.array([r.gy]))[0]
        assert r.gx in (0, 63) or r.gy in (0, 63)
    sy, sx = _interior_slices(0, 0, W // 64, H // 64, 64)
    assert (sy.start, sx.start) == (0, 0)  # raster-edge tile: edge rows local
