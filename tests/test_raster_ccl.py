"""Distributed two-stage raster CCL (operators/raster_ccl.py).

The driver already checks raster_ccl against the recursive-CTE DuckDB
oracle; these tests pin the properties the oracle alone can't see:
single-node replay equality, tile-size invariance (the stage-2 merge is
a pure refactoring of the labeling, not an approximation), and that the
merge path is genuinely exercised (components really span tiles)."""

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.raster_ccl import (
    H,
    TILE,
    W,
    ccl_components,
    local_ccl,
    raster_fg,
)


@pytest.fixture(scope="module")
def full_mask():
    gx = np.arange(W, dtype=np.int64)
    gy = np.arange(H, dtype=np.int64)
    GX, GY = np.meshgrid(gx, gy)
    fg = raster_fg(GX, GY)
    return GX, GY, fg


def _single_node_stats(GX, GY, fg) -> pd.DataFrame:
    pid = GY * W + GX
    lab = local_ccl(fg, pid)  # whole raster as one "tile" = ground truth
    df = pd.DataFrame({"comp_id": lab[fg], "gx": GX[fg], "gy": GY[fg]})
    out = (
        df.groupby("comp_id")
        .agg(
            n_px=("gx", "size"),
            min_x=("gx", "min"),
            min_y=("gy", "min"),
            max_x=("gx", "max"),
            max_y=("gy", "max"),
            sum_x=("gx", "sum"),
            sum_y=("gy", "sum"),
        )
        .reset_index()
        .sort_values("comp_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    return out


def test_mask_nontrivial(full_mask):
    _, _, fg = full_mask
    assert 5_000 < int(fg.sum()) < W * H // 4  # neither empty nor dense


def test_distributed_equals_single_node(spark, full_mask):
    GX, GY, fg = full_mask
    ref = _single_node_stats(GX, GY, fg)
    got = (
        ccl_components(spark, TILE)
        .toPandas()
        .sort_values("comp_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, ref)


def test_tile_size_invariance(spark):
    d64 = (
        ccl_components(spark, 64)
        .toPandas()
        .sort_values("comp_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    d32 = (
        ccl_components(spark, 32)
        .toPandas()
        .sort_values("comp_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(d64, d32)


def test_merge_path_exercised(spark, full_mask):
    """At TILE=64 many components must straddle a tile border — i.e. their
    bbox crosses a multiple of 64 — otherwise stage 2 is vacuously green."""
    got = ccl_components(spark, TILE).toPandas()
    crosses = (
        (got["min_x"] // TILE != got["max_x"] // TILE)
        | (got["min_y"] // TILE != got["max_y"] // TILE)
    )
    assert int(crosses.sum()) >= 20, f"only {int(crosses.sum())} spanning comps"


def test_local_ccl_labels_are_component_min(full_mask):
    """Every label equals the minimum pid inside its component (the rule
    both the crack merge and the SQL oracle rely on)."""
    GX, GY, fg = full_mask
    pid = GY * W + GX
    lab = local_ccl(fg, pid)
    labs = lab[fg]
    pids = pid[fg]
    mins = pd.Series(pids).groupby(labs).min()
    assert (mins.index.to_numpy() == mins.to_numpy()).all()
