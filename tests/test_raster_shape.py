"""CCL shape descriptors (operators/raster_shape.py).

The driver checks raster_ccl_shape against the recursive-CTE adjacency
oracle; these tests pin single-node replay (perimeter from a direct crack
count, not the 4n-2E identity — an independent formula), tile-size
invariance, and agreement with raster_ccl's component inventory."""

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.raster_ccl import H, W, local_ccl, raster_fg
from etf_topox_spark.operators.raster_shape import shape_stats


@pytest.fixture(scope="module")
def replay() -> pd.DataFrame:
    GX, GY = np.meshgrid(
        np.arange(W, dtype=np.int64), np.arange(H, dtype=np.int64)
    )
    fg = raster_fg(GX, GY)
    lab = local_ccl(fg, GY * W + GX)  # whole raster: ground-truth labels
    pad = np.zeros((H + 2, W + 2), dtype=bool)
    pad[1:-1, 1:-1] = fg
    # direct crack count: fg sides facing bg, per pixel, summed per label
    exposed = (
        (~pad[:-2, 1:-1]).astype(np.int64)
        + (~pad[2:, 1:-1])
        + (~pad[1:-1, :-2])
        + (~pad[1:-1, 2:])
    )
    df = pd.DataFrame({
        "comp_id": lab[fg], "gx": GX[fg], "gy": GY[fg], "perim": exposed[fg],
    })
    g = df.groupby("comp_id").agg(
        n_px=("gx", "size"), perimeter=("perim", "sum"),
        min_x=("gx", "min"), max_x=("gx", "max"),
        min_y=("gy", "min"), max_y=("gy", "max"),
    ).reset_index()
    g["bbox_fill_pct"] = (
        10000 * g.n_px // ((g.max_x - g.min_x + 1) * (g.max_y - g.min_y + 1))
    )
    return g[["comp_id", "n_px", "perimeter", "bbox_fill_pct"]].sort_values(
        "comp_id"
    ).reset_index(drop=True)


def test_matches_direct_crack_count_replay(spark, replay):
    got = shape_stats(spark).toPandas()
    pd.testing.assert_frame_equal(got, replay, check_dtype=False)


def test_tile_size_invariance(spark):
    a = shape_stats(spark, tile=64).toPandas()
    b = shape_stats(spark, tile=32).toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_consistent_with_ccl_inventory(spark):
    from etf_topox_spark.operators.raster_ccl import ccl_components

    shapes = {r.comp_id: r for r in shape_stats(spark).collect()}
    comps = ccl_components(spark).collect()
    assert set(shapes) == {r.comp_id for r in comps}
    for c in comps:
        s = shapes[c.comp_id]
        assert s.n_px == c.n_px
        # isoperimetric sanity: a 4-connected blob of n pixels has
        # perimeter between the square's ~4*sqrt(n) and the line's 2n+2
        assert s.perimeter <= 2 * s.n_px + 2
        assert s.perimeter >= 4  # nonempty component
