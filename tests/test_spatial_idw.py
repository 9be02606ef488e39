"""Integer-exact IDW interpolation (operators/spatial_idw.py).

The driver checks spatial_idw_grid against the SQL twin; these tests pin
a numpy replay, the interpolation axioms the oracle can't see (estimates
bounded by the station value range, near-station cells pulled to the
station value), and the broadcast plan shape."""

import numpy as np
import pytest

from etf_topox_spark.operators.spatial_idw import (
    GRID,
    SUP,
    WSCALE,
    _station_rows,
    idw_supertiles,
)


@pytest.fixture(scope="module")
def field() -> np.ndarray:
    GX, GY = np.meshgrid(
        np.arange(GRID, dtype=np.int64), np.arange(GRID, dtype=np.int64)
    )
    sw = np.zeros((GRID, GRID), dtype=np.int64)
    svw = np.zeros((GRID, GRID), dtype=np.int64)
    for _, sx, sy, v in _station_rows():
        d2 = (GX - sx) ** 2 + (GY - sy) ** 2
        w = WSCALE // (1 + d2)
        sw += w
        svw += v * w
    return svw // sw


def test_supertiles_match_numpy_replay(spark, field):
    got = {(r.tx, r.ty): r for r in idw_supertiles(spark).collect()}
    assert len(got) == (GRID // SUP) ** 2
    for tx in range(GRID // SUP):
        for ty in range(GRID // SUP):
            blk = field[ty * SUP:(ty + 1) * SUP, tx * SUP:(tx + 1) * SUP]
            r = got[(tx, ty)]
            assert r.n_cells == SUP * SUP
            assert r.sum_est == int(blk.sum())
            assert (r.min_est, r.max_est) == (int(blk.min()), int(blk.max()))


def test_interpolation_axioms(field):
    vals = [v for _, _, _, v in _station_rows()]
    assert field.min() >= min(vals) - 1 and field.max() <= max(vals)
    for _, sx, sy, v in _station_rows()[:20]:
        # regularized Shepard: the on-station cell carries half the total
        # possible weight, so the estimate lands near the station value
        # unless another station shares the cell neighborhood
        assert abs(int(field[sy, sx]) - v) <= max(vals) // 2


def test_station_table_is_broadcast(spark):
    plan = idw_supertiles(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "SortMergeJoin"):
        assert marker not in plan, marker
