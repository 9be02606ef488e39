"""Tile pyramid rollup (operators/tile_pyramid.py).

The driver checks tile_pyramid_rollup against the per-level direct
GROUP BY oracle; these tests pin the pyramid algebra (mass conservation
per level, parent = sum of its 4 children) and the plan shape (pure
Catalyst, no point explosion)."""

import pytest

from etf_topox_spark.operators.tile_pyramid import (
    N_PYR_POINTS,
    Z_MAX,
    tile_pyramid,
)


@pytest.fixture(scope="module")
def pyr(spark):
    return tile_pyramid(spark).collect()


def test_every_level_conserves_mass(pyr):
    for z in range(Z_MAX + 1):
        rows = [r for r in pyr if r.z == z]
        assert sum(r.n_points for r in rows) == N_PYR_POINTS, z
        assert sum(r.sum_id for r in rows) == N_PYR_POINTS * (N_PYR_POINTS - 1) // 2
        for r in rows:  # tiles stay inside the zoom's grid
            assert 0 <= r.tx < (1 << z) and 0 <= r.ty < (1 << z)


def test_parent_is_sum_of_children(pyr):
    by_key = {(r.z, r.tx, r.ty): r for r in pyr}
    for r in pyr:
        if r.z == 0:
            continue
        p = by_key[(r.z - 1, r.tx // 2, r.ty // 2)]
        kids = [
            by_key.get((r.z, 2 * (r.tx // 2) + dx, 2 * (r.ty // 2) + dy))
            for dx in (0, 1)
            for dy in (0, 1)
        ]
        assert p.n_points == sum(k.n_points for k in kids if k)
        assert p.sum_id == sum(k.sum_id for k in kids if k)


def test_plan_is_pure_catalyst_no_explode(spark):
    plan = tile_pyramid(spark)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "Generate", "Expand"):
        assert marker not in plan, marker
