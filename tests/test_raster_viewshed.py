"""Viewshed (operators/raster_viewshed.py).

The driver checks raster_viewshed against the NOT EXISTS SQL twin; these
tests pin a Fraction-exact python replay (true rational angles, no cross
multiplication — an independent formulation) and the horizon monotonicity
property."""

from fractions import Fraction

import pytest

from etf_topox_spark.operators.raster_viewshed import (
    OBS_UP,
    OBS_X,
    OBS_Y,
    RAYS,
    WS,
    _h_obs,
    viewshed,
)


def _h(x: int, y: int) -> int:
    px = ((x // 32) * 7919 + 13) % 32
    py = ((y // 32) * 104729 + 7) % 32
    return abs(x % 32 - px) + abs(y % 32 - py)


@pytest.fixture(scope="module")
def replay():
    ho = _h_obs() + OBS_UP
    out = {}
    for ray, (dx, dy) in enumerate(RAYS):
        horizon = None
        vis, max_vis, first_hidden, n_steps = 0, 0, -1, 0
        t = 1
        while True:
            gx, gy = OBS_X + dx * t, OBS_Y + dy * t
            if not (0 <= gx < WS and 0 <= gy < WS):
                break
            n_steps += 1
            ang = Fraction(_h(gx, gy) - ho, t)
            if horizon is None or ang > horizon:
                vis += 1
                max_vis = t
                horizon = ang
            elif first_hidden < 0:
                first_hidden = t
            if horizon is not None and ang > horizon:
                horizon = ang
            t += 1
        out[ray] = (n_steps, vis, max_vis, first_hidden)
    return out


def test_matches_fraction_replay(spark, replay):
    got = {
        r.ray: (r.n_steps, r.n_visible, r.max_visible_step, r.first_hidden_step)
        for r in viewshed(spark).collect()
    }
    assert got == replay


def test_occlusion_happens(replay):
    # the DEM has ridges: most rays must lose visibility somewhere, and
    # no ray may see more cells than it has steps
    occluded = sum(1 for n, v, _, fh in replay.values() if fh > 0 and v < n)
    assert occluded >= len(RAYS) // 2
    for n, v, mx, _ in replay.values():
        assert 1 <= v <= n and mx <= n * max(max(abs(a), abs(b)) for a, b in RAYS)
