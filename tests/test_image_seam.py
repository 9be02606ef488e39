"""Seam-carving DP (operators/image_seam.py).

The driver checks image_seam_carve against the list-state recursive-CTE
oracle; these tests pin a plain-python DP replay over the REAL generator
pixels and the seam-cost sandwich bound."""

import numpy as np
import pytest

from etf_topox_spark.operators.image_seam import BIG, seam_costs
from etf_topox_spark.sources.images import image_meta, image_pixels


def _dp(e: np.ndarray):
    m = e[0].astype(np.int64).copy()
    for y in range(1, e.shape[0]):
        pad = np.concatenate(([BIG], m, [BIG]))
        m = e[y] + np.minimum(np.minimum(pad[:-2], pad[1:-1]), pad[2:])
    return m


@pytest.fixture(scope="module")
def result(spark):
    return {int(r.image_id): r for r in seam_costs(spark).collect()}


def test_matches_python_dp_replay(result):
    for i in range(0, 120, 7):
        w, h, _, _ = image_meta(i)
        e = image_pixels(i, w, h)[..., 0].astype(np.int64)
        m = _dp(e)
        r = result[i]
        assert (r.h, r.w) == (h, w)
        assert r.seam_cost == int(m.min())
        assert r.end_x == int(np.nonzero(m == m.min())[0][0])
        assert r.last_row_sum == int(m.sum())


def test_seam_cost_sandwich(result):
    # each DP step adds at least the row minimum and at most the row max
    for i, r in result.items():
        w, h, _, _ = image_meta(i)
        e = image_pixels(i, w, h)[..., 0].astype(np.int64)
        assert e.min(axis=1).sum() <= r.seam_cost <= e.max(axis=1).sum()
        assert 0 <= r.end_x < w
