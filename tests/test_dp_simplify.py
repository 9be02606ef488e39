"""Douglas-Peucker simplification: exact agreement with an independent
recursive reference, the closed-form bumped-fixture expectation, and the
within-tolerance guarantee on randomized polylines. (The driver entry is
rows-only — DP's data-dependent recursion is not SQL-expressible — so this
file IS the operator's exactness check.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.spatial_queries import (
    _DP_BUMP_EVEN,
    _DP_BUMP_ODD,
    _DP_GRID,
    _DP_TOL,
    dp_fixture_rings,
    dp_keep_mask,
    geom_simplify_dp,
)


def _dp_reference(x, y, tol):
    """Textbook recursive RDP, written independently of the engine kernel
    (recursive calls, scalar loop distances, same strict->keep rule and
    first-max tiebreak)."""
    n = len(x)
    keep = [False] * n
    keep[0] = keep[n - 1] = True

    def rec(i, j):
        if j - i < 2:
            return
        dx, dy = x[j] - x[i], y[j] - y[i]
        L2 = dx * dx + dy * dy
        best_k, best_d2 = -1, -1.0
        for m in range(i + 1, j):
            px, py = x[m] - x[i], y[m] - y[i]
            if L2 == 0.0:
                d2 = px * px + py * py
            else:
                cr = dx * py - dy * px
                d2 = cr * cr / L2
            if d2 > best_d2:
                best_k, best_d2 = m, d2
        if best_d2 > tol * tol:
            keep[best_k] = True
            rec(i, best_k)
            rec(best_k, j)

    rec(0, n - 1)
    return np.array(keep)


def test_dp_matches_independent_reference_on_fixture(spark):
    rows = dp_fixture_rings(spark).collect()
    assert len(rows) == _DP_GRID * _DP_GRID
    for r in rows:
        x = np.array(r["xs"])
        y = np.array(r["ys"])
        got = dp_keep_mask(x, y, _DP_TOL)
        want = _dp_reference(x, y, _DP_TOL)
        assert (got == want).all(), f"feature {r['feature_id']}"


def test_dp_fixture_closed_form(spark):
    """Even features collapse to their 4 corners + closing vertex (the
    small bump and the exactly-collinear quarter points all fall under
    tol). Odd features keep the ring anchor, the 4 tall bumps, and the
    closing vertex — and DROP the other 3 corners: the bump-to-bump chords
    pass within tol of them, a classic DP artifact worth pinning (the
    operator simplifies against the recursion's chords, not the original
    edges)."""
    pdf = geom_simplify_dp(spark, "unused").toPandas()
    sizes = pdf.groupby("feature_id").size()
    for fid, sz in sizes.items():
        assert sz == (6 if fid % 2 else 5), (fid, sz)
    # every surviving vertex of an even feature is an integer corner
    ev = pdf[pdf.feature_id % 2 == 0]
    assert (ev.x == ev.x.round()).all() and (ev.y == ev.y.round()).all()
    # odd features: exactly 4 non-integer vertices, displaced by the bump;
    # the remaining two are the (identical) anchor and closing corner
    od = pdf[pdf.feature_id % 2 == 1]
    bumps = od[(od.x != od.x.round()) | (od.y != od.y.round())]
    assert (bumps.groupby("feature_id").size() == 4).all()
    corners = od[(od.x == od.x.round()) & (od.y == od.y.round())]
    per = corners.groupby("feature_id")
    assert (per.size() == 2).all()
    assert (per.x.nunique() == 1).all() and (per.y.nunique() == 1).all()
    # a bump sits half a unit along one axis and _DP_BUMP_ODD off the other
    fx = bumps.x - np.floor(bumps.x)
    fy = bumps.y - np.floor(bumps.y)
    frac = {round(v, 6) for v in pd.concat([fx, fy]).unique()}
    assert frac <= {0.0, 0.5, _DP_BUMP_ODD, round(1 - _DP_BUMP_ODD, 6)}
    assert _DP_BUMP_EVEN < _DP_TOL < _DP_BUMP_ODD  # fixture sanity


def test_dp_within_tolerance_guarantee():
    """Every dropped vertex lies within tol of the segment it was dropped
    under — i.e. of SOME kept segment. Randomized polylines, fixed seed."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(5, 60))
        x = np.cumsum(rng.normal(0, 1, n))
        y = np.cumsum(rng.normal(0, 1, n))
        tol = float(rng.uniform(0.1, 2.0))
        keep = dp_keep_mask(x, y, tol)
        kx, ky = x[keep], y[keep]
        kept_idx = np.nonzero(keep)[0]
        for m in np.nonzero(~keep)[0]:
            # the kept segment spanning m
            s = np.searchsorted(kept_idx, m) - 1
            i, j = kept_idx[s], kept_idx[s + 1]
            dx, dy = x[j] - x[i], y[j] - y[i]
            L2 = dx * dx + dy * dy
            px, py = x[m] - x[i], y[m] - y[i]
            d2 = (px * px + py * py) if L2 == 0 else (dx * py - dy * px) ** 2 / L2
            assert d2 <= tol * tol + 1e-12


def test_dp_keeps_endpoints_and_short_lines():
    x = np.array([0.0, 1.0])
    y = np.array([0.0, 1.0])
    assert dp_keep_mask(x, y, 0.5).all()
    x3 = np.array([0.0, 0.5, 1.0])
    y3 = np.array([0.0, 0.0, 0.0])
    m = dp_keep_mask(x3, y3, 0.1)
    assert m[0] and m[2] and not m[1]
