"""Ripley's K pair bucketing (operators/spatial_ripley.py).

The driver checks spatial_ripley_k against the brute-force SQL oracle;
these tests pin the numpy brute-force replay, CSR closeness of the
scatter (the statistic is non-degenerate at every radius), and the
monotone growth of K."""

import numpy as np
import pytest

from etf_topox_spark.operators.spatial_ripley import (
    AREA,
    M,
    N_RIPLEY,
    RADII,
    ripley_k,
)


@pytest.fixture(scope="module")
def brute() -> dict[int, int]:
    i = np.arange(N_RIPLEY, dtype=np.int64)
    x = (i * i * 9973 + i * 12345 + 67) % M
    y = (i * i * 7459 + i * 54321 + 11) % M
    counts = {r: 0 for r in RADII}
    for s in range(0, N_RIPLEY, 1000):
        dx = x[s:s + 1000, None] - x[None, :]
        dy = y[s:s + 1000, None] - y[None, :]
        d2 = dx * dx + dy * dy
        mask = np.arange(s, s + 1000)[:, None] < np.arange(N_RIPLEY)[None, :]
        for r in counts:
            counts[r] += int(((d2 <= r * r) & mask).sum())
    return counts


def test_bucketed_counts_match_brute_force(spark, brute):
    got = {r.r: (r.n_pairs, r.k_scaled) for r in ripley_k(spark).collect()}
    assert set(got) == set(RADII)
    for r in RADII:
        assert got[r][0] == brute[r], r
        assert got[r][1] == 2 * AREA * brute[r] // (N_RIPLEY * (N_RIPLEY - 1))


def test_scatter_is_csr_like(brute):
    import math

    for r in RADII:
        expect = N_RIPLEY * (N_RIPLEY - 1) / 2 * math.pi * r * r / AREA
        assert abs(brute[r] - expect) <= 0.08 * expect, (r, brute[r], expect)


def test_k_grows_monotonically(spark):
    rows = ripley_k(spark).collect()
    ks = [r.k_scaled for r in rows]
    assert ks == sorted(ks) and all(k > 0 for k in ks)
