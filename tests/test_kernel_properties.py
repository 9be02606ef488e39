"""Pure-numpy property tests for the spatial kernel internals — no Spark
session, so these run in milliseconds and can afford many random trials.

- _pip_winner must be invariant to its cache-blocking chunk size;
- _knn_topk_block must return exactly the brute-force top-k with ties
  broken by neighbor_id, for any chunking.
"""

from __future__ import annotations

import numpy as np
import pytest

from etf_topox_spark.functions.coords import coord_to_int
from etf_topox_spark.operators import spatial as S


def _square_segs(x0, y0, side, fid):
    xs = np.array([x0, x0 + side, x0 + side, x0, x0], np.float64)
    ys = np.array([y0, y0, y0 + side, y0 + side, y0], np.float64)
    return (
        coord_to_int(xs[:-1]), coord_to_int(ys[:-1]),
        coord_to_int(xs[1:]), coord_to_int(ys[1:]),
        fid,
    )


def _stack_polys(polys):
    x1 = np.concatenate([p[0] for p in polys])
    y1 = np.concatenate([p[1] for p in polys])
    x2 = np.concatenate([p[2] for p in polys])
    y2 = np.concatenate([p[3] for p in polys])
    offs = np.arange(0, 4 * len(polys), 4, dtype=np.int64)
    feats = np.array([p[4] for p in polys], np.int64)
    return x1, y1, x2, y2, offs, feats


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pip_winner_chunk_invariant(seed, monkeypatch):
    rng = np.random.RandomState(seed)
    polys = [_square_segs(*rng.uniform(0, 8, 2), rng.uniform(0.5, 2.0), fid)
             for fid in range(10)]
    segs = _stack_polys(polys)
    qx = coord_to_int(np.round(rng.uniform(0, 10, 3000), 4))
    qy = coord_to_int(np.round(rng.uniform(0, 10, 3000), 4))
    base = S._pip_winner(qx, qy, segs)
    # force pathological chunkings through the internal blocking by
    # slicing the query set at awkward boundaries
    for cut in (1, 7, 997):
        parts = [S._pip_winner(qx[i:i + cut], qy[i:i + cut], segs)
                 for i in range(0, len(qx), cut)]
        assert np.array_equal(np.concatenate(parts), base), cut


@pytest.mark.parametrize("seed", [3, 4])
def test_knn_topk_block_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    n, m, k = 200, 500, 5
    px, py = rng.uniform(0, 4, n), rng.uniform(0, 4, n)
    # quantized corpus coords → frequent exact distance ties
    gx = np.round(rng.uniform(0, 4, m), 1)
    gy = np.round(rng.uniform(0, 4, m), 1)
    qid = np.arange(n) * 10
    gid = rng.permutation(m).astype(np.int64)
    q, n_, d_, rn = S._knn_topk_block(px, py, qid, gx, gy, gid, k)
    got = {}
    for a, b, c, r in zip(q, n_, d_, rn):
        got.setdefault(a, []).append((r, b, c))
    for i in range(n):
        d2 = (px[i] - gx) ** 2 + (py[i] - gy) ** 2
        order = sorted(range(m), key=lambda j: (d2[j], gid[j]))[:k]
        expect = [(r + 1, gid[j], d2[j]) for r, j in enumerate(order)]
        assert sorted(got[qid[i]]) == expect, i
