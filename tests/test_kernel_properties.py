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


# --- candidate-prune differential: pruned funnel ≡ brute-force all-pairs -----

def _brute_pairs(x1, y1, x2, y2, feat, ring):
    """All-pairs _pair_tests with NO bbox mask and NO candidate kills —
    the unpruned reference the production funnel must reproduce exactly."""
    from etf_topox_spark.functions import geom
    from etf_topox_spark.functions.coords import coord_to_int

    Xo1, Yo1 = coord_to_int(x1), coord_to_int(y1)
    Xo2, Yo2 = coord_to_int(x2), coord_to_int(y2)
    n = len(Xo1)
    ox = min(int(Xo1.min()), int(Xo2.min()))
    oy = min(int(Yo1.min()), int(Yo2.min()))
    X1, X2, Y1, Y2 = Xo1 - ox, Xo2 - ox, Yo1 - oy, Yo2 - oy
    I, J = np.triu_indices(n, k=1)
    return geom._pair_tests(
        X1, Y1, X2, Y2, Xo1, Yo1, Xo2, Yo2, feat, ring,
        I.astype(np.int64), J.astype(np.int64),
    )


def _as_set(res):
    I, J, px, py, sr = res[:5]
    return {
        (int(min(i, j)), int(max(i, j)), float(x), float(y), bool(s))
        for i, j, x, y, s in zip(I, J, px, py, sr)
    }


@pytest.mark.parametrize("seed", range(25))
def test_candidate_kills_are_semantics_preserving(seed):
    """The endpoint-touch and identical-segment candidate kills must not
    change the reported pair set: randomized small-integer segment soups
    dense in endpoint touches, collinear overlaps, exact duplicates,
    T-junctions, and proper crossings (including degenerate axis-aligned
    bboxes) — pruned per-cell AND grouped funnels vs unpruned all-pairs."""
    from etf_topox_spark.functions import geom

    rng = np.random.default_rng(seed)
    n = 60
    # endpoints on a coarse lattice → many shared vertices and collinear
    # overlaps; a third of the edges axis-aligned → degenerate bboxes
    x1 = rng.integers(0, 6, n).astype(np.float64)
    y1 = rng.integers(0, 6, n).astype(np.float64)
    x2 = rng.integers(0, 6, n).astype(np.float64)
    y2 = rng.integers(0, 6, n).astype(np.float64)
    ax = rng.random(n) < 0.33
    y2[ax] = y1[ax]  # horizontal
    # drop zero-length segments (filtered upstream by h1 != h2)
    keep = (x1 != x2) | (y1 != y2)
    x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
    m = len(x1)
    # duplicate a handful verbatim (identical-kill food)
    dup = rng.integers(0, m, 6)
    x1 = np.r_[x1, x1[dup]]; y1 = np.r_[y1, y1[dup]]
    x2 = np.r_[x2, x2[dup]]; y2 = np.r_[y2, y2[dup]]
    m = len(x1)
    feat = rng.integers(0, 50, m)
    ring = rng.integers(0, 3, m)

    want = _as_set(_brute_pairs(x1, y1, x2, y2, feat, ring))
    got_cell = _as_set(geom.segment_intersections(x1, y1, x2, y2, feat, ring))
    assert got_cell == want
    # grouped form: all rows in one cell reproduces the per-cell form
    cells = np.zeros(m, np.int64)
    got_grp = _as_set(
        geom.segment_intersections_grouped(x1, y1, x2, y2, feat, ring, cells)
    )
    assert got_grp == want
