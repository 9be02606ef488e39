"""Exact geometry kernels for topology validation (SURVEY.md §2.A R6-R12).

Determinism rules (SURVEY.md §7 "hardest residual risks" #1): every
*decision* (orientation, crossing, collinearity, betweenness) is made on
scaled int64 coordinates with sign tests only — no float comparisons, no
atan2 — so results are identical across partitions, platforms and the
single-process numpy oracle. Floats appear only in *reported* intersection
coordinates, computed by one fixed formula over the ORIGINAL (untranslated)
integer coordinates, so the same pair reports the bit-identical point no
matter which cell's kernel instance evaluates it.

Coordinates arrive as exact doubles (fixtures are on a 2^-20-representable
grid), are snapped to int64 via functions.coords.coord_to_int; cross
products are taken after local translation so magnitudes stay far from
overflow (ring/cell extents ≤ ~2^22 scaled units → products ≤ 2^44).
"""

from __future__ import annotations

import numpy as np

from etf_topox_spark.functions.coords import SCALE, coord_to_int


def ring_area2(xs: np.ndarray, ys: np.ndarray) -> int:
    """Exact doubled signed area (shoelace) of one closed ring, in scaled-int
    units. Positive = CCW. Local translation keeps int64 exact."""
    xi = coord_to_int(xs)
    yi = coord_to_int(ys)
    xi = xi - xi.min()
    yi = yi - yi.min()
    return int(np.sum(xi[:-1] * yi[1:] - xi[1:] * yi[:-1], dtype=np.int64))


def ring_area2_batch(
    xf: np.ndarray, yf: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Exact doubled signed areas for MANY closed rings at once: the flat
    concatenated coordinate arrays plus per-ring (start, len) offsets.
    Identical per-ring semantics to ring_area2 (int64 shoelace after
    per-ring min-translation) but one reduceat pass instead of a Python
    loop per ring — the batch form ring_meta's kernel runs per Arrow batch."""
    if len(lens) == 0:
        return np.empty(0, np.int64)
    xi = coord_to_int(xf)
    yi = coord_to_int(yf)
    xi = xi - np.repeat(np.minimum.reduceat(xi, starts), lens)
    yi = yi - np.repeat(np.minimum.reduceat(yi, starts), lens)
    # cross terms between consecutive flat positions; the term at each
    # ring's last vertex pairs it with the NEXT ring's first vertex — zeroed
    term = np.zeros(len(xi), np.int64)
    term[:-1] = xi[:-1] * yi[1:] - xi[1:] * yi[:-1]
    term[starts + lens - 1] = 0
    return np.add.reduceat(term, starts)


def _sign(v: np.ndarray) -> np.ndarray:
    return np.sign(v).astype(np.int8)


_EMPTY = (
    np.empty(0, np.int64),
    np.empty(0, np.int64),
    np.empty(0, np.float64),
    np.empty(0, np.float64),
    np.empty(0, np.bool_),
)


def segment_intersections(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    feat: np.ndarray,
    ring: np.ndarray,
    block: int = 1024,
):
    """All-pairs improper-meeting detection for one cell's edge set.

    Reports (i, j, px, py, same_ring) for every pair that
      - properly crosses (interiors intersect at a point), or
      - is collinear and overlaps over positive length (and is not the
        identical segment — identical segments are the duplicate-boundary
        check's job, SURVEY.md §2.A R8), or
      - meets in a T (an endpoint strictly interior to the other edge).
    Pairs that only share endpoints (normal ring adjacency) are clean.

    Entirely vectorized; O(n²/block) candidate generation with bbox
    prefilter per block. Exact int sign tests decide; the reported point is
    float64 from one fixed formula on untranslated ints.
    """
    Xo1, Yo1 = coord_to_int(x1), coord_to_int(y1)
    Xo2, Yo2 = coord_to_int(x2), coord_to_int(y2)
    n = len(Xo1)
    if n < 2:
        return _EMPTY
    # local translation for overflow headroom in cross products
    ox = min(int(Xo1.min()), int(Xo2.min()))
    oy = min(int(Yo1.min()), int(Yo2.min()))
    X1, X2, Y1, Y2 = Xo1 - ox, Xo2 - ox, Yo1 - oy, Yo2 - oy
    bxmin, bxmax = np.minimum(X1, X2), np.maximum(X1, X2)
    bymin, bymax = np.minimum(Y1, Y2), np.maximum(Y1, Y2)

    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    for s in range(0, n, block):
        e = min(s + block, n)
        ii = np.arange(s, e)
        m = (
            (bxmin[ii][:, None] <= bxmax[None, :])
            & (bxmax[ii][:, None] >= bxmin[None, :])
            & (bymin[ii][:, None] <= bymax[None, :])
            & (bymax[ii][:, None] >= bymin[None, :])
        )
        m &= np.arange(n)[None, :] > ii[:, None]
        bi, bj = np.nonzero(m)
        out_i.append(ii[bi])
        out_j.append(bj)
    I = np.concatenate(out_i) if out_i else np.empty(0, np.int64)
    J = np.concatenate(out_j) if out_j else np.empty(0, np.int64)
    if len(I) == 0:
        return _EMPTY

    p1x, p1y, p2x, p2y = X1[I], Y1[I], X2[I], Y2[I]
    q1x, q1y, q2x, q2y = X1[J], Y1[J], X2[J], Y2[J]

    d1r = (p2x - p1x) * (q1y - p1y) - (p2y - p1y) * (q1x - p1x)  # q1 vs p
    d2r = (p2x - p1x) * (q2y - p1y) - (p2y - p1y) * (q2x - p1x)  # q2 vs p
    d3r = (q2x - q1x) * (p1y - q1y) - (q2y - q1y) * (p1x - q1x)  # p1 vs q
    d4r = (q2x - q1x) * (p2y - q1y) - (q2y - q1y) * (p2x - q1x)  # p2 vs q
    d1, d2, d3, d4 = _sign(d1r), _sign(d2r), _sign(d3r), _sign(d4r)

    shared_11 = (p1x == q1x) & (p1y == q1y)
    shared_12 = (p1x == q2x) & (p1y == q2y)
    shared_21 = (p2x == q1x) & (p2y == q1y)
    shared_22 = (p2x == q2x) & (p2y == q2y)
    identical = (shared_11 & shared_22) | (shared_12 & shared_21)

    px = np.zeros(len(I), np.float64)
    py = np.zeros(len(I), np.float64)
    hit = np.zeros(len(I), np.bool_)

    # original (untranslated) endpoint coords for reporting — exact float64
    oq1x, oq1y = Xo1[J].astype(np.float64), Yo1[J].astype(np.float64)
    oq2x, oq2y = Xo2[J].astype(np.float64), Yo2[J].astype(np.float64)
    op1x, op1y = Xo1[I].astype(np.float64), Yo1[I].astype(np.float64)
    op2x, op2y = Xo2[I].astype(np.float64), Yo2[I].astype(np.float64)

    # 1. proper crossing: strict sign opposition both ways
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper.any():
        w = np.nonzero(proper)[0]
        t = d1r[w].astype(np.float64) / (d1r[w] - d2r[w]).astype(np.float64)
        px[w] = oq1x[w] + t * (oq2x[w] - oq1x[w])
        py[w] = oq1y[w] + t * (oq2y[w] - oq1y[w])
        hit |= proper

    # 2. collinear overlap of positive length (not the identical segment)
    collinear = (d1 == 0) & (d2 == 0) & ~identical
    if collinear.any():
        w = np.nonzero(collinear)[0]
        dx = p2x[w] - p1x[w]
        dy = p2y[w] - p1y[w]
        use_x = np.abs(dx) >= np.abs(dy)
        pa = np.where(use_x, p1x[w], p1y[w]).astype(np.int64)
        pb = np.where(use_x, p2x[w], p2y[w]).astype(np.int64)
        qa = np.where(use_x, q1x[w], q1y[w]).astype(np.int64)
        qb = np.where(use_x, q2x[w], q2y[w]).astype(np.int64)
        lo = np.maximum(np.minimum(pa, pb), np.minimum(qa, qb))
        hi = np.minimum(np.maximum(pa, pb), np.maximum(qa, qb))
        ov = hi > lo  # strictly positive overlap (a shared endpoint alone → 0)
        w = w[ov]
        if len(w):
            # t along p from translation-invariant int differences
            mid2 = (lo[ov] + hi[ov]).astype(np.float64)  # 2·mid, exact
            pa_f = pa[ov].astype(np.float64)
            pb_f = pb[ov].astype(np.float64)
            t = (mid2 / 2.0 - pa_f) / (pb_f - pa_f)
            px[w] = op1x[w] + t * (op2x[w] - op1x[w])
            py[w] = op1y[w] + t * (op2y[w] - op1y[w])
            hit[w] = True

    # 3. T-junction: an endpoint strictly inside the other edge
    def _between(ax, ay, bx, by, cx, cy):
        return (
            (np.minimum(ax, bx) <= cx) & (cx <= np.maximum(ax, bx))
            & (np.minimum(ay, by) <= cy) & (cy <= np.maximum(ay, by))
            & ~((cx == ax) & (cy == ay)) & ~((cx == bx) & (cy == by))
        )

    noncol = ~((d1 == 0) & (d2 == 0))
    for dsig, ex, ey, oex, oey, on_p in (
        (d1, q1x, q1y, oq1x, oq1y, True),   # q1 on p
        (d2, q2x, q2y, oq2x, oq2y, True),   # q2 on p
        (d3, p1x, p1y, op1x, op1y, False),  # p1 on q
        (d4, p2x, p2y, op2x, op2y, False),  # p2 on q
    ):
        if on_p:
            tj = noncol & (dsig == 0) & _between(p1x, p1y, p2x, p2y, ex, ey) & ~hit
        else:
            tj = noncol & (dsig == 0) & _between(q1x, q1y, q2x, q2y, ex, ey) & ~hit
        if tj.any():
            w = np.nonzero(tj)[0]
            px[w] = oex[w]
            py[w] = oey[w]
            hit[w] = True

    keep = np.nonzero(hit)[0]
    I, J = I[keep], J[keep]
    same_ring = (feat[I] == feat[J]) & (ring[I] == ring[J])
    return (I, J, px[keep] / SCALE, py[keep] / SCALE, same_ring)
