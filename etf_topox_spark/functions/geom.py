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
        ci, cj = ii[bi], bj
        keep = _not_point_touch(X1, Y1, X2, Y2, bxmin, bxmax, bymin, bymax, ci, cj)
        out_i.append(ci[keep])
        out_j.append(cj[keep])
    I = np.concatenate(out_i) if out_i else np.empty(0, np.int64)
    J = np.concatenate(out_j) if out_j else np.empty(0, np.int64)
    if len(I) == 0:
        return _EMPTY
    return _pair_tests(X1, Y1, X2, Y2, Xo1, Yo1, Xo2, Yo2, feat, ring, I, J)


def segment_intersections_grouped(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    feat: np.ndarray,
    ring: np.ndarray,
    cells: np.ndarray,
):
    """segment_intersections applied per cell, for MANY cells in ONE
    kernel call — the form the per-partition topology kernel uses.

    The per-cell loop pays ~30 small-numpy calls per cell; at millions of
    cells per partition that per-call overhead IS the stage cost (measured
    ~2 ms/cell ≈ 14 s single-proc on the 800×800 scaling mosaic while the
    actual element work is < 2 s). Here the work is batched:

    - rows stable-sort by cell (within-cell order — and therefore each
      pair's (I, J) orientation and reported point — is preserved exactly
      as the per-cell loop produced them);
    - cells of EQUAL row-count stack into one (g, s, s) bbox-overlap mask
      evaluated in a single broadcast expression (chunked so a chunk's
      mask stays ≤ ~32M elements) — the same 4-comparison candidate mask
      the per-cell form builds, amortized over g cells per numpy call.
      A sweep-style sort on bxmin degenerates here (axis-aligned gridded
      edges tie on bxmin, candidate ranges blow up ~100×: measured 67 s
      vs 14 s); the dense per-cell mask with both axes prefiltering is
      the right shape, it just must not be issued one cell at a time;
    - cells larger than _BIG_CELL fall back to the per-cell blocked path
      (skew guard, same as segment_intersections' own block loop);
    - two exact candidate kills run between the mask and the tests:
      endpoint-on-endpoint single-point touches (_not_point_touch — the
      dominant class on meshes: every ring-corner adjacency) and identical
      directed duplicates (R8's province). Both classes are provably
      rejected by the exact tests, but at ~20 int64 passes per candidate
      they were the stage's DRAM bill: pruning them dropped the 800×800
      mosaic's intersection stage 13.4→7.7 s at 2 cores and fixed the
      32-core collapse (22.7→4.5 s, where 32 workers streaming full
      candidate sets saturated the memory bus);
    - exact sign tests run ONCE over all surviving candidates
      (_pair_tests), not per cell.

    Cross products only ever see coordinate DIFFERENCES of same-cell pairs
    (bounded by cell extent + edge length), so the batch-global
    min-translation gives the same overflow headroom as the per-cell one.

    Returns (I, J, px, py, same_ring, cellv): I/J index the INPUT arrays,
    cellv is the cell each pair was generated in.
    """
    Xo1, Yo1 = coord_to_int(x1), coord_to_int(y1)
    Xo2, Yo2 = coord_to_int(x2), coord_to_int(y2)
    n = len(Xo1)
    empty6 = _EMPTY + (np.empty(0, np.int64),)
    if n < 2:
        return empty6
    ox = min(int(Xo1.min()), int(Xo2.min()))
    oy = min(int(Yo1.min()), int(Yo2.min()))
    X1, X2, Y1, Y2 = Xo1 - ox, Xo2 - ox, Yo1 - oy, Yo2 - oy
    bxmin, bxmax = np.minimum(X1, X2), np.maximum(X1, X2)
    bymin, bymax = np.minimum(Y1, Y2), np.maximum(Y1, Y2)

    order = np.argsort(cells, kind="stable")
    starts_all = np.nonzero(np.r_[True, cells[order][1:] != cells[order][:-1]])[0]
    sizes_all = np.diff(np.r_[starts_all, n])
    bxmin_s, bxmax_s = bxmin[order], bxmax[order]
    bymin_s, bymax_s = bymin[order], bymax[order]
    # sorted-space endpoint copies: the candidate kills gather per-pair
    # coordinates, and candidate indices in SORTED space are near-
    # sequential (same cell ⇒ adjacent rows) while order[]-mapped indices
    # scatter across the partition — running the kills sorted-side and
    # mapping only the survivors through order[] cuts the random-gather
    # traffic by the kill ratio (~4× on mesh fixtures).
    X1_s, Y1_s = X1[order], Y1[order]
    X2_s, Y2_s = X2[order], Y2[order]

    cand_i: list[np.ndarray] = []
    cand_j: list[np.ndarray] = []
    for s in np.unique(sizes_all):
        if s < 2:
            continue
        cstarts = starts_all[sizes_all == s]
        if s > _BIG_CELL:
            # skew guard: huge cells keep the blocked per-cell path
            for st in cstarts:
                ii, jj = _block_candidates(
                    bxmin_s[st : st + s], bxmax_s[st : st + s],
                    bymin_s[st : st + s], bymax_s[st : st + s],
                )
                ci, cj = ii + st, jj + st
                keep = _not_point_touch(
                    X1_s, Y1_s, X2_s, Y2_s,
                    bxmin_s, bxmax_s, bymin_s, bymax_s, ci, cj,
                )
                cand_i.append(ci[keep])
                cand_j.append(cj[keep])
            continue
        tri = np.arange(s)[:, None] < np.arange(s)[None, :]  # j > i, (s, s)
        g_chunk = max(1, (32 << 20) // int(s * s))
        for c0 in range(0, len(cstarts), g_chunk):
            cs = cstarts[c0 : c0 + g_chunk]
            idx = cs[:, None] + np.arange(s)[None, :]  # (g, s) row gather
            bx0, bx1 = bxmin_s[idx], bxmax_s[idx]
            by0, by1 = bymin_s[idx], bymax_s[idx]
            m = (
                (bx0[:, :, None] <= bx1[:, None, :])
                & (bx1[:, :, None] >= bx0[:, None, :])
                & (by0[:, :, None] <= by1[:, None, :])
                & (by1[:, :, None] >= by0[:, None, :])
                & tri[None, :, :]
            )
            gi, ii, jj = np.nonzero(m)
            ci, cj = cs[gi] + ii, cs[gi] + jj
            keep = _not_point_touch(
                X1_s, Y1_s, X2_s, Y2_s,
                bxmin_s, bxmax_s, bymin_s, bymax_s, ci, cj,
            )
            cand_i.append(ci[keep])
            cand_j.append(cj[keep])
    if not cand_i:
        return empty6
    I_s = np.concatenate(cand_i)
    J_s = np.concatenate(cand_j)
    if len(I_s) == 0:
        return empty6
    # hoist the identical-segment kill ahead of the exact tests: duplicate
    # directed boundary edges (every shared mosaic edge contributes one
    # such pair per owner cell) survive the bbox prefilters with a FULL-box
    # intersection, but are R8's job, never an intersection error — the
    # collinear branch of _pair_tests would reject them anyway, after
    # paying four cross products each. 8 equality gathers (sorted-space,
    # near-sequential) empty the candidate set down to genuine near-misses
    # and hits; only the survivors pay the order[] scatter-map.
    ident = (
        ((X1_s[I_s] == X1_s[J_s]) & (Y1_s[I_s] == Y1_s[J_s])
         & (X2_s[I_s] == X2_s[J_s]) & (Y2_s[I_s] == Y2_s[J_s]))
        | ((X1_s[I_s] == X2_s[J_s]) & (Y1_s[I_s] == Y2_s[J_s])
           & (X2_s[I_s] == X1_s[J_s]) & (Y2_s[I_s] == Y1_s[J_s]))
    )
    if ident.any():
        keep = ~ident
        I_s, J_s = I_s[keep], J_s[keep]
    if len(I_s) == 0:
        return empty6
    I, J = order[I_s], order[J_s]
    # chunk the exact tests so per-candidate intermediates stay cache-sized
    # (tens of millions of candidates × ~20 live arrays would stream GBs
    # through DRAM); chunk boundaries don't change any per-pair value.
    step = 2_000_000
    if len(I) <= step:
        res = _pair_tests(X1, Y1, X2, Y2, Xo1, Yo1, Xo2, Yo2, feat, ring, I, J)
        return res + (cells[res[0]],)
    parts = [
        _pair_tests(
            X1, Y1, X2, Y2, Xo1, Yo1, Xo2, Yo2, feat, ring,
            I[s0 : s0 + step], J[s0 : s0 + step],
        )
        for s0 in range(0, len(I), step)
    ]
    res = tuple(np.concatenate([p[k] for p in parts]) for k in range(5))
    return res + (cells[res[0]],)


_BIG_CELL = 4096


def _not_point_touch(X1, Y1, X2, Y2, bxmin, bxmax, bymin, bymax, I, J):
    """Keep-mask dropping candidate pairs whose bboxes intersect in EXACTLY
    one point P that is an ENDPOINT OF BOTH segments. Any meeting of such a
    pair is confined to P, and P being a shared endpoint makes it plain
    ring adjacency — never an error. On gridded mosaics this is the
    DOMINANT candidate class (every pair of edges sharing a vertex:
    perpendicular ring corners AND collinear same-line neighbors), and
    pruning it here spares the ~20-pass int64 pipeline of _pair_tests,
    which would reject each of them anyway.

    The endpoint-of-both check is essential, not an optimization nicety:
    a horizontal and a vertical edge CROSSING properly also intersect
    bboxes in a single point (both boxes are degenerate lines), so the
    single-point test alone would drop real errors. T-junctions keep their
    error status too: the touch point is an endpoint of one segment but
    interior to the other, so end_b (or end_a) fails and the pair flows on
    to the exact tests."""
    px = np.maximum(bxmin[I], bxmin[J])
    qx = np.minimum(bxmax[I], bxmax[J])
    py = np.maximum(bymin[I], bymin[J])
    qy = np.minimum(bymax[I], bymax[J])
    single = (px == qx) & (py == qy)
    keep = np.ones(len(I), np.bool_)
    w = np.nonzero(single)[0]
    if len(w) == 0:
        return keep
    Iw, Jw = I[w], J[w]
    pxw, pyw = px[w], py[w]
    end_a = ((X1[Iw] == pxw) & (Y1[Iw] == pyw)) | (
        (X2[Iw] == pxw) & (Y2[Iw] == pyw)
    )
    end_b = ((X1[Jw] == pxw) & (Y1[Jw] == pyw)) | (
        (X2[Jw] == pxw) & (Y2[Jw] == pyw)
    )
    keep[w[end_a & end_b]] = False
    return keep


def _block_candidates(bxmin, bxmax, bymin, bymax, block: int = 1024):
    """Blocked O(n²/block) bbox candidate pairs for ONE oversized cell —
    the same loop segment_intersections runs, extracted for the grouped
    form's skew fallback."""
    n = len(bxmin)
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
    return (
        np.concatenate(out_i) if out_i else np.empty(0, np.int64),
        np.concatenate(out_j) if out_j else np.empty(0, np.int64),
    )


def _pair_tests(X1, Y1, X2, Y2, Xo1, Yo1, Xo2, Yo2, feat, ring, I, J):
    """Exact improper-meeting tests + reported point for candidate pairs
    (I, J). Shared tail of segment_intersections / _grouped — semantics
    documented there.

    Laid out hot-path-first: every DECISION runs on the translated int64
    arrays; the float64 reporting coordinates are gathered ONLY for the
    pairs that actually hit (on dense fixtures > 99.9% of bbox candidates
    are clean ring adjacencies, and materializing eight full-length float
    copies for them dominated the kernel — measured 7.6 s of astype on a
    21M-candidate batch for 0 hits). Formulas and evaluation order are
    unchanged, so reported points stay bit-identical."""
    p1x, p1y, p2x, p2y = X1[I], Y1[I], X2[I], Y2[I]
    q1x, q1y, q2x, q2y = X1[J], Y1[J], X2[J], Y2[J]

    d1r = (p2x - p1x) * (q1y - p1y) - (p2y - p1y) * (q1x - p1x)  # q1 vs p
    d2r = (p2x - p1x) * (q2y - p1y) - (p2y - p1y) * (q2x - p1x)  # q2 vs p
    d3r = (q2x - q1x) * (p1y - q1y) - (q2y - q1y) * (p1x - q1x)  # p1 vs q
    d4r = (q2x - q1x) * (p2y - q1y) - (q2y - q1y) * (p2x - q1x)  # p2 vs q
    d1, d2, d3, d4 = _sign(d1r), _sign(d2r), _sign(d3r), _sign(d4r)

    px = np.zeros(len(I), np.float64)
    py = np.zeros(len(I), np.float64)
    hit = np.zeros(len(I), np.bool_)

    def _f(a):
        return a.astype(np.float64)

    # 1. proper crossing: strict sign opposition both ways
    w = np.nonzero((d1 * d2 < 0) & (d3 * d4 < 0))[0]
    if len(w):
        t = _f(d1r[w]) / _f(d1r[w] - d2r[w])
        Jw = J[w]
        oq1x, oq1y = _f(Xo1[Jw]), _f(Yo1[Jw])
        px[w] = oq1x + t * (_f(Xo2[Jw]) - oq1x)
        py[w] = oq1y + t * (_f(Yo2[Jw]) - oq1y)
        hit[w] = True

    # 2. collinear overlap of positive length (not the identical segment)
    w = np.nonzero((d1 == 0) & (d2 == 0))[0]
    if len(w):
        identical = (
            ((p1x[w] == q1x[w]) & (p1y[w] == q1y[w])
             & (p2x[w] == q2x[w]) & (p2y[w] == q2y[w]))
            | ((p1x[w] == q2x[w]) & (p1y[w] == q2y[w])
               & (p2x[w] == q1x[w]) & (p2y[w] == q1y[w]))
        )
        w = w[~identical]
    if len(w):
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
            Iw = I[w]
            op1x, op1y = _f(Xo1[Iw]), _f(Yo1[Iw])
            px[w] = op1x + t * (_f(Xo2[Iw]) - op1x)
            py[w] = op1y + t * (_f(Yo2[Iw]) - op1y)
            hit[w] = True

    # 3. T-junction: an endpoint strictly inside the other edge
    def _between(ax, ay, bx, by, cx, cy):
        return (
            (np.minimum(ax, bx) <= cx) & (cx <= np.maximum(ax, bx))
            & (np.minimum(ay, by) <= cy) & (cy <= np.maximum(ay, by))
            & ~((cx == ax) & (cy == ay)) & ~((cx == bx) & (cy == by))
        )

    noncol = ~((d1 == 0) & (d2 == 0))
    for dsig, ex, ey, second_endpoint, on_p in (
        (d1, q1x, q1y, False, True),   # q1 on p — report q1
        (d2, q2x, q2y, True, True),    # q2 on p — report q2
        (d3, p1x, p1y, False, False),  # p1 on q — report p1
        (d4, p2x, p2y, True, False),   # p2 on q — report p2
    ):
        wc = np.nonzero(noncol & (dsig == 0) & ~hit)[0]
        if len(wc) == 0:
            continue
        if on_p:
            bet = _between(p1x[wc], p1y[wc], p2x[wc], p2y[wc], ex[wc], ey[wc])
        else:
            bet = _between(q1x[wc], q1y[wc], q2x[wc], q2y[wc], ex[wc], ey[wc])
        w = wc[bet]
        if len(w):
            src = J[w] if on_p else I[w]
            ox_arr, oy_arr = (Xo2, Yo2) if second_endpoint else (Xo1, Yo1)
            px[w], py[w] = _f(ox_arr[src]), _f(oy_arr[src])
            hit[w] = True

    keep = np.nonzero(hit)[0]
    I, J = I[keep], J[keep]
    same_ring = (feat[I] == feat[J]) & (ring[I] == ring[J])
    return (I, J, px[keep] / SCALE, py[keep] / SCALE, same_ring)
