"""Round-4c operator tests: pairwise change detection, column-profile
registration, quadtree compaction, DTW — independent python/numpy replays
(the DuckDB oracle parity runs in the sweep)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etf_topox_spark.registry import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def test_change_detection_matches_numpy_replay(spark):
    from etf_topox_spark.operators.image_change import CH_T, N_CH_PAIRS
    from etf_topox_spark.sources.images import image_meta, image_pixels

    out = QUERIES["image_change_detection"](spark, SF).toPandas()
    assert len(out) == N_CH_PAIRS
    for r in out.itertuples(index=False):
        k = r.pair_id
        w, h, _, _ = image_meta(k)
        ra = image_pixels(k, w, h)[:, :, 0].astype(np.int64)
        rb = image_pixels(k + 3 * N_CH_PAIRS, w, h)[:, :, 0].astype(np.int64)
        d = np.abs(ra - rb)
        assert r.n_px == d.size
        assert r.n_changed == int((d >= CH_T).sum())
        assert r.sad == int(d.sum())
        assert r.max_abs == int(d.max())
        assert r.size_class == k % 3


def test_column_align_matches_numpy_replay(spark):
    from etf_topox_spark.operators.image_change import N_AL_PAIRS, SHIFT
    from etf_topox_spark.sources.images import image_meta, image_pixels

    out = QUERIES["image_column_align"](spark, SF).toPandas()
    assert len(out) == N_AL_PAIRS
    for r in out.itertuples(index=False):
        k = r.pair_id
        w, h, _, _ = image_meta(k)
        ca = image_pixels(k, w, h)[:, :, 0].astype(np.int64).sum(axis=0)
        cb = image_pixels(k + 3 * N_AL_PAIRS, w, h)[:, :, 0].astype(np.int64).sum(axis=0)
        best = None
        for s in range(-SHIFT, SHIFT + 1):
            lo_a, hi_a = max(0, -s), min(w, w - s)
            ssd = int(((ca[lo_a:hi_a] - cb[lo_a + s:hi_a + s]) ** 2).sum())
            cand = (ssd, s, hi_a - lo_a)
            if best is None or cand[:2] < best[:2]:
                best = cand
        assert (r.best_ssd, r.best_shift, r.n_overlap_cols) == best


def test_cell_compact_expansion_identity(spark):
    """Expanding the compacted cover back to the finest resolution must
    reproduce EXACTLY the occupied cell set — the defining property of
    compaction (H3 uncompactCells round-trip)."""
    from etf_topox_spark.operators.cell_compact import (
        BLOCK,
        MICRO,
        N_COMPACT,
        RES,
        compact_cover,
    )
    from etf_topox_spark.sources.points import _coords

    cover = compact_cover(spark).toPandas()
    # no cell in the cover may be an ancestor or descendant of another
    expanded: set[tuple[int, int]] = set()
    for r in cover.itertuples(index=False):
        f = 1 << (RES - r.res)
        for dx in range(f):
            for dy in range(f):
                key = (r.cx * f + dx, r.cy * f + dy)
                assert key not in expanded, f"overlap at {key}"
                expanded.add(key)

    ids = np.arange(N_COMPACT, dtype=np.int64)
    x, y = _coords(ids)
    mx = np.round(x * 1_000_000).astype(np.int64)
    my = np.round(y * 1_000_000).astype(np.int64)
    keep = (mx // BLOCK + my // BLOCK) % 3 != 0
    occ = set(
        zip(
            (mx[keep] * (1 << RES)) // MICRO,
            (my[keep] * (1 << RES)) // MICRO,
        )
    )
    assert expanded == occ


def test_dtw_matches_python_replay(spark):
    from etf_topox_spark.operators.trajectory_stay import DTW_L, N_DTW_PAIRS

    out = QUERIES["trajectory_dtw"](spark, SF).toPandas()
    assert len(out) == N_DTW_PAIRS
    t = np.arange(DTW_L, dtype=np.int64)
    for r in out.itertuples(index=False):
        p = r.pair_id
        xa = (p * 131 + t * 17 + (t * t) % 23) % 400
        ya = (p * 57 + t * 13 + (t * t * t) % 19) % 400
        xb = (p * 131 + t * 19 + ((t + 3) * t) % 29) % 400
        yb = (p * 57 + t * 11 + ((t + 5) * t) % 31) % 400
        c = (xa[:, None] - xb[None, :]) ** 2 + (ya[:, None] - yb[None, :]) ** 2
        D = np.full((DTW_L, DTW_L), 0, dtype=np.int64)
        D[0] = c[0].cumsum()
        for i in range(1, DTW_L):
            D[i, 0] = D[i - 1, 0] + c[i, 0]
            for j in range(1, DTW_L):
                D[i, j] = c[i, j] + min(D[i - 1, j], D[i - 1, j - 1], D[i, j - 1])
        assert r.dtw_cost == D[-1, -1]
        # DTW lower bound: at least the cost of the best single alignment
        # column/row (sanity: positive and >= the diagonal's min element)
        assert r.dtw_cost >= int(c.diagonal().min())
