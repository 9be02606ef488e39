"""Invariant tests for the round-3b operators (beyond the DuckDB oracles
that tools/sweep.py replays): pyramid pooling vs a direct numpy oracle,
planted-pair recall for the joint caption+phash dedup, a brute-force
connected-components oracle for grid clustering, shoelace identities for
the polygon stats, and the survivor-is-argmax rule for keep-best."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.dedup import dedup_keep_best
from etf_topox_spark.operators.image_queries import (
    CAP_PREFIX,
    N_CAP_DUPS,
    PYR_LEVELS,
    image_caption_dedup,
    image_pyramid,
)
from etf_topox_spark.operators.spatial_queries import (
    CLUSTER_EPS_MUL,
    CLUSTER_MINPTS,
    geom_polygon_stats,
    spatial_cluster_points,
)
from etf_topox_spark.sources.images import image_meta, image_pixels
from etf_topox_spark.sources.points import _coords


def _pyramid_numpy(i: int) -> list[tuple[int, int, int, int, int]]:
    w, h, _, _ = image_meta(i)
    px = image_pixels(i, w, h).astype(np.int64)
    g = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
    out = []
    lvl = g
    for k in range(PYR_LEVELS):
        if k > 0:
            lvl = lvl[0::2, 0::2] + lvl[0::2, 1::2] + lvl[1::2, 0::2] + lvl[1::2, 1::2]
        out.append((k, lvl.shape[1], lvl.shape[0], int(lvl.sum()), int(lvl.max())))
    return out


def test_image_pyramid_matches_numpy(spark, sf_oracle):
    got = image_pyramid(spark, sf_oracle).toPandas()
    # sum pooling: per-image totals invariant across levels
    for _, grp in got.groupby("image_id"):
        assert len(grp) == PYR_LEVELS
        assert grp["px_sum"].nunique() == 1
        # maxima are non-decreasing with level (sums of positive cells)
        assert grp.sort_values("level")["px_max"].is_monotonic_increasing
    for i in (0, 1, 2, 17):
        rows = got[got["image_id"] == f"img-{i:012d}"].sort_values("level")
        expect = _pyramid_numpy(i)
        assert [tuple(r) for r in rows[["level", "lw", "lh", "px_sum", "px_max"]].to_numpy()] == expect


def test_image_caption_dedup_planted_pairs(spark, sf_oracle):
    got = image_caption_dedup(spark, sf_oracle).toPandas()
    # "cdup_" < "img-" lexically, so planted pairs carry the copy as img_a
    planted = got[got["img_a"].str.startswith(CAP_PREFIX)]
    assert len(planted) == N_CAP_DUPS
    assert (planted["hamming"] == 0).all()
    # caption-collision pairs (i vs i+1000, different pixels) must only
    # appear when their hashes genuinely land within threshold; planted
    # copies must be exactly the (cdup_img-i, img-i) pairs
    ids = planted["img_b"].str.slice(-12).astype(int).sort_values().to_numpy()
    assert (ids == np.arange(N_CAP_DUPS)).all()


def test_spatial_cluster_points_vs_bruteforce(spark, sf_oracle):
    got = spatial_cluster_points(spark, sf_oracle).toPandas()

    # brute-force: rebuild the fixture, grid it, CC via label sweep
    ids = np.arange(20000)
    x, y = _coords(ids)
    rj = np.arange(2000)
    x = np.concatenate([x, 1.0 + (rj * 5).astype(np.float64) / 1000.0])
    y = np.concatenate([y, 4.0 + (rj * 25).astype(np.float64) / 10000.0])
    cx = np.floor(x * CLUSTER_EPS_MUL).astype(np.int64)
    cy = np.floor(y * CLUSTER_EPS_MUL).astype(np.int64)
    cells = pd.DataFrame({"cx": cx, "cy": cy}).groupby(["cx", "cy"]).size()
    dense = cells[cells >= CLUSTER_MINPTS]
    keys = {(a, b): a * 64 + b for a, b in dense.index}
    label = {k: k for k in keys.values()}

    def find(k):
        while label[k] != k:
            label[k] = label[label[k]]
            k = label[k]
        return k

    for (a, b), k in keys.items():
        for da in (-1, 0, 1):
            for db in (-1, 0, 1):
                nb = (a + da, b + db)
                if nb in keys and nb != (a, b):
                    ra, rb = find(k), find(keys[nb])
                    if ra != rb:
                        label[max(ra, rb)] = min(ra, rb)
    comp = {}
    for (a, b), k in keys.items():
        comp.setdefault(find(k), []).append(dense[(a, b)])
    expect = sorted((r, len(v), int(sum(v))) for r, v in comp.items())
    assert [tuple(r) for r in got[["cluster_id", "n_cells", "n_points"]].to_numpy()] == expect
    # the ridge must actually merge cells: at least one multi-cell cluster
    assert (got["n_cells"] > 1).any()


def test_geom_polygon_stats_shoelace(spark, sf_oracle):
    got = geom_polygon_stats(spark, sf_oracle).toPandas()
    assert len(got) == 5000
    # perturbed side-2 squares: simple, CCW; the ring always contains the
    # unit square [1,2]² and sits inside [0,3]² → area ∈ (1, 9), and each
    # side has dx-or-dy ∈ (1,3) with cross-offset < 1 → perimeter ∈ (4, 4√10)
    assert (got["area"] > 1.0).all() and (got["area"] < 9.0).all()
    assert (got["perimeter"] > 4.0).all() and (got["perimeter"] < 13.0).all()
    # cross-check one feature against an independent shoelace in numpy
    row = got[got["feature_id"] == 7].iloc[0]
    from etf_topox_spark.operators.spatial_queries import _QUAD_CORNERS
    from etf_topox_spark.sources.points import DIV, KX, KY, M

    i = 7
    xs, ys = [], []
    for _, bx, by, px, py in _QUAD_CORNERS:
        xs.append(((i * KX) % M) / DIV + bx + ((i * px) % 1000) / 1000.0)
        ys.append(((i * KY) % M) / DIV + by + ((i * py) % 1000) / 1000.0)
    xs, ys = np.array(xs), np.array(ys)
    area = 0.5 * np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)
    assert row["area"] == pytest.approx(area, rel=1e-12)
    per = np.sum(np.hypot(np.roll(xs, -1) - xs, np.roll(ys, -1) - ys))
    assert row["perimeter"] == pytest.approx(per, rel=1e-12)


def test_dedup_keep_best_survivor_is_argmax(spark, sf_oracle):
    got = dedup_keep_best(spark, sf_oracle).toPandas()
    assert len(got) > 0
    assert (got["n_dropped"] >= 1).all()
    # mutated copies add 3 repeated-vocabulary tokens: for ≤64-token docs the
    # length factor rises while TTR falls — either member may win, but the
    # survivor's quality must be ≥ every member's recomputed score
    from etf_topox_spark.operators.dedup import MUT_OFFSET, N_MUTATED

    docs = pd.read_parquet(f"{sf_oracle}/documents.parquet")[["doc_id", "text"]]
    mut = docs[docs.doc_id < N_MUTATED].copy()
    mut["doc_id"] += MUT_OFFSET
    mut["text"] += " mutated suffix token"
    corpus = pd.concat([docs, mut]).set_index("doc_id")["text"]

    def quality(t: str) -> float:
        toks = t.strip().split()
        return min(len(toks) / 64.0, 1.0) * (len(set(toks)) / len(toks))

    for r in got.itertuples(index=False):
        assert r.survivor_quality == pytest.approx(quality(corpus[r.survivor_id]))
        # cluster root is the min member id; its survivor outscores the root
        assert r.survivor_quality >= quality(corpus[r.cluster_id]) - 1e-15


def test_spatial_heatmap_smooth_invariants(spark, sf_oracle):
    from etf_topox_spark.operators.spatial_queries import spatial_heatmap_smooth

    got = spatial_heatmap_smooth(spark, sf_oracle).toPandas()
    # every point lands in exactly one occupied cell
    assert got["n"].sum() == 20000
    # box kernel includes the cell itself
    assert (got["n_smooth"] >= got["n"]).all()
    # cross-check one cell's neighborhood total by brute force
    ids = np.arange(20000)
    x, y = _coords(ids)
    cx = np.floor(x * 2.0).astype(np.int64)
    cy = np.floor(y * 2.0).astype(np.int64)
    r = got.iloc[len(got) // 2]
    mask = (np.abs(cx - r["cx"]) <= 1) & (np.abs(cy - r["cy"]) <= 1)
    assert r["n_smooth"] == int(mask.sum())
    own = (cx == r["cx"]) & (cy == r["cy"])
    assert r["n"] == int(own.sum())


def test_cell_rollup_pyramid_levels_tile(spark, sf_oracle):
    from etf_topox_spark.functions import cells as C
    from etf_topox_spark.operators.export import _ROLLUP_N, _ROLLUP_RESES, cell_rollup_pyramid

    got = cell_rollup_pyramid(spark, sf_oracle).toPandas()
    # every level partitions all points
    for r in _ROLLUP_RESES:
        lvl = got[got["res"] == r]
        assert lvl["n"].sum() == _ROLLUP_N
        assert lvl["cell"].is_unique
    # each child's count is folded into exactly its bit-shift parent
    fine = got[got["res"] == _ROLLUP_RESES[0]]
    for r in _ROLLUP_RESES[1:]:
        parents = C.cell_to_parent(fine["cell"].to_numpy(), r)
        expect = (
            pd.DataFrame({"cell": parents, "n": fine["n"].to_numpy()})
            .groupby("cell", as_index=False)["n"].sum()
            .sort_values("cell").reset_index(drop=True)
        )
        lvl = got[got["res"] == r][["cell", "n"]].sort_values("cell").reset_index(drop=True)
        assert lvl.reset_index(drop=True).equals(expect.astype(lvl.dtypes.to_dict()))


def test_geom_simplify_collinear_recovers_corners(spark, sf_oracle):
    from etf_topox_spark.operators.spatial_queries import (
        _SIMPLIFY_GRID,
        geom_simplify_collinear,
    )

    got = geom_simplify_collinear(spark, sf_oracle).toPandas()
    nfeat = _SIMPLIFY_GRID * _SIMPLIFY_GRID
    # exactly the 4 corners + closing repeat per ring survive
    assert len(got) == nfeat * 5
    assert (got.groupby("feature_id").size() == 5).all()
    # ring stays closed and corners are the exact lattice points
    for fid in (0, nfeat // 2, nfeat - 1):
        ring = got[got["feature_id"] == fid].sort_values("seq")
        x0, y0 = float(fid % _SIMPLIFY_GRID), float(fid // _SIMPLIFY_GRID)
        assert ring[["x", "y"]].to_numpy().tolist() == [
            [x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1], [x0, y0 + 1], [x0, y0],
        ]


def test_geom_simplify_identity_on_non_collinear_rings(spark, sf_oracle):
    """On rings with NO collinear vertices (perturbed quads), the keep
    rule is the identity: every vertex survives with its coords intact."""
    from etf_topox_spark.operators.spatial_queries import simplify_collinear_points

    rng = np.random.default_rng(7)
    rows = []
    for fid in range(20):
        base = rng.uniform(0, 10, 2)
        corners = [
            base + [0, 0] + rng.uniform(0.05, 0.95, 2),
            base + [2, 0] + rng.uniform(0.05, 0.95, 2),
            base + [2, 2] + rng.uniform(0.05, 0.95, 2),
            base + [0, 2] + rng.uniform(0.05, 0.95, 2),
        ]
        ring = corners + [corners[0]]
        rows += [(fid, i, float(p[0]), float(p[1])) for i, p in enumerate(ring)]
    d = spark.createDataFrame(rows, "feature_id long, idx int, x double, y double")
    got = simplify_collinear_points(d).toPandas()
    assert len(got) == 20 * 5
    back = got.sort_values(["feature_id", "seq"]).reset_index(drop=True)
    exp = pd.DataFrame(rows, columns=["feature_id", "idx", "x", "y"])
    assert (back["x"].to_numpy() == exp["x"].to_numpy()).all()
    assert (back["y"].to_numpy() == exp["y"].to_numpy()).all()


def test_trajectory_steps_match_numpy(spark, sf_oracle):
    from etf_topox_spark.operators.spatial_queries import (
        N_OBJECTS,
        N_TRAJ,
        trajectory_steps,
    )

    got = trajectory_steps(spark, sf_oracle).toPandas()
    assert len(got) == N_TRAJ - N_OBJECTS  # every object loses its t=0 row
    ids = np.arange(N_TRAJ)
    x, y = _coords(ids)
    obj, t = ids % N_OBJECTS, ids // N_OBJECTS
    for o in (0, 7, N_OBJECTS - 1):
        sel = np.argsort(t[obj == o])
        ox, oy = x[obj == o][sel], y[obj == o][sel]
        exp = np.sqrt(np.diff(ox) ** 2 + np.diff(oy) ** 2)
        g = got[got["object_id"] == o].sort_values("t")["step_dist"].to_numpy()
        assert np.array_equal(g, exp)
