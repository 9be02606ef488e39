"""Randomized exactness: the spatial joins against independent python
oracles on seeded-random inputs (not the handcrafted fixtures). Catches
classes the fixtures can't: irregular polygons, probe/corpus overlap,
degenerate-margin top-k ties."""

from __future__ import annotations

import numpy as np
import pytest

from etf_topox_spark.operators.spatial import knn_join, pip_join


def _random_points(spark, n, seed, lo=0.0, hi=8.0, id_offset=0):
    rng = np.random.RandomState(seed)
    x = np.round(rng.uniform(lo, hi, n), 4)  # round → exact doubles
    y = np.round(rng.uniform(lo, hi, n), 4)
    return (
        spark.createDataFrame(
            [(int(i + id_offset), float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))],
            "point_id long, x double, y double",
        ),
        x,
        y,
    )


def _random_convex_rings(spark, n_polys, seed):
    """Random convex polygons (CCW hulls of round-coordinate points)."""
    rng = np.random.RandomState(seed)
    rows = []
    polys = []
    for fid in range(n_polys):
        cx, cy = rng.uniform(1, 7, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, rng.randint(3, 7)))
        r = rng.uniform(0.3, 1.2)
        xs = np.round(cx + r * np.cos(ang), 3)
        ys = np.round(cy + r * np.sin(ang), 3)
        xs = np.append(xs, xs[0])
        ys = np.append(ys, ys[0])
        rows.append((fid, "t", 0, True, [float(v) for v in xs], [float(v) for v in ys]))
        polys.append((fid, xs, ys))
    df = spark.createDataFrame(
        rows,
        "feature_id long, theme string, ring_idx int, is_exterior boolean, "
        "xs array<double>, ys array<double>",
    )
    return df, polys


def _pip_oracle(px, py, polys):
    """Boundary-inclusive even-odd PIP, min-feature winner, python floats
    promoted through the same int scaling as the kernel."""
    from etf_topox_spark.functions.coords import coord_to_int

    out = {}
    for pid, (qx, qy) in enumerate(zip(px, py)):
        best = None
        X, Y = int(coord_to_int(np.array([qx]))[0]), int(coord_to_int(np.array([qy]))[0])
        for fid, xs, ys in polys:
            xi = coord_to_int(xs).astype(object)
            yi = coord_to_int(ys).astype(object)
            inside = False
            on_edge = False
            for k in range(len(xi) - 1):
                x1, y1, x2, y2 = int(xi[k]), int(yi[k]), int(xi[k + 1]), int(yi[k + 1])
                cross = (x2 - x1) * (Y - y1) - (y2 - y1) * (X - x1)
                if (cross == 0 and min(x1, x2) <= X <= max(x1, x2)
                        and min(y1, y2) <= Y <= max(y1, y2)):
                    on_edge = True
                if (y1 > Y) != (y2 > Y):
                    lhs = (X - x1) * (y2 - y1)
                    rhs = (Y - y1) * (x2 - x1)
                    if (y2 - y1 > 0 and lhs < rhs) or (y2 - y1 < 0 and lhs > rhs):
                        inside = not inside
            if inside or on_edge:
                best = fid if best is None else min(best, fid)
        if best is not None:
            out[pid] = best
    return out


@pytest.mark.parametrize("seed", [11, 23])
def test_pip_random_convex_vs_python_oracle(spark, seed):
    rings, polys = _random_convex_rings(spark, 12, seed)
    pts, px, py = _random_points(spark, 400, seed + 1)
    expect = _pip_oracle(px, py, polys)
    for strategy in ("broadcast", "shuffle"):
        got = {
            r["point_id"]: r["feature_id"]
            for r in pip_join(spark, pts, rings, strategy=strategy).collect()
        }
        assert got == expect, strategy


@pytest.mark.parametrize("seed", [5])
def test_knn_random_vs_brute_force(spark, seed):
    corpus_df, cx, cy = _random_points(spark, 3_000, seed)
    probes_df, px, py = _random_points(spark, 120, seed + 1, id_offset=10_000)
    k = 4
    expect = []
    for i, (qx, qy) in enumerate(zip(px, py)):
        d2 = (qx - cx) ** 2 + (qy - cy) ** 2
        order = sorted(range(len(cx)), key=lambda j: (d2[j], j))[:k]
        expect += [(10_000 + i, j, rn + 1) for rn, j in enumerate(order)]
    for strategy in ("broadcast", "shuffle"):
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["rn"])
            for r in knn_join(spark, probes_df, corpus_df, k=k, strategy=strategy).collect()
        )
        assert got == sorted(expect), strategy
