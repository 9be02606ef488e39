"""Single-process oracle for topology validation (SURVEY.md §5.2 item 3).

Runs the same *semantics* as operators.topology on one pandas frame — no
cells, no partitioning, plain python group/graph logic — so any drift
introduced by cell partitioning, cover-explosion, point-ownership dedup or
the distributed CC algorithm shows up as a set difference.

Geometry primitives (exact int predicates) are shared with the engine on
purpose: they are deterministic pure functions; what this oracle must NOT
share is the distribution machinery, and it doesn't.
"""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from etf_topox_spark.functions import coords as X
from etf_topox_spark.functions import geom
from etf_topox_spark.operators import topology_codes as codes

ERR_COLS = ["theme", "error_code", "x", "y", "feature_a", "feature_b"]


def _edges_pdf(rings: pd.DataFrame) -> pd.DataFrame:
    recs = []
    for r in rings.itertuples(index=False):
        xs = np.asarray(r.xs, np.float64)
        ys = np.asarray(r.ys, np.float64)
        for s in range(len(xs) - 1):
            h1 = int(X.pack_point(np.array([xs[s]]), np.array([ys[s]]))[0])
            h2 = int(X.pack_point(np.array([xs[s + 1]]), np.array([ys[s + 1]]))[0])
            recs.append(
                (
                    r.theme, r.feature_id, r.ring_idx, r.is_exterior, s,
                    xs[s], ys[s], xs[s + 1], ys[s + 1],
                    h1, h2, min(h1, h2), max(h1, h2), h1 <= h2,
                )
            )
    return pd.DataFrame(
        recs,
        columns=[
            "theme", "feature_id", "ring_idx", "is_exterior", "seq",
            "x1", "y1", "x2", "y2", "h1", "h2", "lo_h", "hi_h", "fwd",
        ],
    )


def validate_topology_oracle(rings: pd.DataFrame) -> pd.DataFrame:
    edges = _edges_pdf(rings)
    errs: list[tuple] = []

    zero = edges[edges.h1 == edges.h2]
    for r in zero.itertuples(index=False):
        errs.append((r.theme, codes.INVALID_EDGE, r.x1, r.y1, r.feature_id, r.feature_id))
    ok = edges[edges.h1 != edges.h2].reset_index(drop=True)

    # duplicate / overlapping boundaries
    grp = ok.groupby(["theme", "lo_h", "hi_h"])
    stats = grp.agg(
        n=("fwd", "size"),
        n_fwd=("fwd", "sum"),
        mid_x=("x1", lambda s: 0.0),  # filled below
    )
    und = {}
    for (theme, lo, hi), g in grp:
        feats = sorted(set(g.feature_id))
        mid_x = float((g.x1.iloc[0] + g.x2.iloc[0]) / 2)
        mid_y = float((g.y1.iloc[0] + g.y2.iloc[0]) / 2)
        n, n_fwd = len(g), int(g.fwd.sum())
        und[(theme, lo, hi)] = (n, feats)
        fa = feats[0]
        fb = feats[1] if len(feats) > 1 else feats[0]
        if n > 2:
            errs.append((theme, codes.DUPLICATE_BOUNDARY, mid_x, mid_y, fa, fb))
        elif n == 2 and (n_fwd == 2 or n_fwd == 0):
            errs.append((theme, codes.OVERLAPPING_BOUNDARY, mid_x, mid_y, fa, fb))

    # intersections: one global kernel run, dedup identical reports
    I, J, px, py, same_ring = geom.segment_intersections(
        ok.x1.to_numpy(), ok.y1.to_numpy(), ok.x2.to_numpy(), ok.y2.to_numpy(),
        ok.feature_id.to_numpy(), ok.ring_idx.to_numpy(),
    )
    seen = set()
    for i, j, x_, y_, sr in zip(I, J, px, py, same_ring):
        fa = int(min(ok.feature_id[i], ok.feature_id[j]))
        fb = int(max(ok.feature_id[i], ok.feature_id[j]))
        code = codes.RING_SELF_INTERSECTION if sr else codes.EDGE_INTERSECTION
        key = (ok.theme[i], code, float(x_), float(y_), fa, fb)
        if key not in seen:
            seen.add(key)
            errs.append(key)

    # free-standing surfaces: union-find over shared-edge adjacency
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    feats_by_theme: dict[str, set] = collections.defaultdict(set)
    for r in rings.itertuples(index=False):
        feats_by_theme[r.theme].add(r.feature_id)
        find(r.feature_id)
    for (theme, lo, hi), (n, feats) in und.items():
        for f in feats[1:]:
            union(feats[0], f)
    anchors = {}
    for r in rings.itertuples(index=False):
        if r.is_exterior:
            k = (r.theme, r.feature_id)
            mx, my = float(min(r.xs)), float(min(r.ys))
            if k not in anchors or (mx, my) < anchors[k]:
                anchors[k] = (mx, my)
    for theme, feats in feats_by_theme.items():
        comp = collections.defaultdict(list)
        for f in feats:
            comp[find(f)].append(f)
        main = max(comp.items(), key=lambda kv: (len(kv[1]), -kv[0]))[0]
        for root, members in comp.items():
            if root == main:
                continue
            for f in members:
                ax, ay = anchors[(theme, f)]
                errs.append((theme, codes.FREE_STANDING_SURFACE, ax, ay, f, f))

    # invalid interiors
    holes = ok[~ok.is_exterior]
    for (theme, fid, ridx), g in holes.groupby(["theme", "feature_id", "ring_idx"]):
        max_n = max(und[(theme, lo, hi)][0] for lo, hi in zip(g.lo_h, g.hi_h))
        if max_n == 1:
            ring = rings[
                (rings.theme == theme)
                & (rings.feature_id == fid)
                & (rings.ring_idx == ridx)
            ].iloc[0]
            errs.append(
                (theme, codes.EMPTY_INTERIOR,
                 float(min(ring["xs"])), float(min(ring["ys"])), fid, fid)
            )

    # orientation
    for r in rings.itertuples(index=False):
        a2 = geom.ring_area2(np.asarray(r.xs, np.float64), np.asarray(r.ys, np.float64))
        if (r.is_exterior and a2 <= 0) or (not r.is_exterior and a2 >= 0):
            errs.append(
                (r.theme, codes.RING_ORIENTATION, float(min(r.xs)), float(min(r.ys)),
                 r.feature_id, r.feature_id)
            )

    return pd.DataFrame(errs, columns=ERR_COLS)
