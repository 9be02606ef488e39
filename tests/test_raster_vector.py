"""raster_contour_topology: crack-edge tracing invariants (pure numpy) and
the Spark pipeline cross-checked against the ORACLED image_mask_moments
twin, plus a planted duplicate-ring defect through the shared topology
validators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etf_topox_spark.operators import topology_codes as codes
from etf_topox_spark.operators.raster_vector import (
    _FID_MUL,
    _GRID,
    trace_mask_loops,
    traced_rings,
)
from etf_topox_spark.operators.topology import (
    boundary_errors,
    rings_to_edges,
    undirected_edge_stats,
)
from etf_topox_spark.registry import QUERIES, load_all_operators

load_all_operators()


def _cc4(b: np.ndarray) -> int:
    h, w = b.shape
    seen = np.zeros_like(b, bool)
    n = 0
    for y in range(h):
        for x in range(w):
            if b[y, x] and not seen[y, x]:
                n += 1
                st = [(y, x)]
                seen[y, x] = True
                while st:
                    cy, cx = st.pop()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = cy + dy, cx + dx
                        if 0 <= ny < h and 0 <= nx < w and b[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            st.append((ny, nx))
    return n


def test_trace_invariants_random_masks():
    """Net shoelace area == fg count; traced edges == crack perimeter;
    every loop closed; no directed crack reused; exterior loops ==
    4-connected fg components; no zero-area loop."""
    rng = np.random.default_rng(7)
    for trial in range(120):
        h, w = rng.integers(1, 14, 2)
        b = rng.random((h, w)) < rng.random()
        loops = trace_mask_loops(b, 0)
        assert sum(a2 for _, _, a2 in loops) / 2 == b.sum()
        pad = np.zeros((h + 2, w + 2), bool)
        pad[1:-1, 1:-1] = b
        per = sum(
            int((pad[1:-1, 1:-1] & ~s).sum())
            for s in (pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:])
        )
        assert sum(len(xs) - 1 for xs, _, _ in loops) == per
        seen = set()
        for xs, ys, a2 in loops:
            assert xs[0] == xs[-1] and ys[0] == ys[-1]
            assert a2 != 0
            for k in range(len(xs) - 1):
                e = (xs[k], ys[k], xs[k + 1], ys[k + 1])
                assert e not in seen
                seen.add(e)
        assert sum(1 for _, _, a2 in loops if a2 > 0) == _cc4(b)


def test_trace_checkerboard_and_hole():
    """Diagonal pixels stay separate loops (fg 4-connectivity); an
    enclosed bg pixel traces as one negative-area hole loop."""
    diag = np.array([[1, 0], [0, 1]], bool)
    loops = trace_mask_loops(diag, 0)
    assert len(loops) == 2 and all(a2 == 2 for _, _, a2 in loops)
    ring = np.ones((3, 3), bool)
    ring[1, 1] = False
    loops = trace_mask_loops(ring, 0)
    areas = sorted(a2 for _, _, a2 in loops)
    assert areas == [-2, 18]  # hole -1, exterior 9 (area2 doubles)


def test_contour_topology_matches_mask_moments(spark, sf_smoke):
    """Traced perimeter == crack perimeter and net area == fg count, row
    for row against the independently ORACLED image_mask_moments; zero
    topology errors on the valid corpus."""
    m = QUERIES["image_mask_moments"](spark, sf_smoke).toPandas().set_index("image_id")
    c = (
        QUERIES["raster_contour_topology"](spark, sf_smoke)
        .toPandas()
        .set_index("image_id")
    )
    assert len(c) == len(m)
    assert (c.perimeter == m.perimeter.loc[c.index]).all()
    assert (c.net_area == m.m00.loc[c.index]).all()
    assert (c.n_topology_errors == 0).all()
    assert (c.n_loops == c.n_exterior + c.n_holes).all()
    assert (c.n_holes > 0).any()  # the corpus does contain hole loops


def test_planted_duplicate_ring_raises_dup_boundary(spark):
    """Traced rings are first-class citizens of the topology engine: a
    same-direction copy of one loop under a new feature_id raises
    OVERLAPPING_BOUNDARY on every edge (n=2, same direction — the
    engine's same-orientation-overlap semantics, topology.py
    boundary_errors), and a second copy pushes n>2 =
    DUPLICATE_BOUNDARY, exactly like the GML/mosaic defect fixtures."""
    rings = traced_rings(spark, n_images=3).localCheckpoint(eager=True)
    first_fid = rings.agg(F.min("feature_id")).collect()[0][0]
    one = rings.filter(F.col("feature_id") == first_fid)
    n_loop_edges = one.select(
        F.sum(F.size("xs") - 1).alias("n")
    ).collect()[0][0]
    dup = one.withColumn(
        "feature_id", F.col("feature_id") + F.lit(1_000_000 * _FID_MUL)
    )
    bad = rings.unionByName(dup)
    stats = undirected_edge_stats(
        rings_to_edges(bad, cell_size=float(_GRID)).filter(
            F.col("h1") != F.col("h2")
        ),
        with_holes=True,
    )
    errs = boundary_errors(stats).toPandas()
    assert len(errs) == n_loop_edges
    assert (errs.error_code == codes.OVERLAPPING_BOUNDARY).all()

    dup2 = one.withColumn(
        "feature_id", F.col("feature_id") + F.lit(2_000_000 * _FID_MUL)
    )
    worse = bad.unionByName(dup2)
    stats2 = undirected_edge_stats(
        rings_to_edges(worse, cell_size=float(_GRID)).filter(
            F.col("h1") != F.col("h2")
        ),
        with_holes=True,
    )
    errs2 = boundary_errors(stats2).toPandas()
    assert len(errs2) == n_loop_edges
    assert (errs2.error_code == codes.DUPLICATE_BOUNDARY).all()
    # and the clean frame raises nothing
    clean = boundary_errors(
        undirected_edge_stats(
            rings_to_edges(rings, cell_size=float(_GRID)).filter(
                F.col("h1") != F.col("h2")
            ),
            with_holes=True,
        )
    )
    assert clean.count() == 0
