"""Pure-numpy unit tests for the cell index, coordinate packing and exact
geometry predicates (no Spark needed — fast feedback)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etf_topox_spark.functions import cells as C
from etf_topox_spark.functions import coords as X
from etf_topox_spark.functions import geom


def test_cell_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 4, 8, 15, 29):
        c = C.latlng_to_cell(lon, lat, res)
        assert (C.cell_res(c) == res).all()
        lo0, la0, lo1, la1 = C.cell_bounds(c)
        assert (lo0 <= lon).all() and (lon <= lo1).all()
        assert (la0 <= lat).all() and (lat <= la1).all()


def test_cell_parent_nesting():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    fine = C.latlng_to_cell(lon, lat, 12)
    coarse = C.latlng_to_cell(lon, lat, 5)
    assert (C.cell_to_parent(fine, 5) == coarse).all()


def test_cell_ring_contains_self_and_neighbors():
    c = C.latlng_to_cell(np.array([10.0]), np.array([20.0]), 8)
    ring = C.cell_ring(c, 1)
    assert ring.shape == (1, 9)
    assert c[0] in ring[0]
    assert len(np.unique(ring[0][ring[0] >= 0])) == 9


def test_cell_ring_wraps_dateline():
    c = C.latlng_to_cell(np.array([-179.99]), np.array([0.0]), 8)
    ring = C.cell_ring(c, 1)[0]
    ring = ring[ring >= 0]
    lo0, _, lo1, _ = C.cell_bounds(ring)
    assert (lo1 > 179.0).any()  # neighbor across the antimeridian


def test_planar_cell_and_cover():
    x = np.array([-3.2, 0.0, 1999.5])
    y = np.array([7.7, 0.0, -1999.5])
    c = C.planar_cell(x, y, 2.0)
    assert len(np.unique(c)) == 3
    cov = C.planar_bbox_cover(
        np.array([0.5]), np.array([0.5]), np.array([3.5]), np.array([3.5]), 2.0
    )[0]
    assert len(cov) == 4  # 2x2 cells
    assert C.planar_cell(np.array([1.0]), np.array([1.0]), 2.0)[0] in cov


@given(
    st.lists(
        st.tuples(
            # packing domain: |coord| < 2^11 units (coords.py docstring)
            st.integers(-2047 * 16, 2047 * 16),
            st.integers(-2047 * 16, 2047 * 16),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_pack_point_injective(pts):
    xs = np.array([p[0] for p in pts], np.float64) / 16.0  # exact 2^-4 grid
    ys = np.array([p[1] for p in pts], np.float64) / 16.0
    h = X.pack_point(xs, ys)
    rx, ry = X.unpack_point(h)
    assert (rx == xs).all() and (ry == ys).all()


def test_pack_point_domain_guard():
    import pytest as _pt

    with _pt.raises(ValueError):
        X.pack_point(np.array([5000.0]), np.array([0.0]))


def test_obj_ref_roundtrip():
    f = np.array([0, 1, 12345678, 2**33], np.int64)
    r = np.array([0, 3, 1023, 7], np.int64)
    s = np.array([0, 9, 2**20 - 1, 42], np.int64)
    ref = X.pack_obj_ref(f, r, s)
    f2, r2, s2 = X.unpack_obj_ref(ref)
    assert (f2 == f).all() and (r2 == r).all() and (s2 == s).all()


def test_ring_area2_signs():
    # CCW unit square → +2 * scale²
    xs = np.array([0.0, 1, 1, 0, 0])
    ys = np.array([0.0, 0, 1, 1, 0])
    a = geom.ring_area2(xs, ys)
    assert a == 2 * (1 << 20) ** 2  # doubled area of a unit square, scaled
    assert a > 0
    assert geom.ring_area2(xs[::-1], ys[::-1]) == -a


def test_segment_intersections_proper_cross():
    # X crossing at (0.5, 0.5)
    x1 = np.array([0.0, 0.0])
    y1 = np.array([0.0, 1.0])
    x2 = np.array([1.0, 1.0])
    y2 = np.array([1.0, 0.0])
    I, J, px, py, sr = geom.segment_intersections(
        x1, y1, x2, y2, np.array([1, 2]), np.array([0, 0])
    )
    assert len(I) == 1 and px[0] == 0.5 and py[0] == 0.5 and not sr[0]


def test_segment_intersections_shared_endpoint_clean():
    # two edges of a ring meeting at a vertex: no report
    x1 = np.array([0.0, 1.0])
    y1 = np.array([0.0, 0.0])
    x2 = np.array([1.0, 1.0])
    y2 = np.array([0.0, 1.0])
    I, *_ = geom.segment_intersections(
        x1, y1, x2, y2, np.array([1, 1]), np.array([0, 0])
    )
    assert len(I) == 0


def test_segment_intersections_collinear_overlap():
    x1 = np.array([0.0, 1.0])
    y1 = np.array([0.0, 0.0])
    x2 = np.array([2.0, 3.0])
    y2 = np.array([0.0, 0.0])
    I, J, px, py, _ = geom.segment_intersections(
        x1, y1, x2, y2, np.array([1, 2]), np.array([0, 0])
    )
    assert len(I) == 1 and px[0] == 1.5 and py[0] == 0.0


def test_segment_intersections_t_junction():
    x1 = np.array([0.0, 1.0])
    y1 = np.array([0.0, -1.0])
    x2 = np.array([2.0, 1.0])
    y2 = np.array([0.0, 0.0])
    I, J, px, py, _ = geom.segment_intersections(
        x1, y1, x2, y2, np.array([1, 2]), np.array([0, 0])
    )
    assert len(I) == 1 and (px[0], py[0]) == (1.0, 0.0)
