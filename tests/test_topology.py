"""Golden topology tests (SURVEY.md §5.2 items 1+3): each defect fixture →
expected error-code multiset, and the distributed result must equal the
single-process numpy oracle exactly (same codes, coordinates, feature refs)
— proving cell partitioning introduces no semantic drift.
"""

from __future__ import annotations

import pandas as pd
import pytest

from etf_topox_spark.operators import topology_codes as codes
from etf_topox_spark.operators.topology import rings_to_edges, validate_topology
from etf_topox_spark.sources.mosaic import mosaic_rings_pandas, surface_mosaic
from tests.topology_oracle import ERR_COLS, validate_topology_oracle

GRID = dict(rows=6, cols=6)

# fixture → expected error-code multiset (counts derived from geometry)
EXPECTED = {
    "valid_mosaic": {},
    # duplicated interior square (2,2): its 4 undirected edges are claimed
    # 3× each (two originals + dup) → DUPLICATE_BOUNDARY ×4; the duplicate
    # exterior also collinear-overlaps nothing beyond those edges
    "dup_boundary": {codes.DUPLICATE_BOUNDARY: 4},
    # bowtie ring: proper self-crossing at the center ×1; its area2 == 0 →
    # RING_ORIENTATION; and its (1,1)→(1,0) edge now runs the SAME direction
    # as the right neighbor's left edge → OVERLAPPING_BOUNDARY ×1
    "self_intersect": {
        codes.RING_SELF_INTERSECTION: 1,
        codes.RING_ORIENTATION: 1,
        codes.OVERLAPPING_BOUNDARY: 1,
    },
    "free_standing": {codes.FREE_STANDING_SURFACE: 1},
    "hole_defect": {codes.EMPTY_INTERIOR: 1},
    "zero_edge": {codes.INVALID_EDGE: 1},
}


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf[ERR_COLS]
        .astype(
            {
                "theme": "object",
                "error_code": "object",
                "x": "float64",
                "y": "float64",
                "feature_a": "int64",
                "feature_b": "int64",
            }
        )
        .sort_values(ERR_COLS)
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("defect", sorted(EXPECTED))
def test_golden_defects(spark, defect):
    rings = surface_mosaic(spark, defect=defect, **GRID)
    got = validate_topology(spark, rings).toPandas()
    counts = got.groupby("error_code").size().to_dict()
    assert counts == EXPECTED[defect], f"{defect}: {counts} != {EXPECTED[defect]}"
    # distributed == oracle, bit-for-bit
    oracle = validate_topology_oracle(mosaic_rings_pandas(defect=defect, **GRID))
    pd.testing.assert_frame_equal(_canon(got), _canon(oracle))


def test_overlap_partial_matches_oracle(spark):
    # +0.5-shifted square: expected counts are geometry-derived, so just
    # require nonempty intersection errors + exact oracle equality
    rings = surface_mosaic(spark, defect="overlap_partial", **GRID)
    got = validate_topology(spark, rings).toPandas()
    assert (got.error_code == codes.EDGE_INTERSECTION).any()
    oracle = validate_topology_oracle(mosaic_rings_pandas(defect="overlap_partial", **GRID))
    pd.testing.assert_frame_equal(_canon(got), _canon(oracle))


@pytest.mark.parametrize("cell_size", [0.7, 2.0, 11.0])
def test_cell_size_invariance(spark, cell_size):
    """Error set must not depend on the partitioning resolution (the
    cross_cell regression guard, FIXTURES.md §2)."""
    rings = surface_mosaic(spark, defect="overlap_partial", **GRID)
    got = validate_topology(spark, rings, cell_size=cell_size).toPandas()
    oracle = validate_topology_oracle(mosaic_rings_pandas(defect="overlap_partial", **GRID))
    pd.testing.assert_frame_equal(_canon(got), _canon(oracle))


def test_node_cycles_structure(spark):
    """R7 invariants: positions are 0..degree-1; the next-edge pointer is
    the (pos+1) mod degree neighbor; every undirected edge appears as two
    half-edges; angular order at a hand-checked node is CCW from east."""
    from etf_topox_spark.operators.topology import node_edge_cycles

    rings = surface_mosaic(spark, defect="self_intersect", **GRID)
    cyc = node_edge_cycles(rings_to_edges(rings)).toPandas()

    for (_, nx, ny), g in cyc.groupby(["theme", "node_x", "node_y"]):
        g = g.sort_values("pos").reset_index(drop=True)
        deg = g["degree"].iloc[0]
        assert list(g["pos"]) == list(range(deg))
        # next pointer = successor's neighbor, wrapping
        nxt = g[["nbr_x", "nbr_y"]].iloc[list(range(1, deg)) + [0]].reset_index(drop=True)
        assert (g["nxt_x"].to_numpy() == nxt["nbr_x"].to_numpy()).all()
        assert (g["nxt_y"].to_numpy() == nxt["nbr_y"].to_numpy()).all()

    # half-edge pairing: (node → nbr) exists iff (nbr → node) exists
    fwd = set(zip(cyc.node_x, cyc.node_y, cyc.nbr_x, cyc.nbr_y))
    rev = set(zip(cyc.nbr_x, cyc.nbr_y, cyc.node_x, cyc.node_y))
    assert fwd == rev

    # bowtie corner (0,0): diagonal to (1,1) at pseudo-angle 0.5 precedes
    # north (0,1) at 1.0 — CCW from east
    n00 = cyc[(cyc.node_x == 0) & (cyc.node_y == 0)].sort_values("pos")
    assert list(zip(n00.nbr_x, n00.nbr_y)) == [(1.0, 1.0), (0.0, 1.0)]


def test_gml_round_trip_exact(spark):
    """R3: serialize → parse is value-identical for every ring (incl. the
    0.25-offset hole), entirely in Catalyst expressions."""
    from etf_topox_spark.sources.gml import gml_to_rings, rings_to_gml

    rings = surface_mosaic(spark, defect="hole_defect", **GRID)
    back = gml_to_rings(rings_to_gml(rings)).toPandas()
    a = rings.toPandas().sort_values(["feature_id", "ring_idx"]).reset_index(drop=True)
    b = back.sort_values(["feature_id", "ring_idx"]).reset_index(drop=True)[a.columns.tolist()]
    for c in ("xs", "ys"):
        a[c] = a[c].map(list)
        b[c] = b[c].map(list)
    pd.testing.assert_frame_equal(a, b)


def test_face_cycles_euler(spark):
    """DCEL face traversal satisfies Euler's formula on the clean 8x8
    mosaic: V - E + F = 2 (one connected component, outer face included);
    64 unit faces of 4 half-edges plus the outer face of the 32-half-edge
    perimeter; every half-edge belongs to exactly one face."""
    from etf_topox_spark.operators.topology import face_cycles, rings_to_edges
    from etf_topox_spark.sources.mosaic import surface_mosaic

    rings = surface_mosaic(spark, rows=8, cols=8, defect="valid_mosaic")
    edges = rings_to_edges(rings)
    faces = face_cycles(edges).toPandas()

    V = 9 * 9
    E = 2 * 9 * 8  # horizontal + vertical undirected unit edges
    F_ = len(faces)
    assert V - E + F_ == 2
    sizes = sorted(faces.n_edges.tolist())
    assert sizes == [4] * 64 + [32]
    assert faces.n_edges.sum() == 2 * E  # each half-edge in exactly one face


def test_gml_ingest_variants(spark):
    """gml_to_rings must accept the real-world GML shapes beyond the
    engine's own serialization: gml:pos sequences, srsDimension=3 (z
    projected away), multiple PolygonPatch per surface, exponent-notation
    doubles, attributes on posList."""
    from etf_topox_spark.sources.gml import GML_SCHEMA, gml_to_rings

    ring = "<gml:LinearRing>{}</gml:LinearRing>"
    frags = [
        # gml:pos sequence, one pair per element
        (1, "<gml:Surface><gml:patches><gml:PolygonPatch><gml:exterior>"
            + ring.format("<gml:pos>0 0</gml:pos><gml:pos>1 0</gml:pos>"
                          "<gml:pos>1 1</gml:pos><gml:pos>0 0</gml:pos>")
            + "</gml:exterior></gml:PolygonPatch></gml:patches></gml:Surface>"),
        # srsDimension=3 posList with attribute + exponent notation
        (2, "<gml:Surface><gml:patches><gml:PolygonPatch><gml:exterior>"
            + ring.format('<gml:posList srsDimension="3" count="4">'
                          "0 0 7 1e0 0 7 1 1.5E0 7 0 0 7</gml:posList>")
            + "</gml:exterior></gml:PolygonPatch></gml:patches></gml:Surface>"),
        # two PolygonPatch elements -> two exterior rings
        (3, "<gml:Surface><gml:patches><gml:PolygonPatch><gml:exterior>"
            + ring.format("<gml:posList>0 0 1 0 0 1 0 0</gml:posList>")
            + "</gml:exterior></gml:PolygonPatch><gml:PolygonPatch><gml:exterior>"
            + ring.format("<gml:posList>5 5 6 5 5 6 5 5</gml:posList>")
            + "</gml:exterior></gml:PolygonPatch></gml:patches></gml:Surface>"),
    ]
    df = spark.createDataFrame(
        [(fid, "t", g) for fid, g in frags], GML_SCHEMA
    )
    got = gml_to_rings(df).toPandas().sort_values(["feature_id", "ring_idx"])
    r1 = got[got.feature_id == 1].iloc[0]
    assert list(r1["xs"]) == [0.0, 1.0, 1.0, 0.0]
    assert list(r1["ys"]) == [0.0, 0.0, 1.0, 0.0]
    r2 = got[got.feature_id == 2].iloc[0]
    assert list(r2["xs"]) == [0.0, 1.0, 1.0, 0.0]  # z dropped, 1e0/1.5E0 parsed
    assert list(r2["ys"]) == [0.0, 0.0, 1.5, 0.0]
    r3 = got[got.feature_id == 3]
    assert len(r3) == 2 and r3.is_exterior.all()
    assert list(r3.iloc[1]["xs"]) == [5.0, 6.0, 5.0, 5.0]


def test_edge_stats_theme_dictionary_parity(spark):
    """The dictionary-encoded exchange (themes list supplied) must produce
    the identical stats frame to the plain string groupBy — including the
    post-aggregation hash-derived midpoints."""
    from etf_topox_spark.operators.topology import undirected_edge_stats

    rings = surface_mosaic(spark, defect="dup_boundary", **GRID)
    edges = rings_to_edges(rings)
    cols = ["theme", "lo_h", "hi_h", "n", "n_fwd", "features", "mid_x", "mid_y"]
    plain = undirected_edge_stats(edges).toPandas()
    enc = undirected_edge_stats(edges, themes=["theme0"]).toPandas()
    key = ["theme", "lo_h", "hi_h"]
    a = plain[cols].sort_values(key).reset_index(drop=True)
    b = enc[cols].sort_values(key).reset_index(drop=True)
    a["features"] = a["features"].map(tuple)
    b["features"] = b["features"].map(tuple)
    pd.testing.assert_frame_equal(a, b)


def test_intersection_theme_dictionary_parity(spark):
    """The tid-encoded intersection exchange must produce the identical
    error frame to the string path."""
    from etf_topox_spark.operators.topology import intersection_errors

    rings = surface_mosaic(spark, defect="overlap_partial", **GRID)
    edges = rings_to_edges(rings)
    key = ["theme", "error_code", "x", "y", "feature_a", "feature_b"]
    plain = intersection_errors(edges).toPandas()[key].sort_values(key)
    enc = intersection_errors(edges, themes=["theme0"]).toPandas()[key].sort_values(key)
    pd.testing.assert_frame_equal(
        plain.reset_index(drop=True), enc.reset_index(drop=True)
    )


def test_face_cycles_distributed_matches_local(spark):
    """The pointer-doubling scale path must produce the identical face
    table to the driver-local numpy labeler (the hybrid-switch guard:
    whichever side of DRIVER_CC_MAX_PAIRS the input lands on, same
    faces)."""
    import etf_topox_spark.operators.topology as topo
    from pyspark.sql import functions as F

    rings = surface_mosaic(spark, rows=5, cols=5, defect="valid_mosaic")
    pairs = topo.face_successor_pairs(topo.rings_to_edges(rings))
    loc = topo._faces_local(pairs.toPandas())
    dist = (
        topo._face_labels_distributed(pairs)
        .groupBy(
            "theme",
            F.col("lbl.fax").alias("face_ax"),
            F.col("lbl.fay").alias("face_ay"),
            F.col("lbl.fbx").alias("face_bx"),
            F.col("lbl.fby").alias("face_by"),
        )
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .toPandas()
    )
    cols = sorted(loc.columns)
    a = loc[cols].sort_values(cols).reset_index(drop=True)
    b = dist[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("defect", ["self_intersect", "overlap_partial", "dup_boundary"])
def test_intersection_sql_twin_bit_equal(spark, defect):
    """The pure-Catalyst intersection path must reproduce the grouped
    Arrow kernel bit-for-bit: same pairs, same error codes, same IEEE
    reported coordinates. Cross-engine validation of the exact-grid sign
    tests (the two implementations share no code below the cell cover)."""
    from etf_topox_spark.operators.topology import (
        intersection_errors,
        intersection_errors_sql,
    )

    rings = surface_mosaic(spark, defect=defect, **GRID)
    edges = rings_to_edges(rings)
    key = ["theme", "error_code", "x", "y", "feature_a", "feature_b"]
    for themes in (None, ["theme0"]):
        arrow = intersection_errors(edges, themes=themes).toPandas()
        sql = intersection_errors_sql(edges, themes=themes).toPandas()
        a = arrow[key].sort_values(key).reset_index(drop=True)
        b = sql[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_intersection_sql_twin_cell_sizes(spark):
    """sql ≡ arrow must hold across cell resolutions (different cover
    fan-outs, different owner cells — same reported error set)."""
    from etf_topox_spark.operators.topology import (
        intersection_errors,
        intersection_errors_sql,
    )

    rings = surface_mosaic(spark, defect="self_intersect", **GRID)
    edges = rings_to_edges(rings)
    key = ["theme", "error_code", "x", "y", "feature_a", "feature_b"]
    for cell in (0.5, 2.0, 10.0):
        arrow = intersection_errors(edges, cell).toPandas()
        sql = intersection_errors_sql(edges, cell).toPandas()
        a = arrow[key].sort_values(key).reset_index(drop=True)
        b = sql[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_ring_meta_from_edges_bit_equal(spark):
    """ring_meta_from_edges (pure-Catalyst decimal shoelace over the edges
    frame) must reproduce ring_meta (the per-batch numpy kernel over the
    rings source) bit-for-bit on every fixture family — translation
    invariance of the integer shoelace is what makes the untranslated
    decimal sum equal the kernel's min-translated int64 form."""
    from etf_topox_spark.operators.topology import (
        ring_meta,
        ring_meta_from_edges,
    )
    from etf_topox_spark.sources.mosaic import DEFECTS

    for defect in DEFECTS:
        rings = surface_mosaic(spark, defect=defect, **GRID)
        a = sorted(map(tuple, ring_meta(rings).collect()))
        b = sorted(map(tuple, ring_meta_from_edges(rings_to_edges(rings)).collect()))
        assert a == b, f"ring meta diverged for defect={defect}"


def test_ring_meta_from_edges_is_pure_jvm(spark):
    """The derived meta path must add ZERO Python stages beyond the single
    rings→edges kernel: exactly one Arrow eval in the plan, and a
    partial-aggregated (map-side combine) exchange for the per-ring sum."""
    from etf_topox_spark.operators.topology import ring_meta_from_edges

    def n_python(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan, sum(
            plan.count(t)
            for t in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython")
        )

    rings = surface_mosaic(spark, defect="valid_mosaic", **GRID)
    edges = rings_to_edges(rings)
    _, base = n_python(edges)  # generator + edges kernel
    plan, total = n_python(ring_meta_from_edges(edges))
    assert total == base, f"meta path added a Python stage, plan:\n{plan}"
    assert "partial_sum" in plan, f"per-ring sum not map-side combined:\n{plan}"
