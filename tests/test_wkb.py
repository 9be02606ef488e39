"""WKB ingest shim (sources/wkb.py) — dialect coverage + exact round-trip.

The parser must accept what real geo stacks emit: little- AND big-endian,
ISO Z/M/ZM variants, PostGIS EWKB flags + SRID, MultiPolygon; doubles must
survive both directions bit-for-bit (WKB is raw IEEE 754).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.sources.mosaic import surface_mosaic
from etf_topox_spark.sources.wkb import (
    _parse_rings,
    rings_to_wkb,
    wkb_to_rings,
)

SQ_X = [0.0, 1.0, 1.0, 0.0, 0.0]
SQ_Y = [0.0, 0.0, 1.0, 1.0, 0.0]
HOLE_X = [0.25, 0.75, 0.75, 0.25, 0.25]
HOLE_Y = [0.25, 0.25, 0.75, 0.75, 0.25]


def _poly_wkb(
    rings: list[tuple[list[float], list[float]]],
    bo: str = "<",
    type_word: int = 3,
    srid: int | None = None,
    extra_dims: int = 0,
) -> bytes:
    order_byte = 1 if bo == "<" else 0
    parts = [struct.pack(bo + "BI", order_byte, type_word)]
    if srid is not None:
        parts.append(struct.pack(bo + "I", srid))
    parts.append(struct.pack(bo + "I", len(rings)))
    for xs, ys in rings:
        parts.append(struct.pack(bo + "I", len(xs)))
        for x, y in zip(xs, ys):
            vals = [x, y] + [99.0] * extra_dims
            parts.append(struct.pack(bo + f"{2 + extra_dims}d", *vals))
    return b"".join(parts)


def test_parse_le_polygon_with_hole():
    blob = _poly_wkb([(SQ_X, SQ_Y), (HOLE_X, HOLE_Y)])
    rings = _parse_rings(blob)
    assert [r[0] for r in rings] == [True, False]
    assert rings[0][1].tolist() == SQ_X and rings[0][2].tolist() == SQ_Y
    assert rings[1][1].tolist() == HOLE_X


def test_parse_big_endian():
    blob = _poly_wkb([(SQ_X, SQ_Y)], bo=">")
    rings = _parse_rings(blob)
    assert rings[0][1].tolist() == SQ_X and rings[0][2].tolist() == SQ_Y


@pytest.mark.parametrize(
    "type_word,extra",
    [
        (1003, 1),  # ISO PolygonZ
        (2003, 1),  # ISO PolygonM
        (3003, 2),  # ISO PolygonZM
        (3 | 0x80000000, 1),  # EWKB Z flag
    ],
)
def test_parse_zm_variants_project_to_2d(type_word, extra):
    blob = _poly_wkb([(SQ_X, SQ_Y)], type_word=type_word, extra_dims=extra)
    rings = _parse_rings(blob)
    assert rings[0][1].tolist() == SQ_X and rings[0][2].tolist() == SQ_Y


def test_parse_ewkb_srid():
    blob = _poly_wkb([(SQ_X, SQ_Y)], type_word=3 | 0x20000000, srid=4326)
    rings = _parse_rings(blob)
    assert rings[0][1].tolist() == SQ_X


def test_parse_multipolygon_mixed_endian():
    p1 = _poly_wkb([(SQ_X, SQ_Y)], bo="<")
    p2 = _poly_wkb([([2.0, 3.0, 3.0, 2.0, 2.0], [0.0, 0.0, 1.0, 1.0, 0.0])], bo=">")
    blob = struct.pack("<BII", 1, 6, 2) + p1 + p2
    rings = _parse_rings(blob)
    assert [r[0] for r in rings] == [True, True]
    assert rings[1][1][0] == 2.0


def test_spark_roundtrip_bit_exact(spark):
    rings = surface_mosaic(spark, rows=3, cols=3, defect="hole_defect")
    back = wkb_to_rings(rings_to_wkb(rings))
    a = (
        rings.orderBy("feature_id", "ring_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    b = (
        back.orderBy("feature_id", "ring_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert (a["feature_id"] == b["feature_id"]).all()
    assert (a["ring_idx"].astype(int) == b["ring_idx"].astype(int)).all()
    assert (a["is_exterior"] == b["is_exterior"]).all()
    for i in range(len(a)):
        assert np.array_equal(np.asarray(a["xs"][i]), np.asarray(b["xs"][i]))
        assert np.array_equal(np.asarray(a["ys"][i]), np.asarray(b["ys"][i]))


def test_serializer_rejects_ambiguous_holes(spark):
    pdf = pd.DataFrame(
        {
            "feature_id": [1, 1, 1],
            "theme": ["t"] * 3,
            "ring_idx": [0, 1, 2],
            "is_exterior": [True, True, False],
            "xs": [SQ_X, [5.0, 6.0, 6.0, 5.0], HOLE_X],
            "ys": [SQ_Y, [0.0, 0.0, 1.0, 1.0], HOLE_Y],
        }
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="hole ownership"):
        rings_to_wkb(df).collect()


def test_multipolygon_feature_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "feature_id": [7, 7],
            "theme": ["t", "t"],
            "ring_idx": [0, 1],
            "is_exterior": [True, True],
            "xs": [SQ_X, [5.0, 6.0, 6.0, 5.0, 5.0]],
            "ys": [SQ_Y, [0.0, 0.0, 1.0, 1.0, 0.0]],
        }
    )
    back = wkb_to_rings(rings_to_wkb(spark.createDataFrame(pdf))).toPandas()
    back = back.sort_values("ring_idx").reset_index(drop=True)
    assert len(back) == 2
    assert back["is_exterior"].all()
    assert list(back["xs"][1])[0] == 5.0


def test_wkb_parse_is_map_only(spark):
    """The ingest path must not shuffle: blob → rings is scan-side."""
    rings = surface_mosaic(spark, rows=2, cols=2)
    wkb = rings_to_wkb(rings)
    plan = (
        wkb_to_rings(wkb)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    # exactly the serializer's exchange, none added by the parser
    import re

    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 1
