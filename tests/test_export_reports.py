"""R13 format-parity goldens: the XML error document is byte-pinned (the
driver oracle re-derives it independently in SQL; this golden additionally
freezes the exact serialization against accidental format drift)."""

from __future__ import annotations

from etf_topox_spark.operators.export import error_report_xml
from etf_topox_spark.operators.topology import validate_topology
from etf_topox_spark.sources.mosaic import surface_mosaic

GOLDEN_ZERO_EDGE_XML = (
    '<ete:TopologicalErrors xmlns:ete='
    '"http://www.interactive-instruments.de/etf/topology-error/1.0">\n'
    '<e i="1" t="INVALID_EDGE"><X>0.0</X><Y>0.0</Y><F>0</F><F>0</F></e>\n'
    "</ete:TopologicalErrors>"
)


def test_error_report_xml_golden(spark):
    rings = surface_mosaic(spark, rows=8, cols=8, defect="zero_edge")
    rows = error_report_xml(validate_topology(spark, rings)).orderBy("seq").collect()
    doc = "\n".join(r.xml for r in rows)
    assert doc == GOLDEN_ZERO_EDGE_XML
    assert [r.seq for r in rows] == list(range(len(rows)))


def test_error_report_xml_structure(spark):
    """Well-formedness on a multi-error fixture: parses as XML, one <e> per
    error, indices contiguous from 1."""
    import xml.etree.ElementTree as ET

    rings = surface_mosaic(spark, rows=8, cols=8, defect="overlap_partial")
    errors = validate_topology(spark, rings)
    rows = error_report_xml(errors).orderBy("seq").collect()
    doc = "".join(r.xml for r in rows)
    root = ET.fromstring(doc)
    elems = list(root)
    assert len(elems) == errors.count()
    assert [e.get("i") for e in elems] == [str(i + 1) for i in range(len(elems))]
    assert all(e.get("t") for e in elems)
