"""Report/export surface (SURVEY.md §2.A R13/R15/R16, §2.B S6, A8, F9, X5).

The reference streams an XML error report that XQuery assertions re-read,
plus an optional GeoJSON export of erroneous features for inspection
(TopologyErrorXmlWriter / TopoX GeoJSON exporter — [ref-pub], SURVEY.md
§2.A R13/R15). The engine's analogs: a JSON error report (to_json rows), a
GeoJSON FeatureCollection of the features referenced by errors (semi-join
errors→rings), and a per-theme error histogram (the A8 grouped-map UDAF
shape).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.topology import validate_topology
from etf_topox_spark.registry import query
from etf_topox_spark.sources.mosaic import surface_mosaic


def error_report_json(errors: DataFrame) -> DataFrame:
    """S6: one JSON document line per error — the XML-report analog."""
    return errors.select(
        F.to_json(
            F.struct("theme", "error_code", "x", "y", "feature_a", "feature_b")
        ).alias("report_line")
    )


def error_report_xml(errors: DataFrame) -> DataFrame:
    """R13 format parity: the TopologyErrorXmlWriter analog ([ref-pub MED],
    SURVEY.md §2.A R13) — a streamed XML error document as (seq, xml) rows:
    seq 0 is the root open tag, errors at 1..n ordered deterministically
    (code, coordinates, features), footer at n+1. Every element line is
    built with Catalyst string expressions; the global row_number runs on a
    single partition, which is fine for an error REPORT (bounded output by
    definition — the per-error frame upstream is fully distributed)."""
    from pyspark.sql.window import Window

    spark = errors.sparkSession
    w = Window.orderBy("error_code", "x", "y", "feature_a", "feature_b")
    idx = F.row_number().over(w)
    # error_code is the only non-numeric interpolation: XML-escape it so a
    # future code containing &/<->/" cannot produce a malformed document
    # (today's enum is escape-free, so the byte-exact oracle is unchanged)
    code_esc = F.col("error_code")
    for raw, esc in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")):
        code_esc = F.replace(code_esc, F.lit(raw), F.lit(esc))
    line = F.concat(
        F.lit('<e i="'), idx.cast("string"),
        F.lit('" t="'), code_esc,
        F.lit('"><X>'), F.col("x").cast("string"),
        F.lit("</X><Y>"), F.col("y").cast("string"),
        F.lit("</Y><F>"), F.col("feature_a").cast("string"),
        F.lit("</F><F>"), F.col("feature_b").cast("string"),
        F.lit("</F></e>"),
    )
    header = spark.createDataFrame(
        [(0, '<ete:TopologicalErrors xmlns:ete='
             '"http://www.interactive-instruments.de/etf/topology-error/1.0">')],
        "seq long, xml string",
    )
    footer = errors.agg(
        (F.count(F.lit(1)) + 1).alias("seq"),
        F.lit("</ete:TopologicalErrors>").alias("xml"),
    )
    body = errors.select(idx.cast("long").alias("seq"), line.alias("xml"))
    return header.unionByName(body).unionByName(footer)


def geojson_errors(errors: DataFrame, rings: DataFrame) -> DataFrame:
    """R15: GeoJSON Feature per erroneous feature (exterior ring geometry,
    error codes collected as properties). Pure DataFrame ops + to_json."""
    bad_feats = (
        errors.groupBy("theme", F.col("feature_a").alias("feature_id"))
        .agg(F.array_sort(F.collect_set("error_code")).alias("codes"))
    )
    geo = rings.filter(F.col("is_exterior")).join(bad_feats, ["theme", "feature_id"])
    coords = F.zip_with("xs", "ys", lambda x, y: F.array(x, y))
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Polygon").alias("type"),
                F.array(coords).alias("coordinates"),
            ).alias("geometry"),
            F.struct(
                F.col("feature_id"),
                F.col("theme"),
                F.col("codes"),
            ).alias("properties"),
        )
    )
    return geo.select("theme", "feature_id", feature.alias("feature_json"))


def _overlap_err_rows_body() -> str:
    """Shared WITH-body: per-row overlap_partial errors with feature refs
    (the families other than EDGE_INTERSECTION / FREE_STANDING provably
    emit nothing for this fixture — covered by the aggregate oracle on
    topology_errors_overlap_partial)."""
    from etf_topox_spark.operators.topology_queries import (
        _CROSS_PAIRS,
        _GRID_FEAT,
        _SQUARE_EDGES,
    )

    return f"""
WITH RECURSIVE feat AS (
  {_GRID_FEAT}
  UNION ALL SELECT 64, 1.5, 1.5
),
edges AS ({_SQUARE_EDGES}),
ids AS (SELECT ROW_NUMBER() OVER (ORDER BY fid, x1, y1, x2, y2) AS id,
        0 AS ring_idx, * FROM edges),
{_CROSS_PAIRS},
und_feats AS (
  SELECT LEAST(x1, x2) AS ax,
         CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y1 ELSE y2 END AS ay,
         GREATEST(x1, x2) AS bx,
         CASE WHEN x1 < x2 OR (x1 = x2 AND y1 <= y2) THEN y2 ELSE y1 END AS by,
         LIST(DISTINCT fid) AS fids
  FROM edges GROUP BY 1, 2, 3, 4 HAVING COUNT(DISTINCT fid) >= 2
),
cc_pairs AS (
  SELECT u.fids[CAST(1 + (i.range // len(u.fids)) AS BIGINT)] AS src,
         u.fids[CAST(1 + (i.range % len(u.fids)) AS BIGINT)] AS dst
  FROM und_feats u, range(0, 100) i
  WHERE i.range < len(u.fids) * len(u.fids)
    AND (i.range // len(u.fids)) <> (i.range % len(u.fids))
),
walk(node, lbl) AS (
  SELECT fid, fid FROM feat
  UNION
  SELECT p.dst, w.lbl FROM walk w JOIN cc_pairs p ON p.src = w.node
),
labels AS (SELECT node, MIN(lbl) AS root FROM walk GROUP BY node),
sizes AS (SELECT root, COUNT(*) AS sz FROM labels GROUP BY root),
main AS (SELECT root FROM sizes ORDER BY sz DESC, root LIMIT 1),
err_rows AS (
  SELECT 'EDGE_INTERSECTION' AS error_code, px AS x, py AS y,
         LEAST(fa, fb) AS feature_a, GREATEST(fa, fb) AS feature_b
  FROM cross_pairs
  UNION ALL
  SELECT 'FREE_STANDING_SURFACE', f.x0, f.y0, l.node, l.node
  FROM labels l JOIN feat f ON f.fid = l.node
  WHERE l.root <> (SELECT root FROM main)
)
"""


def _error_report_oracle() -> str:
    """JSON report lines with the same key order and double formatting as
    Spark's to_json."""
    return f"""{_overlap_err_rows_body()}
SELECT '{{"theme":"theme0","error_code":"' || error_code
       || '","x":' || CAST(x AS VARCHAR)
       || ',"y":' || CAST(y AS VARCHAR)
       || ',"feature_a":' || CAST(feature_a AS VARCHAR)
       || ',"feature_b":' || CAST(feature_b AS VARCHAR) || '}}' AS report_line
FROM err_rows ORDER BY report_line
"""


def _geojson_oracle() -> str:
    """GeoJSON Feature per erroneous feature (grouped by the error's
    feature_a, codes = sorted distinct), ring = the fixture's CCW unit
    square — string-built to byte-match Spark's to_json output."""

    def pt(x: str, y: str) -> str:
        return f"'[' || CAST({x} AS VARCHAR) || ',' || CAST({y} AS VARCHAR) || ']'"

    ring = " || ',' || ".join(
        [
            pt("g.x0", "g.y0"),
            pt("g.x0 + 1", "g.y0"),
            pt("g.x0 + 1", "g.y0 + 1"),
            pt("g.x0", "g.y0 + 1"),
            pt("g.x0", "g.y0"),
        ]
    )
    return f"""{_overlap_err_rows_body()},
bad AS (
  SELECT feature_a AS fid,
         LIST(DISTINCT error_code ORDER BY error_code) AS codes
  FROM err_rows GROUP BY 1
),
geo AS (SELECT b.fid, b.codes, f.x0, f.y0 FROM bad b JOIN feat f ON f.fid = b.fid)
SELECT 'theme0' AS theme, g.fid AS feature_id,
       '{{"type":"Feature","geometry":{{"type":"Polygon","coordinates":[['
       || {ring}
       || ']]}},"properties":{{"feature_id":' || CAST(g.fid AS VARCHAR)
       || ',"theme":"theme0","codes":["'
       || array_to_string(g.codes, '","')
       || '"]}}}}' AS feature_json
FROM geo g ORDER BY feature_id
"""


def _error_report_xml_oracle() -> str:
    """Byte-exact SQL twin of error_report_xml over the overlap_partial
    fixture: same element strings, same deterministic numbering, header at
    seq 0 and footer at n+1."""
    return f"""{_overlap_err_rows_body()},
numbered AS (
  SELECT ROW_NUMBER() OVER (
           ORDER BY error_code, x, y, feature_a, feature_b) AS seq,
         '<e i="' || ROW_NUMBER() OVER (
           ORDER BY error_code, x, y, feature_a, feature_b)
         || '" t="' || error_code
         || '"><X>' || CAST(x AS VARCHAR)
         || '</X><Y>' || CAST(y AS VARCHAR)
         || '</Y><F>' || CAST(feature_a AS VARCHAR)
         || '</F><F>' || CAST(feature_b AS VARCHAR)
         || '</F></e>' AS xml
  FROM err_rows
)
SELECT CAST(0 AS BIGINT) AS seq,
       '<ete:TopologicalErrors xmlns:ete='
       || '"http://www.interactive-instruments.de/etf/topology-error/1.0">'
       AS xml
UNION ALL SELECT seq, xml FROM numbered
UNION ALL SELECT (SELECT COUNT(*) + 1 FROM numbered), '</ete:TopologicalErrors>'
ORDER BY seq
"""


@query("topology_error_report_xml", oracle=_error_report_xml_oracle())
def topology_error_report_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    rings = surface_mosaic(spark, rows=8, cols=8, defect="overlap_partial")
    return error_report_xml(validate_topology(spark, rings)).orderBy("seq")


@query("topology_error_report", oracle=_error_report_oracle())
def topology_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    rings = surface_mosaic(spark, rows=8, cols=8, defect="overlap_partial")
    return error_report_json(validate_topology(spark, rings)).orderBy("report_line")


@query("topology_geojson_export", oracle=_geojson_oracle())
def topology_geojson_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    rings = surface_mosaic(spark, rows=8, cols=8, defect="overlap_partial")
    errors = validate_topology(spark, rings)
    return geojson_errors(errors, rings).orderBy("feature_id")


# --- A8: grouped-map UDAF — per-theme error histogram ------------------------

from etf_topox_spark.operators.topology_queries import ERROR_HISTOGRAM_SQL

_UDTF_RING_EDGES_SQL = """
WITH feat AS (
  SELECT r.range * 4 + c.range AS fid,
         CAST(c.range AS DOUBLE) AS x0, CAST(r.range AS DOUBLE) AS y0
  FROM range(0, 4) r, range(0, 4) c
),
edges AS (
  SELECT fid AS feature_id, CAST(i AS INTEGER) AS seq,
         CASE i WHEN 0 THEN x0     WHEN 1 THEN x0 + 1 WHEN 2 THEN x0 + 1 ELSE x0     END AS x1,
         CASE i WHEN 0 THEN y0     WHEN 1 THEN y0     WHEN 2 THEN y0 + 1 ELSE y0 + 1 END AS y1,
         CASE i WHEN 0 THEN x0 + 1 WHEN 1 THEN x0 + 1 WHEN 2 THEN x0     ELSE x0     END AS x2,
         CASE i WHEN 0 THEN y0     WHEN 1 THEN y0 + 1 WHEN 2 THEN y0 + 1 ELSE y0     END AS y2
  FROM feat, (SELECT unnest([0, 1, 2, 3]) AS i)
)
SELECT feature_id, seq, x1, y1, x2, y2 FROM edges ORDER BY feature_id, seq
"""


@query("topology_error_histogram", oracle=ERROR_HISTOGRAM_SQL)
def topology_error_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    rings = surface_mosaic(spark, rows=8, cols=8, defect="self_intersect")
    errors = validate_topology(spark, rings)

    def hist(key, pdf: pd.DataFrame) -> pd.DataFrame:
        counts = pdf.groupby("error_code").size().sort_index()
        return pd.DataFrame(
            {
                "theme": [key[0]] * len(counts),
                "error_code": counts.index,
                "n": counts.to_numpy(),
                "share": (counts / counts.sum()).to_numpy(),
            }
        )

    return (
        errors.groupBy("theme")
        .applyInPandas(hist, "theme string, error_code string, n long, share double")
        .orderBy("theme", "error_code")
    )


# --- F9: cell-index function family as a query surface ------------------------

def _morton_spread_sql(v: str) -> str:
    """SQL twin of functions.cells._spread_bits32 (mask constants are the
    decimal forms of 0x0000FFFF0000FFFF … 0x5555555555555555)."""
    s = v
    for shift, mask in (
        (16, 281470681808895),
        (8, 71777214294589695),
        (4, 1085102592571150095),
        (2, 3689348814741910323),
        (1, 6148914691236517205),
    ):
        s = f"((({s}) | (({s}) << {shift})) & {mask})"
    return s


def _cell_index_oracle() -> str:
    from etf_topox_spark.sources.points import points_sql

    sx = _morton_spread_sql("xi")
    sy = _morton_spread_sql("yi")
    px = _morton_spread_sql("xi >> 4")
    py = _morton_spread_sql("yi >> 4")
    res8 = 8 << 58
    res4 = 4 << 58
    return f"""
WITH pts AS ({points_sql(2_000)}),
xy AS (
  SELECT point_id,
         LEAST(GREATEST(CAST(FLOOR((x + 180.0) / 360.0 * 256) AS BIGINT), 0), 255) AS xi,
         LEAST(GREATEST(CAST(FLOOR((y + 90.0) / 180.0 * 256) AS BIGINT), 0), 255) AS yi
  FROM pts
)
SELECT point_id,
       {res8} | ({sx} | ({sy} << 1)) AS cell8,
       {res4} | ({px} | ({py} << 1)) AS cell4,
       -- k=1 ring drops the clamped-out lat row at the grid edge
       CAST(9 - CASE WHEN yi = 0 OR yi = 255 THEN 3 ELSE 0 END AS INTEGER) AS ring1_size
FROM xy ORDER BY point_id
"""


@query("cell_index_ops", oracle=_cell_index_oracle())
def cell_index_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etf_topox_spark.functions import cells as C
    from etf_topox_spark.sources.points import synthetic_points

    pts = synthetic_points(spark, 2_000)
    cell8 = C.latlng_to_cell_udf(8)("x", "y")
    out = pts.select(
        "point_id",
        cell8.alias("cell8"),
        C.cell_to_parent_udf(4)(cell8).alias("cell4"),
        F.size(C.cell_ring_udf(1)(cell8)).alias("ring1_size"),
    )
    return out.orderBy("point_id")


# --- F9b: hierarchical cell rollup (H3 compact-style density pyramid) ----------

_ROLLUP_N = 20_000
_ROLLUP_RESES = (8, 6, 4)  # finest first; each next level re-aggregates the last


def _cell_rollup_oracle() -> str:
    from etf_topox_spark.sources.points import points_sql

    finest = _ROLLUP_RESES[0]
    grid = 1 << finest
    parts = []
    for r in _ROLLUP_RESES:
        shift = finest - r
        sx = _morton_spread_sql(f"(xi >> {shift})")
        sy = _morton_spread_sql(f"(yi >> {shift})")
        parts.append(
            f"SELECT {r} AS res, {r << 58} | ({sx} | ({sy} << 1)) AS cell,"
            f" COUNT(*) AS n FROM xy GROUP BY 1, 2"
        )
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH pts AS ({points_sql(_ROLLUP_N)}),
xy AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((x + 180.0) / 360.0 * {grid}) AS BIGINT), 0), {grid - 1}) AS xi,
         LEAST(GREATEST(CAST(FLOOR((y + 90.0) / 180.0 * {grid}) AS BIGINT), 0), {grid - 1}) AS yi
  FROM pts
)
SELECT res, cell, n FROM ({body}) ORDER BY res, cell
"""


@query("cell_rollup_pyramid", oracle=_cell_rollup_oracle())
def cell_rollup_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution density pyramid over the cell index — H3's
    hierarchical-aggregation idiom (bin points at the finest res, then roll
    counts up to coarser parents), the vector twin of the raster pyramid.

    Scale shape: ONE partial-aggregable count shuffle touches the points;
    every coarser level re-aggregates the ALREADY-REDUCED cell table
    (bounded by 4^res rows regardless of point count) via the bit-shift
    parent derivation, so the pyramid adds only log-depth shuffles over
    tiny inputs — never a second pass over 10^12 rows. The DuckDB oracle
    replays the Morton spread symbolically on the same shifted grid
    coordinates (exact ints → bit-exact)."""
    from etf_topox_spark.functions import cells as C
    from etf_topox_spark.sources.points import synthetic_points

    finest = _ROLLUP_RESES[0]
    pts = synthetic_points(spark, _ROLLUP_N)
    cur = (
        pts.select(C.latlng_to_cell_udf(finest)("x", "y").alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    levels = [cur.select(F.lit(finest).alias("res"), "cell", "n")]
    for r in _ROLLUP_RESES[1:]:
        cur = (
            cur.select(C.cell_to_parent_udf(r)("cell").alias("cell"), "n")
            .groupBy("cell")
            .agg(F.sum("n").alias("n"))
        )
        levels.append(cur.select(F.lit(r).alias("res"), "cell", "n"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out.orderBy("res", "cell")


# --- X5: Python UDTF — the ring→edges exploder as a table function -------------

def register_ring_edges_udtf(spark: SparkSession):
    from pyspark.sql.functions import udtf

    @udtf(returnType="seq int, x1 double, y1 double, x2 double, y2 double")
    class RingEdges:
        def eval(self, xs, ys):
            for i in range(len(xs) - 1):
                yield i, float(xs[i]), float(ys[i]), float(xs[i + 1]), float(ys[i + 1])

    spark.udtf.register("ring_edges", RingEdges)
    return RingEdges


@query("udtf_ring_edges", oracle=_UDTF_RING_EDGES_SQL)
def udtf_ring_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_ring_edges_udtf(spark)
    rings = surface_mosaic(spark, rows=4, cols=4, defect="valid_mosaic")
    rings.createOrReplaceTempView("udtf_rings_v")
    return spark.sql(
        """
        SELECT r.feature_id, e.seq, e.x1, e.y1, e.x2, e.y2
        FROM udtf_rings_v r, LATERAL ring_edges(r.xs, r.ys) e
        ORDER BY r.feature_id, e.seq
        """
    )


# --- F9c: geohash textual cell codec -------------------------------------------

_GH_PREC = 8
_GH_HALF = 5 * _GH_PREC // 2  # bits per axis
_GH_N = 1 << _GH_HALF


def _geohash_sql() -> str:
    """DuckDB twin of functions.cells.geohash_encode at precision 8: same
    floor-scale, same Morton spread, chars via base-32 substr lookup."""
    from etf_topox_spark.sources.points import points_sql

    sx = _morton_spread_sql("xi")
    sy = _morton_spread_sql("yi")
    ch = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(((v >> {5 * (_GH_PREC - 1 - c)}) & 31) AS INTEGER) + 1, 1)"
        for c in range(_GH_PREC)
    )
    return f"""
WITH pts AS ({points_sql(2_000)}),
xy AS (
  SELECT point_id, x, y,
         LEAST(GREATEST(CAST(FLOOR((x + 180.0) / 360.0 * {_GH_N}) AS BIGINT), 0), {_GH_N - 1}) AS xi,
         LEAST(GREATEST(CAST(FLOOR((y + 90.0) / 180.0 * {_GH_N}) AS BIGINT), 0), {_GH_N - 1}) AS yi
  FROM pts
),
iv AS (SELECT point_id, x, y, xi, yi, (({sx}) << 1) | ({sy}) AS v FROM xy)
SELECT point_id, {ch} AS geohash,
       CAST(xi AS DOUBLE) * (360.0 / {_GH_N}) - 180.0 AS lon_min,
       CAST(yi AS DOUBLE) * (180.0 / {_GH_N}) - 90.0 AS lat_min,
       (CAST(xi AS DOUBLE) + 1.0) * (360.0 / {_GH_N}) - 180.0 AS lon_max,
       (CAST(yi AS DOUBLE) + 1.0) * (180.0 / {_GH_N}) - 90.0 AS lat_max,
       TRUE AS contains
FROM iv ORDER BY point_id
"""


@query("cell_geohash_roundtrip", oracle=_geohash_sql())
def cell_geohash_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encode → decode round-trip over the point corpus: the third
    cell-index dialect (textual, prefix-rangeable) next to the Morton
    quadkey and planar grid. Map-only Arrow kernel; `contains` certifies
    the decoded cell really covers its point (bounds are exact dyadic
    doubles, so the oracle matches bit for bit)."""
    from etf_topox_spark.functions.cells import geohash_decode_bounds, geohash_encode
    from etf_topox_spark.sources.points import synthetic_points

    pts = synthetic_points(spark, 2_000)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lon = pdf["x"].to_numpy()
            lat = pdf["y"].to_numpy()
            gh = geohash_encode(lon, lat, _GH_PREC)
            x0, y0, x1, y1 = geohash_decode_bounds(gh, _GH_PREC)
            yield pd.DataFrame(
                {
                    "point_id": pdf["point_id"],
                    "geohash": gh,
                    "lon_min": x0,
                    "lat_min": y0,
                    "lon_max": x1,
                    "lat_max": y1,
                    "contains": (x0 <= lon) & (lon < x1) & (y0 <= lat) & (lat < y1),
                }
            )

    schema = (
        "point_id long, geohash string, lon_min double, lat_min double, "
        "lon_max double, lat_max double, contains boolean"
    )
    return pts.mapInPandas(kernel, schema).orderBy("point_id")


# --- F9c: polygon/bbox polyfill (H3 polyfill analog) ----------------------------

_PF_N = 2_000
_PF_CELL = 16  # fine-cell side; rects are <= 48 wide -> <= 16 cells each
_PF_RES_TAG = 9 << 58


def _polyfill_oracle() -> str:
    from etf_topox_spark.operators.spatial_queries import _RA, _rect_sql

    sx = _morton_spread_sql("cx")
    sy = _morton_spread_sql("cy")
    c = _PF_CELL
    h = c // 2
    return f"""
WITH r AS ({_rect_sql(_PF_N, *_RA)}),
c1 AS (
  SELECT i, x0, x1, y0, y1,
         unnest(range(x0 // {c}, ((x1 - 1) // {c}) + 1)) AS cx
  FROM r),
c2 AS (
  SELECT i, y0, y1, cx,
         unnest(range(y0 // {c}, ((y1 - 1) // {c}) + 1)) AS cy
  FROM c1
  WHERE cx * {c} + {h} >= x0 AND cx * {c} + {h} < x1)
SELECT i AS feature_id, {_PF_RES_TAG} | ({sx} | ({sy} << 1)) AS cell
FROM c2
WHERE cy * {c} + {h} >= y0 AND cy * {c} + {h} < y1
ORDER BY feature_id, cell
"""


@query("cell_polyfill", oracle=_polyfill_oracle())
def cell_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polyfill — the H3 API's region->cells primitive: every fine cell
    whose CENTER (cx*16+8, cy*16+8) falls inside the (half-open) rectangle,
    emitted as (feature_id, morton cell). The membership rule matches H3
    polyfill's center containment, so cells tile exactly: adjoining
    features never double-claim a cell (pytest pins the partition
    property). Pure Catalyst: integer ceil/floor bounds -> bounded
    sequence explode (<= 16 cells/feature) -> symbolic Morton spread via
    bit ops, all inside whole-stage codegen; no shuffle at all until a
    consumer aggregates. At 10^12 features the fan-out stays the
    area-bounded constant; concave/ring geometry would swap the bbox
    membership predicate for the pip_join kernel over the same candidate
    explode."""
    from etf_topox_spark.operators.spatial_queries import _RA, _rects

    c, h = _PF_CELL, _PF_CELL // 2
    r = _rects(spark, _PF_N, *_RA)
    # candidate ranges stay non-negative (x0 >= 0, x1 >= x0+1), so integer
    # division is floor == truncation on BOTH engines; the explicit center
    # predicate then decides membership (a ceil-style bound on x1-h-1 would
    # go negative for thin rects and Spark div / DuckDB // both truncate
    # toward zero there — measured: a wrong cell for the unit rect at the
    # origin)
    c1 = r.select(
        "i", "x0", "x1", "y0", "y1",
        F.explode(
            F.sequence(F.expr(f"x0 div {c}"), F.expr(f"(x1 - 1) div {c}"))
        ).alias("cx"),
    ).where((F.col("cx") * c + h >= F.col("x0")) & (F.col("cx") * c + h < F.col("x1")))
    c2 = c1.select(
        "i", "y0", "y1", "cx",
        F.explode(
            F.sequence(F.expr(f"y0 div {c}"), F.expr(f"(y1 - 1) div {c}"))
        ).alias("cy"),
    ).where((F.col("cy") * c + h >= F.col("y0")) & (F.col("cy") * c + h < F.col("y1")))
    cell = F.expr(
        f"{_PF_RES_TAG} | (({_morton_spread_sql('cx')})"
        f" | (({_morton_spread_sql('cy')}) << 1))"
    )
    return c2.select(F.col("i").alias("feature_id"), cell.alias("cell")).orderBy(
        "feature_id", "cell"
    )


# --- F9c: Z-order data layout vs row-id layout — scan-amplification stats ------

_ZL_N = 50_000          # points written to files
_ZL_FILES = 64          # file count per layout (z-layout: top-6 Morton bits)
_ZL_GRID = 256          # res-8 grid over the [0, 20)² data window
# probe rectangle in grid coordinates (~2.4% selectivity), deliberately
# MISALIGNED with the Morton block grid so the z-layout shows realistic
# partial pruning (an aligned probe would prune to exactly one file)
_ZL_PX0, _ZL_PX1, _ZL_PY0, _ZL_PY1 = 100, 139, 40, 79


def _zl_oracle() -> str:
    from etf_topox_spark.sources.points import points_sql

    sx = _morton_spread_sql("xi")
    sy = _morton_spread_sql("yi")
    probe = (
        f"mnx <= {_ZL_PX1} AND mxx >= {_ZL_PX0}"
        f" AND mny <= {_ZL_PY1} AND mxy >= {_ZL_PY0}"
    )
    return f"""
WITH pts AS ({points_sql(_ZL_N)}),
xy AS (
  SELECT point_id,
         LEAST(GREATEST(CAST(FLOOR(x / 20.0 * {_ZL_GRID}) AS BIGINT), 0), {_ZL_GRID - 1}) AS xi,
         LEAST(GREATEST(CAST(FLOOR(y / 20.0 * {_ZL_GRID}) AS BIGINT), 0), {_ZL_GRID - 1}) AS yi
  FROM pts
),
assigned AS (
  SELECT 'id_range' AS layout, (point_id * {_ZL_FILES}) // {_ZL_N} AS file_id, xi, yi FROM xy
  UNION ALL
  SELECT 'zorder', (({sx}) | (({sy}) << 1)) >> 10, xi, yi FROM xy
),
files AS (
  SELECT layout, file_id, COUNT(*) AS n,
         MIN(xi) AS mnx, MAX(xi) AS mxx, MIN(yi) AS mny, MAX(yi) AS mxy
  FROM assigned GROUP BY 1, 2
),
matching AS (
  SELECT COUNT(*) AS m FROM xy
  WHERE xi BETWEEN {_ZL_PX0} AND {_ZL_PX1} AND yi BETWEEN {_ZL_PY0} AND {_ZL_PY1}
)
SELECT layout, COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN {probe} THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
       CAST(SUM(CASE WHEN {probe} THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
       (SELECT m FROM matching) AS rows_matching
FROM files GROUP BY layout ORDER BY layout
"""


def _spread_col(c):
    """Catalyst twin of functions.cells._spread_bits32 / _morton_spread_sql —
    the same shift/mask cascade as a JVM-side expression tree (codegen'd,
    no Python)."""
    for shift, mask in (
        (16, 281470681808895),
        (8, 71777214294589695),
        (4, 1085102592571150095),
        (2, 3689348814741910323),
        (1, 6148914691236517205),
    ):
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


@query("zorder_layout_stats", oracle=_zl_oracle())
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) file clustering vs naive row-id-range layout,
    graded by scan amplification — the data-layout decision that dominates
    10^12-row table scans: a file is skippable iff its min/max column
    statistics (the parquet footer / Iceberg manifest stats this models)
    miss the probe window, and Z-order clustering is what makes per-file
    bboxes tight. Reports, per layout: file count, files touched by a ~2%
    bbox probe, rows inside touched files (what a reader must scan), and
    true matching rows (what it wanted). The z-layout assigns by Morton
    PREFIX (top bits = quadtree block), not by a global sort — prefix
    ranges are exactly how production Z-order writers bucket rows, and
    they need no ordering exchange at all.

    Scale shape: the whole job is ONE (layout, file_id)-keyed count/min/max
    shuffle with map-side partial aggregation over a tagged two-leg union
    (file table is bounded by the file count, not the row count) plus one
    single-row probe count; the Morton key is a pure Catalyst shift/mask
    cascade (codegen — no Python, no sort anywhere). Oracle replays the
    identical spread symbolically (exact ints → bit-exact)."""
    from etf_topox_spark.sources.points import synthetic_points

    pts = synthetic_points(spark, _ZL_N)
    grid = F.lit(_ZL_GRID)
    xi = F.least(
        F.greatest(F.floor(F.col("x") / 20.0 * grid), F.lit(0)),
        F.lit(_ZL_GRID - 1),
    )
    yi = F.least(
        F.greatest(F.floor(F.col("y") / 20.0 * grid), F.lit(0)),
        F.lit(_ZL_GRID - 1),
    )
    xy = pts.select("point_id", xi.alias("xi"), yi.alias("yi"))
    morton = _spread_col(F.col("xi")).bitwiseOR(
        F.shiftleft(_spread_col(F.col("yi")), 1)
    )
    assigned = xy.select(
        F.lit("id_range").alias("layout"),
        F.expr(f"(point_id * {_ZL_FILES}) div {_ZL_N}").alias("file_id"),
        "xi",
        "yi",
    ).unionAll(
        xy.select(
            F.lit("zorder").alias("layout"),
            F.shiftright(morton, 10).alias("file_id"),
            "xi",
            "yi",
        )
    )
    files = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("xi").alias("mnx"),
        F.max("xi").alias("mxx"),
        F.min("yi").alias("mny"),
        F.max("yi").alias("mxy"),
    )
    touched = (
        (F.col("mnx") <= _ZL_PX1)
        & (F.col("mxx") >= _ZL_PX0)
        & (F.col("mny") <= _ZL_PY1)
        & (F.col("mxy") >= _ZL_PY0)
    )
    matching = xy.filter(
        F.col("xi").between(_ZL_PX0, _ZL_PX1) & F.col("yi").between(_ZL_PY0, _ZL_PY1)
    ).agg(F.count(F.lit(1)).alias("rows_matching"))
    return (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(touched, 1).otherwise(0)).alias("files_touched"),
            F.sum(F.when(touched, F.col("n")).otherwise(0)).alias("rows_scanned"),
        )
        .crossJoin(F.broadcast(matching))
        .select(
            "layout", "n_files", "files_touched", "rows_scanned", "rows_matching"
        )
        .orderBy("layout")
    )


# --- F9d: Hilbert-curve layout — the locality upgrade over Z-order -------------

_HB_GRID = _ZL_GRID  # order-8 curve over the same 256² grid / 64-file layout


def _hilbert_stage_exprs(s: int, div: str) -> tuple[str, str, str]:
    """One unrolled level of the canonical xy→d Hilbert walk (s = the
    level's bit): returns (new_x, new_y, acc_increment) SQL expressions
    over columns (x, y). `div` is the integer-division spelling ('//' for
    DuckDB, 'DIV' for Spark SQL). rx/ry are the quadrant digits; the
    quadrant index (3·rx) XOR ry is rewritten arithmetically (rx=0→ry,
    rx=1→3−ry) so no engine-specific XOR operator is needed; the
    rotate/reflect uses the full-grid reflection n−1−· of the canonical
    algorithm."""
    rx = f"((x {div} {s}) % 2)"
    ry = f"((y {div} {s}) % 2)"
    refl_x = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {_HB_GRID - 1} - x ELSE x END)"
    refl_y = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {_HB_GRID - 1} - y ELSE y END)"
    new_x = f"(CASE WHEN {ry} = 0 THEN {refl_y} ELSE {refl_x} END)"
    new_y = f"(CASE WHEN {ry} = 0 THEN {refl_x} ELSE {refl_y} END)"
    inc = f"({s * s} * (CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END))"
    return new_x, new_y, inc


def _hilbert_oracle() -> str:
    from etf_topox_spark.sources.points import points_sql

    sx = _morton_spread_sql("xi")
    sy = _morton_spread_sql("yi")
    stages = []
    prev = "g_init"
    for k in range(7, -1, -1):
        nx, ny, inc = _hilbert_stage_exprs(1 << k, "//")
        stages.append(
            f"g{k} AS MATERIALIZED (SELECT point_id, {nx} AS x, {ny} AS y, "
            f"acc + {inc} AS acc FROM {prev})"
        )
        prev = f"g{k}"
    probe = (
        f"mnx <= {_ZL_PX1} AND mxx >= {_ZL_PX0}"
        f" AND mny <= {_ZL_PY1} AND mxy >= {_ZL_PY0}"
    )
    return f"""
WITH pts AS ({points_sql(_ZL_N)}),
xy AS (
  SELECT point_id,
         LEAST(GREATEST(CAST(FLOOR(x / 20.0 * {_ZL_GRID}) AS BIGINT), 0), {_ZL_GRID - 1}) AS xi,
         LEAST(GREATEST(CAST(FLOOR(y / 20.0 * {_ZL_GRID}) AS BIGINT), 0), {_ZL_GRID - 1}) AS yi
  FROM pts
),
g_init AS MATERIALIZED (SELECT point_id, xi AS x, yi AS y, 0 AS acc FROM xy),
{", ".join(stages)},
hd AS (SELECT point_id, acc AS d FROM g0),
assigned AS (
  SELECT 'id_range' AS layout, (x.point_id * {_ZL_FILES}) // {_ZL_N} AS file_id, xi, yi
  FROM xy x
  UNION ALL
  SELECT 'zorder', (({sx}) | (({sy}) << 1)) >> 10, xi, yi FROM xy
  UNION ALL
  SELECT 'hilbert', h.d >> 10, xi, yi FROM xy JOIN hd h USING (point_id)
),
files AS (
  SELECT layout, file_id, COUNT(*) AS n,
         MIN(xi) AS mnx, MAX(xi) AS mxx, MIN(yi) AS mny, MAX(yi) AS mxy
  FROM assigned GROUP BY 1, 2
),
matching AS (
  SELECT COUNT(*) AS m FROM xy
  WHERE xi BETWEEN {_ZL_PX0} AND {_ZL_PX1} AND yi BETWEEN {_ZL_PY0} AND {_ZL_PY1}
)
SELECT layout, COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN {probe} THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
       CAST(SUM(CASE WHEN {probe} THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
       (SELECT m FROM matching) AS rows_matching
FROM files GROUP BY layout ORDER BY layout
"""


def hilbert_index(df: DataFrame, x_col: str = "xi", y_col: str = "yi") -> DataFrame:
    """Append a `hilbert_d` column: the order-8 Hilbert distance of
    (x_col, y_col) on the 256² grid. Pure Catalyst — 8 unrolled
    CASE/shift levels, whole-stage-codegen'd, no Python, no shuffle."""
    out = df.selectExpr("*", f"{x_col} AS x", f"{y_col} AS y", "CAST(0 AS BIGINT) AS acc")
    for k in range(7, -1, -1):
        nx, ny, inc = _hilbert_stage_exprs(1 << k, "DIV")
        out = out.selectExpr(
            *[c for c in df.columns],
            f"{nx} AS x",
            f"{ny} AS y",
            f"acc + {inc} AS acc",
        )
    return out.selectExpr(*df.columns, "acc AS hilbert_d")


@query("hilbert_layout_stats", oracle=_hilbert_oracle())
def hilbert_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve file clustering vs Z-order vs row-id layout, graded by
    scan amplification under the same misaligned bbox probe as
    `zorder_layout_stats`. Hilbert's walk never jumps (adjacent d ⇒
    adjacent cells), so file bboxes avoid Morton's seam-crossing blocks —
    the locality argument behind Iceberg/Delta offering hilbert clustering
    as the zorder upgrade; this query MEASURES it instead of asserting it.

    Scale shape: identical to zorder_layout_stats — the index is a pure
    codegen expression computed scan-side, the job is one bounded
    (layout, file_id) min/max/count shuffle over a three-leg union, and no
    sort exists anywhere (file id = curve-index prefix, exactly how a
    production writer buckets). The 8-level unroll is 8 narrow projections
    fused into one whole-stage-codegen span."""
    from etf_topox_spark.sources.points import synthetic_points

    pts = synthetic_points(spark, _ZL_N)
    grid = F.lit(_ZL_GRID)
    xi = F.least(
        F.greatest(F.floor(F.col("x") / 20.0 * grid), F.lit(0)),
        F.lit(_ZL_GRID - 1),
    )
    yi = F.least(
        F.greatest(F.floor(F.col("y") / 20.0 * grid), F.lit(0)),
        F.lit(_ZL_GRID - 1),
    )
    xy = pts.select("point_id", xi.alias("xi"), yi.alias("yi"))
    hb = hilbert_index(xy)
    morton = _spread_col(F.col("xi")).bitwiseOR(
        F.shiftleft(_spread_col(F.col("yi")), 1)
    )
    assigned = (
        xy.select(
            F.lit("id_range").alias("layout"),
            F.expr(f"(point_id * {_ZL_FILES}) div {_ZL_N}").alias("file_id"),
            "xi",
            "yi",
        )
        .unionAll(
            xy.select(
                F.lit("zorder").alias("layout"),
                F.shiftright(morton, 10).alias("file_id"),
                "xi",
                "yi",
            )
        )
        .unionAll(
            hb.select(
                F.lit("hilbert").alias("layout"),
                F.shiftright(F.col("hilbert_d"), 10).alias("file_id"),
                "xi",
                "yi",
            )
        )
    )
    files = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("xi").alias("mnx"),
        F.max("xi").alias("mxx"),
        F.min("yi").alias("mny"),
        F.max("yi").alias("mxy"),
    )
    touched = (
        (F.col("mnx") <= _ZL_PX1)
        & (F.col("mxx") >= _ZL_PX0)
        & (F.col("mny") <= _ZL_PY1)
        & (F.col("mxy") >= _ZL_PY0)
    )
    matching = xy.filter(
        F.col("xi").between(_ZL_PX0, _ZL_PX1) & F.col("yi").between(_ZL_PY0, _ZL_PY1)
    ).agg(F.count(F.lit(1)).alias("rows_matching"))
    return (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(touched, 1).otherwise(0)).alias("files_touched"),
            F.sum(F.when(touched, F.col("n")).otherwise(0)).alias("rows_scanned"),
        )
        .crossJoin(F.broadcast(matching))
        .select(
            "layout", "n_files", "files_touched", "rows_scanned", "rows_matching"
        )
        .orderBy("layout")
    )
