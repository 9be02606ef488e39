"""Hexagonal binning over the observation points (SURVEY.md §2.C
geo-analytics family — the hexbin aggregation every density map and H3
dashboard runs; the hex-grid sibling of the square-cell heatmap).

Pointy-top axial coordinates: q = (sqrt(3)/3 * x - y/3) / size,
r = (2/3 * y) / size, then exact cube rounding (round q, r, s = -q-r;
reset the component with the largest rounding error — the standard
Red Blob Games / H3 nearest-hex-center rule, spelled as CASE comparisons
so both engines run the identical IEEE sequence; .5 never arises because
the corpus coordinates are never equidistant under these irrational
scalings). Census per occupied hex: point count and exact decimal
coordinate mass.

Scale shape: map-only assignment + ONE partial-aggregable groupBy on the
hex key — identical exchange to spatial_heatmap_smooth; output bounded by
occupied hexes, not points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.relational import _dsum_sql, dsum
from etf_topox_spark.registry import query
from etf_topox_spark.sources.points import points_sql, synthetic_points

N_HEX = 30_000
HEX_SIZE = 0.7  # hex circumradius in degrees

# Constants pre-folded in python and injected as repr'd double literals:
# a fractional literal like 2.0/3.0 inside the SQL text would be DECIMAL
# division in Spark ANSI (scale-truncated to 0.666667!) but DOUBLE in
# DuckDB — measured 5e-6 divergence before this fold.
_CQX = repr(0.5773502691896257 / HEX_SIZE)   # (sqrt(3)/3) / size
_CQY = repr(-(1.0 / 3.0) / HEX_SIZE)         # -(1/3) / size
_CRY = repr((2.0 / 3.0) / HEX_SIZE)          # (2/3) / size


def _hex_exprs() -> dict[str, str]:
    """Fractional axial coords — one shared SQL spelling, two multiplies
    and one add per coordinate, identical IEEE sequence on both engines."""
    q = f"(x * {_CQX} + y * {_CQY})"
    r = f"(y * {_CRY})"
    return {"q": q, "r": r}


_HEX_ROUND = """
  SELECT point_id, x, y, fq, fr, -fq - fr AS fs,
         ROUND(fq) AS rq, ROUND(fr) AS rr, ROUND(-fq - fr) AS rs
  FROM frac
"""

_HEX_FIX = """
  SELECT point_id, x, y,
         CASE WHEN ABS(rq - fq) > ABS(rr - fr) AND ABS(rq - fq) > ABS(rs - fs)
              THEN -rr - rs ELSE rq END AS hq,
         CASE WHEN NOT (ABS(rq - fq) > ABS(rr - fr) AND ABS(rq - fq) > ABS(rs - fs))
                   AND ABS(rr - fr) > ABS(rs - fs)
              THEN -rq - rs ELSE rr END AS hr
  FROM rounded
"""


def _hex_sql() -> str:
    e = _hex_exprs()
    return f"""
WITH pts AS ({points_sql(N_HEX)}),
frac AS (
  SELECT point_id, x, y, {e['q']} AS fq, {e['r']} AS fr FROM pts
),
rounded AS ({_HEX_ROUND}),
fixed AS ({_HEX_FIX})
SELECT CAST(hq AS BIGINT) AS hex_q, CAST(hr AS BIGINT) AS hex_r,
       COUNT(*) AS n_points,
       {_dsum_sql('x')} AS sum_x, {_dsum_sql('y')} AS sum_y
FROM fixed GROUP BY 1, 2 ORDER BY hex_q, hex_r
"""


@query("spatial_hexbin", oracle=_hex_sql())
def spatial_hexbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupied-hex census: point count and decimal-exact coordinate mass
    per pointy-top hex of circumradius HEX_SIZE (module docstring)."""
    e = _hex_exprs()
    pts = synthetic_points(spark, N_HEX)
    frac = pts.select(
        "point_id", "x", "y",
        F.expr(e["q"]).alias("fq"), F.expr(e["r"]).alias("fr"),
    )
    rounded = frac.select(
        "point_id", "x", "y", "fq", "fr",
        F.expr("-fq - fr").alias("fs"),
        F.expr("ROUND(fq)").alias("rq"),
        F.expr("ROUND(fr)").alias("rr"),
        F.expr("ROUND(-fq - fr)").alias("rs"),
    )
    fixed = rounded.select(
        "point_id", "x", "y",
        F.expr(
            "CASE WHEN ABS(rq - fq) > ABS(rr - fr) AND ABS(rq - fq) > ABS(rs - fs)"
            " THEN -rr - rs ELSE rq END"
        ).alias("hq"),
        F.expr(
            "CASE WHEN NOT (ABS(rq - fq) > ABS(rr - fr) AND ABS(rq - fq) > ABS(rs - fs))"
            " AND ABS(rr - fr) > ABS(rs - fs) THEN -rq - rs ELSE rr END"
        ).alias("hr"),
    )
    return (
        fixed.groupBy(
            F.col("hq").cast("long").alias("hex_q"),
            F.col("hr").cast("long").alias("hex_r"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            dsum(F.col("x")).alias("sum_x"),
            dsum(F.col("y")).alias("sum_y"),
        )
        .orderBy("hex_q", "hex_r")
    )
