"""Driver-contract surface for the spatial joins — WITH exact DuckDB
oracles: the synthetic points regenerate bit-identically in SQL
(sources.points), the PIP oracle is the closed-form grid assignment with
the min-feature tie rule, and the kNN oracle is the brute-force cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.spatial import knn_join, pip_join
from etf_topox_spark.registry import query
from etf_topox_spark.sources.mosaic import surface_mosaic
from etf_topox_spark.sources.points import points_sql, synthetic_points

N_POINTS = 20000
N_PROBES = 200
PROBE_OFFSET = 1_000_000
GRID_N = 20  # 20×20 unit squares anchored at the origin
K = 5

# closed-form oracle: the containing unit square is (floor(x), floor(y));
# a point exactly on a grid line belongs to the min feature_id among its
# containers = the left/lower square (FIXTURES.md §3 tie rule)
_PIP_SQL = f"""
WITH pts AS ({points_sql(N_POINTS)})
SELECT point_id,
       CAST((CASE WHEN y = floor(y) AND y > 0 THEN y - 1 ELSE floor(y) END) * {GRID_N}
          + (CASE WHEN x = floor(x) AND x > 0 THEN x - 1 ELSE floor(x) END) AS BIGINT)
         AS feature_id
FROM pts
"""


@query("spatial_pip_join", oracle=_PIP_SQL)
def spatial_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    points = synthetic_points(spark, N_POINTS)
    rings = surface_mosaic(spark, rows=GRID_N, cols=GRID_N, defect="valid_mosaic")
    return pip_join(spark, points, rings)


_KNN_SQL = f"""
WITH corpus AS ({points_sql(N_POINTS)}),
probes AS ({points_sql(N_PROBES, PROBE_OFFSET)}),
d AS (
  SELECT p.point_id AS query_id, c.point_id AS neighbor_id,
         (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y) AS dist2
  FROM probes p CROSS JOIN corpus c
),
r AS (
  SELECT query_id, neighbor_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist2, neighbor_id) AS rn
  FROM d
)
SELECT query_id, neighbor_id, dist2, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= {K}
"""


@query("spatial_knn_join", oracle=_KNN_SQL)
def spatial_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    probes = synthetic_points(spark, N_PROBES, id_offset=PROBE_OFFSET)
    corpus = synthetic_points(spark, N_POINTS)
    return knn_join(spark, probes, corpus, k=K)
