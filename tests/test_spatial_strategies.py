"""Broadcast vs shuffle strategy equivalence for the spatial joins
(SURVEY.md §2.B J10/J11/J14). The two physical strategies must be
value-identical on skewed inputs — same exact residual, same tie rules —
mirroring how Spark's BHJ and SMJ are interchangeable physical plans for
one logical join."""

from __future__ import annotations

from pyspark.sql import functions as F

from etf_topox_spark.operators.spatial import knn_join, pip_join
from etf_topox_spark.sources.mosaic import surface_mosaic
from etf_topox_spark.sources.points import synthetic_points


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_pip_strategies_identical(spark):
    grid = surface_mosaic(spark, rows=8, cols=8, defect="valid_mosaic")
    pts = synthetic_points(spark, 20_000)  # skewed: ~half in one hot cell
    b = pip_join(spark, pts, grid, strategy="broadcast")
    s = pip_join(spark, pts, grid, strategy="shuffle")
    assert _rows(b, ["point_id", "feature_id"]) == _rows(s, ["point_id", "feature_id"])


def test_knn_strategies_identical(spark):
    probes = synthetic_points(spark, 500, id_offset=1_000_000)
    corpus = synthetic_points(spark, 5_000)
    b = knn_join(spark, probes, corpus, k=3, strategy="broadcast")
    s = knn_join(spark, probes, corpus, k=3, strategy="shuffle")
    cols = ["query_id", "neighbor_id", "rn"]
    assert _rows(b, cols) == _rows(s, cols)
    # every probe got exactly k neighbors
    n_probes = probes.count()
    assert b.groupBy("query_id").count().filter(F.col("count") != 3).count() == 0
    assert b.select("query_id").distinct().count() == n_probes


def test_pip_auto_matches_explicit_broadcast(spark):
    grid = surface_mosaic(spark, rows=4, cols=4, defect="valid_mosaic")
    pts = synthetic_points(spark, 2_000)
    auto = pip_join(spark, pts, grid)  # tiny dim → auto resolves to broadcast
    explicit = pip_join(spark, pts, grid, strategy="broadcast")
    cols = ["point_id", "feature_id"]
    assert _rows(auto, cols) == _rows(explicit, cols)
    assert auto.count() > 0
