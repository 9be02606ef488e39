"""Edge cases both spatial-join strategies must agree on:
- polygons with interior rings (holes): a point in the hole is OUTSIDE
  (even-odd parity needs the hole's segments shipped with the exterior's —
  regression guard for the packed-binary pack_features path);
- kNN probes far outside the corpus domain (certification never fires →
  exact brute-force fallback)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etf_topox_spark.operators.spatial import knn_join, pip_join


def _donut(spark):
    # feature 1: square (0,0)-(10,10) with hole (4,4)-(6,6); CCW exterior,
    # CW hole
    rows = [
        (1, "t", 0, True,
         [0.0, 10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 10.0, 0.0]),
        (1, "t", 1, False,
         [4.0, 4.0, 6.0, 6.0, 4.0], [4.0, 6.0, 6.0, 4.0, 4.0]),
    ]
    return spark.createDataFrame(
        rows,
        "feature_id long, theme string, ring_idx int, is_exterior boolean, "
        "xs array<double>, ys array<double>",
    )


def _points(spark):
    rows = [
        (0, 5.0, 5.0),    # inside the hole → NO match
        (1, 2.0, 2.0),    # in the donut body → match
        (2, 5.0, 4.0),    # ON the hole boundary → boundary-inclusive match
        (3, 11.0, 5.0),   # outside → no match
        (4, 0.0, 0.0),    # exterior corner → match
    ]
    return spark.createDataFrame(rows, "point_id long, x double, y double")


def test_pip_holes_both_strategies(spark):
    donut = _donut(spark)
    pts = _points(spark)
    expected = {1: 1, 2: 1, 4: 1}
    for strategy in ("broadcast", "shuffle"):
        got = {
            r["point_id"]: r["feature_id"]
            for r in pip_join(spark, pts, donut, strategy=strategy).collect()
        }
        assert got == expected, (strategy, got)


def test_knn_far_probes_fall_back_exactly(spark):
    corpus = spark.createDataFrame(
        [(i, float(i % 7), float(i % 5)) for i in range(60)],
        "point_id long, x double, y double",
    )
    # probes 90 degrees away: no cell ring at levels (2,4) can certify
    probes = spark.createDataFrame(
        [(100, 95.0, 80.0), (101, -120.0, -70.0)],
        "point_id long, x double, y double",
    )
    for strategy in ("broadcast", "shuffle"):
        out = knn_join(spark, probes, corpus, k=3, strategy=strategy)
        rows = sorted(
            (r["query_id"], r["neighbor_id"], r["rn"]) for r in out.collect()
        )
        # exact: each probe has exactly k neighbors, nearest-first by
        # (dist2, neighbor_id); verify against a python brute force
        import numpy as np

        cx = np.array([float(i % 7) for i in range(60)])
        cy = np.array([float(i % 5) for i in range(60)])
        expect = []
        for qid, px, py in ((100, 95.0, 80.0), (101, -120.0, -70.0)):
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            order = sorted(range(60), key=lambda i: (d2[i], i))[:3]
            expect += [(qid, int(i), rn + 1) for rn, i in enumerate(order)]
        assert rows == sorted(expect), strategy
