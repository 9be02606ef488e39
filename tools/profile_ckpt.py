#!/usr/bin/env python
"""A/B the edges materialization strategy in the topology kernel stage:
localCheckpoint (block-manager write + 3 reads) vs pure lineage recompute
(map-only edges regenerated per consumer). Run at two parallelism levels to
see which wins where — recompute scales with cores, block traffic doesn't.
Usage: python tools/profile_ckpt.py <cpus> <ckpt|recompute>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = sys.argv[1]
MODE = sys.argv[2]
ROWS = int(os.environ.get("PROF_ROWS", "800"))
CELL = 10.0


def main():
    from pyspark.sql import functions as F

    from etf_topox_spark.operators.topology import (
        boundary_errors,
        interior_errors,
        intersection_errors,
        ring_meta,
        rings_to_edges,
        undirected_edge_stats,
    )
    from etf_topox_spark.session import get_spark
    from etf_topox_spark.sources.mosaic import surface_mosaic

    spark = get_spark(app_name=f"ckpt-{CPUS}-{MODE}", cores=CPUS,
                      shuffle_partitions=int(os.environ.get("PROF_SHUF", max(8, int(CPUS)))))
    spark.range(1).count()
    import pandas as _pd  # noqa: F401

    def _noop(b):
        yield from b

    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(_noop, "id long").count()

    rings = surface_mosaic(spark, rows=ROWS, cols=ROWS, defect="dup_boundary")
    t0 = time.time()
    edges = rings_to_edges(rings, CELL)
    if MODE == "ckpt":
        edges = edges.localCheckpoint(eager=False)
    ok = edges.filter(F.col("h1") != F.col("h2"))
    stats = undirected_edge_stats(ok, themes=["theme0"], with_holes=True)
    n = (
        boundary_errors(stats)
        .unionByName(intersection_errors(ok, CELL, themes=["theme0"]))
        .unionByName(interior_errors(ok, stats, ring_meta(rings)))
        .count()
    )
    dt = time.time() - t0
    print(json.dumps({"cpus": int(CPUS), "mode": MODE, "sec": round(dt, 3), "n": n}))


if __name__ == "__main__":
    main()
