#!/usr/bin/env python
"""Per-stage 2-vs-8-core profile of the topology_kernels scaling workload.

Times each stage of bench.py's topo_kernels separately (edges materialize,
stats shuffle, boundary filter, intersection kernel, interior kernel) so the
2->8 efficiency loss can be attributed to a stage instead of a job.
Run: python tools/profile_topo.py 2 ; python tools/profile_topo.py 8
Prints one JSON line per run.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = sys.argv[1] if len(sys.argv) > 1 else "8"
ROWS = int(os.environ.get("PROF_ROWS", "800"))
COLS = int(os.environ.get("PROF_COLS", "800"))
CELL = float(os.environ.get("PROF_CELL", "2.0"))


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

    spark = get_spark(app_name=f"prof-{CPUS}", cores=CPUS,
                      shuffle_partitions=max(8, int(CPUS)))
    spark.range(1).count()

    # same representative worker warm-up as bench.py (imports + allocator
    # arena; rationale in etf_topox_spark/functions/warmup.py)
    from etf_topox_spark.functions.warmup import warm_python_workers

    warm_python_workers(spark, int(CPUS))

    t = {}

    def bench(name, fn):
        t0 = time.time()
        n = fn()
        t[name] = round(time.time() - t0, 3)
        return n

    rings = surface_mosaic(spark, rows=ROWS, cols=COLS, defect="dup_boundary")
    edges = rings_to_edges(rings, CELL).localCheckpoint(eager=False)
    bench("a_edges_materialize", lambda: edges.count())
    ok = edges.filter(F.col("h1") != F.col("h2"))
    stats = undirected_edge_stats(
        ok, themes=["theme0"], with_holes=True
    ).localCheckpoint(eager=False)
    bench("b_stats_shuffle", lambda: stats.count())
    bench("c_boundary", lambda: boundary_errors(stats).count())
    bench("d_intersection", lambda: intersection_errors(ok, CELL, themes=["theme0"]).count())
    meta = ring_meta(rings).localCheckpoint(eager=False)
    bench("e_ring_meta", lambda: meta.count())
    bench("f_interior", lambda: interior_errors(ok, stats, meta).count())
    t["total"] = round(sum(t.values()), 3)
    print(json.dumps({"cpus": int(CPUS), "rows": ROWS, "stages": t}))


if __name__ == "__main__":
    main()
