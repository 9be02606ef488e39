#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6, BASELINE.md).

Default: run the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

--scaling: run the north-star job at local[8] and local[32] (subprocesses,
same input + seed) and write BENCH/BASELINE.md with throughput at both plus
scaling efficiency = (rows/s @32) / (4 × rows/s @8) — the sandbox substitute
for the N vs 4N executor criterion (BASELINE.json:2; task instruction).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# north-star workload sizes. The per-round profile keeps driver rounds
# short; the scaling profile is sized so compute dominates fixed stage
# latency (otherwise the 8-vs-32 ratio measures Spark's constant overheads,
# not the engine). Sizes are identical at every parallelism level.
PROFILE = os.environ.get("SPARK_GRAFT_BENCH_PROFILE", "round")
PROFILES = {
    # rows, cols, pip points, knn probes, knn corpus, images
    "scaling": (450, 450, 4_000_000, 5_000, 200_000, 6_000),  # 202k surfaces → 810k edges
    "round": (250, 250, 500_000, 1_000, 100_000, 1_500),      # 62.5k surfaces → 250k edges
}
TOPO_ROWS, TOPO_COLS, PIP_POINTS, KNN_PROBES, KNN_CORPUS, N_IMAGES = PROFILES[PROFILE]


def _spark(cpus: str):
    from etf_topox_spark.session import get_spark

    return get_spark(app_name=f"etfx-bench-{cpus}", cores=cpus, shuffle_partitions=max(32, int(cpus) * 4))


def run_suite(cpus: str) -> dict:
    from pyspark.sql import functions as F

    from etf_topox_spark.operators.images import tiling_invariants
    from etf_topox_spark.operators.spatial import knn_join, pip_join
    from etf_topox_spark.operators.topology import (
        boundary_errors,
        interior_errors,
        intersection_errors,
        ring_meta,
        rings_to_edges,
        undirected_edge_stats,
        validate_topology,
    )
    from etf_topox_spark.registry import QUERIES, load_all_operators
    from etf_topox_spark.sources.images import synthetic_images
    from etf_topox_spark.sources.mosaic import surface_mosaic
    from etf_topox_spark.sources.points import synthetic_points

    load_all_operators()
    spark = _spark(cpus)
    spark.range(1).count()  # JVM warm

    timings: dict[str, float] = {}
    units: dict[str, int] = {}

    def bench(name: str, fn, rows: int):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        units[name] = rows

    # --- north-star: topology error detection (kernel stages) ---------------
    # cell_size sized so each cell holds ~400 edges: the per-cell O(n²
    # bbox-filtered) kernel amortizes per-group overhead; correctness is
    # cell-size-invariant (tests/test_topology.py::test_cell_size_invariance)
    CELL = 10.0
    rings = surface_mosaic(spark, rows=TOPO_ROWS, cols=TOPO_COLS, defect="dup_boundary")

    def topo_kernels():
        edges = rings_to_edges(rings, CELL).localCheckpoint(eager=False)
        ok = edges.filter(F.col("h1") != F.col("h2"))
        stats = undirected_edge_stats(ok)
        n = (
            boundary_errors(stats)
            .unionByName(intersection_errors(ok, CELL))
            .unionByName(interior_errors(ok, stats, ring_meta(rings)))
            .count()
        )
        return n

    bench("topology_kernels", topo_kernels, TOPO_ROWS * TOPO_COLS * 4)

    def topo_full():
        return validate_topology(spark, rings, cell_size=CELL).count()

    bench("topology_full", topo_full, TOPO_ROWS * TOPO_COLS * 4)

    # --- north-star: spatial joins ------------------------------------------
    grid = surface_mosaic(spark, rows=20, cols=20, defect="valid_mosaic")
    pts = synthetic_points(spark, PIP_POINTS)
    bench("pip_join", lambda: pip_join(spark, pts, grid).count(), PIP_POINTS)

    probes = synthetic_points(spark, KNN_PROBES, id_offset=5_000_000)
    corpus = synthetic_points(spark, KNN_CORPUS)
    bench("knn_join", lambda: knn_join(spark, probes, corpus, k=5).count(), KNN_PROBES)

    # --- north-star: image tiling + invariants ------------------------------
    imgs = synthetic_images(spark, N_IMAGES)
    bench("image_tiling", lambda: tiling_invariants(imgs).count(), N_IMAGES)

    # --- relational reference (sf corpus; skipped in the scaling profile:
    # sf0.1 is overhead-bound and would only measure constants) -------------
    if PROFILE != "scaling":
        for q in ("q1_pricing_summary", "join_fact_fact", "window_rank", "sessionize"):
            bench(q, lambda q=q: QUERIES[q](spark, SF_DIR).count(), 0)

    north = ["topology_kernels", "pip_join", "knn_join", "image_tiling"]
    north_rows = sum(units[n] for n in north)
    north_sec = sum(timings[n] for n in north)
    return {
        "metric": "topology-error detection + spatial-join + tiling throughput",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": int(cpus),
        "north_star_rows": north_rows,
        "north_star_sec": round(north_sec, 3),
        "north_star_rows_per_sec": round(north_rows / north_sec, 1),
    }


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for cpus in ("8", "32"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_BENCH_PROFILE="scaling")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--json-only"],
                env=env,
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        r8, r32 = results["8"], results["32"]
        eff = (r32["north_star_rows_per_sec"]) / (4 * r8["north_star_rows_per_sec"])
        s_rows, s_cols, s_pip, s_probes, s_corpus, s_imgs = PROFILES["scaling"]
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# BENCH/BASELINE — two-parallelism scaling evidence\n\n"
                "Same job, same input and seed, run at local[8] (N) and local[32]\n"
                "(4N) per the sandbox substitute for the N vs 4N executor\n"
                "criterion (BASELINE.json:2; BASELINE.md).\n\n"
                f"North-star workload (scaling profile): topology kernels\n"
                f"({s_rows}x{s_cols} surfaces → {s_rows*s_cols*4} edges) + PIP join\n"
                f"({s_pip} points, hot-cell skew + salting) + kNN join ({s_probes} probes /\n"
                f"{s_corpus} corpus) + image tiling invariants ({s_imgs} images).\n\n"
                "| parallelism | north-star rows | sec | rows/sec |\n"
                "| --- | --- | --- | --- |\n"
                f"| local[8] | {r8['north_star_rows']} | {r8['north_star_sec']} | {r8['north_star_rows_per_sec']} |\n"
                f"| local[32] | {r32['north_star_rows']} | {r32['north_star_sec']} | {r32['north_star_rows_per_sec']} |\n\n"
                f"**Scaling efficiency = {r32['north_star_rows_per_sec']} / (4 × "
                f"{r8['north_star_rows_per_sec']}) = {eff:.3f}** (target ≥ 0.8)\n\n"
                "Per-query seconds:\n\n"
                "| query | local[8] | local[32] |\n| --- | --- | --- |\n"
                + "".join(
                    f"| {k} | {r8['queries'][k]} | {r32['queries'][k]} |\n"
                    for k in r8["queries"]
                )
                + "\nNotes: topology_full includes the connected-components join\n"
                "loop whose per-round latency is fixed-cost at sandbox scale (it\n"
                "is excluded from the throughput metric and reported separately;\n"
                "on a real 4N cluster the per-round data volume dominates).\n"
            )
        print(json.dumps({"scaling_efficiency": round(eff, 3), "local8": r8, "local32": r32}))
        return

    res = run_suite(CPUS)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
