#!/usr/bin/env python
"""spark-submit entrypoint for the full north-star pipeline.

Deploy form (north rule, BASELINE.json:14 "ships via spark-submit
--py-files on a multi-executor cluster"):

    python deploy/build_artifact.py
    spark-submit --master <cluster> \\
        --py-files dist/etf_topox_spark.zip \\
        deploy/submit_main.py --checkpoint /path/ckpt --rows 450 --cols 450

The script deliberately does NOT set a master: spark-submit owns cluster
topology. All imports of engine code resolve from the --py-files artifact,
not the repo checkout — tests/test_deploy_submit.py proves that by running
this file from an empty cwd.

Stages (each checkpointed with per-partition lineage, resumable):
  1. edges       — mosaic rings → per-cell directed edges (Arrow kernel)
  2. errors      — half-edge topology validation (all error families)
  3. pip         — point-in-polygon spatial join on the cell index
  4. tiles       — image tiling + decode invariants (PSNR / caption)

A second invocation with the same --checkpoint dir resumes: stages whose
cell ranges are already in the manifest are skipped via broadcast anti-join
(plans.lineage.resume_filter).
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf infers its
# eval type from *evaluated* annotations, and postponed annotations break that.
import argparse
import json
import sys
import time

import pandas as pd


def parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="lineage checkpoint dir")
    ap.add_argument("--rows", type=int, default=80, help="mosaic rows")
    ap.add_argument("--cols", type=int, default=80, help="mosaic cols")
    ap.add_argument("--points", type=int, default=100_000, help="PIP probe points")
    ap.add_argument("--images", type=int, default=200, help="synthetic image count")
    ap.add_argument("--cell-size", type=float, default=10.0)
    ap.add_argument("--defect", default="dup_boundary")
    ap.add_argument("--smoke", action="store_true", help="tiny sizes, fast CI run")
    return ap.parse_args(argv)


def main(argv: list[str] | None = None) -> dict:
    args = parse_args(sys.argv[1:] if argv is None else argv)
    if args.smoke:
        args.rows, args.cols, args.points, args.images = 12, 12, 5_000, 24

    # Imports deferred until after spark-submit has put the --py-files
    # artifact on sys.path for both driver and executors.
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from etf_topox_spark.operators.images import tiling_invariants
    from etf_topox_spark.operators.spatial import pip_join
    from etf_topox_spark.operators.topology import rings_to_edges, validate_topology
    from etf_topox_spark.plans.lineage import checkpoint_write, completed_ranges, resume_filter
    from etf_topox_spark.registry import load_all_operators
    from etf_topox_spark.sources.images import synthetic_images
    from etf_topox_spark.sources.mosaic import surface_mosaic
    from etf_topox_spark.sources.points import synthetic_points

    spark = (
        SparkSession.builder.appName("etf-topox-spark-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    load_all_operators()

    t0 = time.time()
    summary: dict = {"stages": {}}

    from pyspark.sql.functions import pandas_udf

    cell_size = args.cell_size

    @pandas_udf("long")
    def owner_cell(x: pd.Series, y: pd.Series) -> pd.Series:
        # vectorized Morton owner-cell (functions.cells.planar_cell) — the
        # lineage range key per BASELINE.json:6 "cell range, row count,
        # error tally"
        from etf_topox_spark.functions import cells as C

        return pd.Series(C.planar_cell(x.to_numpy(), y.to_numpy(), cell_size))

    # -- stage 1: rings → edges, checkpointed on owner cell ---------------
    rings = surface_mosaic(spark, rows=args.rows, cols=args.cols, defect=args.defect)
    edges = rings_to_edges(rings, args.cell_size).withColumn(
        "cell", owner_cell(F.col("x1"), F.col("y1"))
    )
    done_parts = completed_ranges(spark, args.checkpoint, "edges").count()
    todo = resume_filter(edges, spark, args.checkpoint, "edges")
    todo_rows = todo.count()
    if todo_rows:
        checkpoint_write(todo, args.checkpoint, "edges", cell_col="cell")
    summary["stages"]["edges"] = {
        "resumed_partitions": int(done_parts),
        "written_rows": int(todo_rows),
    }

    # -- stage 2: topology validation ------------------------------------
    errors = validate_topology(spark, rings, cell_size=args.cell_size).withColumn(
        "cell", owner_cell(F.col("x"), F.col("y"))
    )
    checkpoint_write(
        errors.withColumn("err", F.lit(1)), args.checkpoint, "errors", cell_col="cell", error_col="err"
    )
    summary["stages"]["errors"] = {
        "count": errors.count(),
        "codes": sorted(r["error_code"] for r in errors.select("error_code").distinct().collect()),
    }

    # -- stage 3: PIP spatial join ---------------------------------------
    grid = surface_mosaic(spark, rows=20, cols=20, defect="valid_mosaic")
    pts = synthetic_points(spark, args.points)
    assigned = pip_join(spark, pts, grid)
    summary["stages"]["pip"] = {"matched": assigned.count(), "points": args.points}

    # -- stage 4: image tiling + per-row invariants ----------------------
    imgs = synthetic_images(spark, args.images)
    inv = tiling_invariants(imgs)
    # Per-row invariant from BASELINE.json:15: decoded-pixel PSNR >= 40 dB
    # (lossless recon gives +inf) + caption equality, plus phash stability.
    bad = inv.filter(
        ~((F.col("psnr") >= 40.0) & F.col("caption_ok") & F.col("phash_ok"))
    ).count()
    summary["stages"]["tiles"] = {"images": args.images, "invariant_violations": bad}

    summary["wall_sec"] = round(time.time() - t0, 2)
    summary["ok"] = bad == 0 and summary["stages"]["errors"]["count"] > 0
    print("PIPELINE_SUMMARY " + json.dumps(summary))
    spark.stop()
    return summary


if __name__ == "__main__":
    out = main()
    sys.exit(0 if out.get("ok") else 1)
