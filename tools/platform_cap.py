#!/usr/bin/env python
"""Platform-envelope microbenchmarks for the scaling evidence.

Measures, at two parallelism levels, jobs with ZERO engine code:
  jvm_shuffle   — spark.range → groupBy(key%M) → agg (pure JVM exchange)
  jvm_map       — spark.range → hash/filter/count (no exchange)
The 2→8 ratio of jvm_shuffle is the box's ceiling for ANY
shuffle-containing Spark job; the engine's aggregate cannot be expected
to exceed it. Writes one JSON line per (job, cpus) pair.

Usage: python tools/platform_cap.py [rows]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000_000


def run_level(cpus: str) -> dict:
    from etf_topox_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"cap-{cpus}", cores=cpus,
                      shuffle_partitions=max(8, int(cpus)))
    spark.range(1).count()
    out = {}
    t0 = time.time()
    (
        spark.range(0, ROWS, 1, int(cpus) * 2)
        .select((F.col("id") % 1_000_000).alias("k"), (F.col("id") % 97).alias("v"))
        .groupBy("k").agg(F.sum("v"), F.count(F.lit(1)))
        .select(F.sum("k")).collect()
    )
    out["jvm_shuffle"] = round(time.time() - t0, 3)
    t0 = time.time()
    (
        spark.range(0, ROWS, 1, int(cpus) * 2)
        .select(F.xxhash64("id").alias("h"))
        .filter(F.col("h") % 1000 < 500)
        .agg(F.count(F.lit(1))).collect()
    )
    out["jvm_map"] = round(time.time() - t0, 3)
    return out


def main():
    if os.environ.get("CAP_CHILD"):
        print(json.dumps(run_level(os.environ["CAP_CHILD"])))
        return
    results = {}
    for cpus in ("2", "8"):
        env = dict(os.environ, CAP_CHILD=cpus)
        p = subprocess.run([sys.executable, os.path.abspath(__file__), str(ROWS)],
                           env=env, capture_output=True, text=True, timeout=1800)
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    for job in ("jvm_shuffle", "jvm_map"):
        eff = results["2"][job] / (4 * results["8"][job])
        print(json.dumps({"job": job, "sec2": results["2"][job],
                          "sec8": results["8"][job], "eff_2_to_8": round(eff, 3)}))


if __name__ == "__main__":
    main()
