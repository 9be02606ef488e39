"""Checkpoint sink with per-partition lineage + anti-join resume
(SURVEY.md §2.B S5/J4; BASELINE.json:6 "Every stage checkpoints ... with
per-partition lineage (cell range, row count, error tally) so a killed job
resumes without recomputing validated cells").

Locally the sink is parquet; at deploy the same calls write Iceberg
(sources.tables swap point). The data is range-partitioned on the cell
column — the manifest rows are [cell_min, cell_max] per partition, which is
exactly what makes resume an anti-join instead of a row-level diff.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "stage string, part_id int, cell_min long, cell_max long, "
    "row_count long, error_count long, completed_at timestamp"
)


def checkpoint_write(
    df: DataFrame,
    base_path: str,
    stage: str,
    cell_col: str = "cell",
    error_col: str | None = None,
    num_partitions: int = 8,
) -> None:
    """Range-partition on the cell column (the north rule's explicit
    range-partitioning), write data + one manifest row per partition."""
    data_path = os.path.join(base_path, "data", stage)
    manifest_path = os.path.join(base_path, "manifest")
    part = df.repartitionByRange(num_partitions, F.col(cell_col))
    part.write.mode("overwrite").parquet(data_path)
    err = F.sum(F.col(error_col).cast("long")) if error_col else F.lit(0).cast("long")
    manifest = (
        part.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.min(cell_col).alias("cell_min"),
            F.max(cell_col).alias("cell_max"),
            F.count(F.lit(1)).alias("row_count"),
            err.alias("error_count"),
        )
        .select(
            F.lit(stage).alias("stage"),
            "part_id",
            "cell_min",
            "cell_max",
            "row_count",
            "error_count",
            F.current_timestamp().alias("completed_at"),
        )
    )
    manifest.write.mode("append").parquet(manifest_path)


def completed_ranges(spark: SparkSession, base_path: str, stage: str) -> DataFrame:
    manifest_path = os.path.join(base_path, "manifest")
    try:
        m = spark.read.parquet(manifest_path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return m.filter(F.col("stage") == stage)


def resume_filter(
    df: DataFrame, spark: SparkSession, base_path: str, stage: str, cell_col: str = "cell"
) -> DataFrame:
    """Drop rows whose cell falls in an already-completed range — the J4
    anti-join resume. The manifest is tiny (one row per partition), so it
    broadcasts; the fact side never shuffles."""
    done = completed_ranges(spark, base_path, stage).select("cell_min", "cell_max")
    return df.join(
        F.broadcast(done),
        (F.col(cell_col) >= F.col("cell_min")) & (F.col(cell_col) <= F.col("cell_max")),
        "left_anti",
    )


def read_stage(spark: SparkSession, base_path: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_path, "data", stage))
