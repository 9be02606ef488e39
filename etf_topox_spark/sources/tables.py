"""Harness-table source (SURVEY.md §2.B S1/S2).

Local format is parquet; at deploy scale the same call sites read Iceberg
(``spark.read.format("iceberg").load(name)``) — the reference's analog is
BaseX db registration (``TopoX.initDb``, SURVEY.md §2.A R1). This thin IO
module is the single swap point between the two, so every operator shares
one code path (SURVEY.md §7 "Custom Catalyst work: none").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one harness table. Plain ``spark.read.parquet`` so Catalyst's
    predicate pushdown / column pruning reach the scan untouched."""
    if os.environ.get("SPARK_GRAFT_FORMAT", "parquet") == "iceberg":
        return spark.read.format("iceberg").load(f"local.db.{name}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
