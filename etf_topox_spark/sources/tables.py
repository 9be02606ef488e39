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
    predicate pushdown / column pruning reach the scan untouched.

    ``SPARK_GRAFT_FORMAT`` swaps the physical source for the SAME call
    sites: ``iceberg`` (deploy catalogs), or local ``orc``/``json``/``csv``
    mirrors at ``{sf_dir}/{name}.{ext}``. Non-parquet local formats take
    their schema from the parquet sibling when present so type fidelity
    (timestamps, arrays) survives text encodings."""
    fmt = os.environ.get("SPARK_GRAFT_FORMAT", "parquet")
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(f"local.db.{name}")
    if fmt == "parquet":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fmt not in ("orc", "json", "csv"):
        raise ValueError(f"unsupported SPARK_GRAFT_FORMAT {fmt!r}")
    path = f"{sf_dir}/{name}.{fmt}"
    sibling = f"{sf_dir}/{name}.parquet"
    reader = spark.read
    if os.path.exists(sibling):
        reader = reader.schema(spark.read.parquet(sibling).schema)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt == "json":
        # Spark's JSON default timestampNTZFormat carries only .SSS —
        # microseconds are truncated on write/read unless pinned to .SSSSSS.
        reader = reader.option(
            "timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    return getattr(reader, fmt)(path)
