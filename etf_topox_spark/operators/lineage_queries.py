"""Driver-contract surface for the checkpoint-lineage/resume path
(BASELINE.json:6). Runs the kill-and-resume cycle end to end inside one
query and returns the manifest the driver can count: stage s1 checkpoints
half the cell domain, resume anti-joins it away, stage s2 checkpoints the
remainder — row counts must tile the input exactly (asserted by
tests/test_streaming_lineage.py; the driver sees the manifest rows)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.plans.lineage import checkpoint_write, completed_ranges, resume_filter
from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T


_TOTALS_ORACLE = """
WITH b AS (SELECT MAX(event_id) // 2 AS half FROM events)
SELECT 's1' AS stage, COUNT(*) AS row_count,
       MIN(event_id) AS cell_min, MAX(event_id) AS cell_max
FROM events, b WHERE event_id <= half
UNION ALL
SELECT 's2', COUNT(*), MIN(event_id), MAX(event_id)
FROM events, b WHERE event_id > half
ORDER BY stage
"""


@query("checkpoint_resume_totals", oracle=_TOTALS_ORACLE)
def checkpoint_resume_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-level roll-up of the kill-and-resume manifest with an exact
    oracle: per-stage row counts and cell-range extents must tile the
    input precisely (resume lost nothing, recomputed nothing). The
    per-partition manifest itself stays a rows-only query — partition
    boundaries legitimately vary with the session — but these totals are
    partition-invariant."""
    m = checkpoint_resume_manifest(spark, sf_dir)
    return (
        m.groupBy("stage")
        .agg(
            F.sum("row_count").alias("row_count"),
            F.min("cell_min").alias("cell_min"),
            F.max("cell_max").alias("cell_max"),
        )
        .orderBy("stage")
    )


@query("checkpoint_resume_manifest")
def checkpoint_resume_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = os.path.join(
        tempfile.gettempdir(), f"etfx_ckpt_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    ev = T(spark, sf_dir, "events").select(F.col("event_id").alias("cell"), "user_id", "value")
    # simulate a kill after the first half of the cell domain (ranges are
    # contiguous — the lineage model is [cell_min, cell_max] per partition)
    half = ev.agg(F.max("cell")).collect()[0][0] // 2
    checkpoint_write(ev.filter(F.col("cell") <= half), base, stage="s1", cell_col="cell")
    remaining = resume_filter(ev, spark, base, "s1", cell_col="cell")
    checkpoint_write(remaining, base, stage="s2", cell_col="cell")
    m = completed_ranges(spark, base, "s1").unionByName(completed_ranges(spark, base, "s2"))
    return m.select("stage", "part_id", "cell_min", "cell_max", "row_count").orderBy(
        "stage", "part_id"
    )
