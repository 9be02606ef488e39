"""Streaming replay-equivalence (SURVEY.md §5.2 item: batch twins) and
checkpoint-lineage resume tests (item 6)."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from etf_topox_spark.plans.lineage import (
    checkpoint_write,
    completed_ranges,
    read_stage,
    resume_filter,
)
from etf_topox_spark.registry import QUERIES, load_all_operators
from etf_topox_spark.sources.tables import load_table as T

load_all_operators()


def test_stream_tumbling_equals_batch(spark, sf_smoke):
    stream = QUERIES["streaming_tumbling_replay"](spark, sf_smoke).toPandas()
    batch = QUERIES["window_tumbling"](spark, sf_smoke).toPandas()
    pd.testing.assert_frame_equal(
        stream.reset_index(drop=True), batch.reset_index(drop=True)
    )


def test_stream_dedup_drops_planted_duplicates(spark, sf_smoke):
    got = QUERIES["streaming_dedup"](spark, sf_smoke).toPandas()
    truth = (
        T(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
        .orderBy("event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), truth.reset_index(drop=True))


def test_stream_stateful_tally_matches_batch(spark, sf_smoke):
    got = QUERIES["streaming_stateful_tally"](spark, sf_smoke).toPandas()
    truth = (
        T(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value"))
        .orderBy("user_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), truth.reset_index(drop=True))


def test_checkpoint_resume_no_recompute(spark, sf_smoke):
    """Kill-after-stage-k simulation: checkpoint half the cell domain, then
    resume over the full input — completed ranges must be anti-joined away
    and the combined output must equal a clean full run."""
    base = tempfile.mkdtemp(prefix="etfx_lineage_")
    try:
        ev = T(spark, sf_smoke, "events").select(
            F.col("event_id").alias("cell"), "user_id", "value"
        )
        full = ev
        first_half = ev.filter(F.col("cell") < 500)
        checkpoint_write(first_half, base, stage="s1", cell_col="cell")
        done = completed_ranges(spark, base, "s1").toPandas()
        assert done.row_count.sum() == first_half.count()
        assert done.cell_min.min() == 0

        remaining = resume_filter(full, spark, base, "s1", cell_col="cell")
        n_rem = remaining.count()
        # nothing recomputed: remaining ∩ completed = ∅ and sizes add up
        assert n_rem == full.count() - first_half.count()
        checkpoint_write(remaining, base, stage="s1b", cell_col="cell")

        out = read_stage(spark, base, "s1").unionByName(read_stage(spark, base, "s1b"))
        a = out.orderBy("cell").toPandas()
        b = full.orderBy("cell").toPandas()
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_resume_filter_is_broadcast(spark, sf_smoke):
    ev = T(spark, sf_smoke, "events").select(F.col("event_id").alias("cell"))
    base = tempfile.mkdtemp(prefix="etfx_lineage_b_")
    try:
        checkpoint_write(ev.limit(100), base, stage="s2", cell_col="cell")
        plan = resume_filter(ev, spark, base, "s2", cell_col="cell")._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_stream_join_matches_batch_twin(spark, sf_smoke):
    """The availableNow stream-stream interval join must equal the plain
    batch interval join (all data arrives before any watermark closes)."""
    from etf_topox_spark.registry import QUERIES
    from etf_topox_spark.sources.tables import load_table as T
    from pyspark.sql import functions as F

    got = QUERIES["streaming_stream_stream_join"](spark, sf_smoke).toPandas()
    ev = T(spark, sf_smoke, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id"), F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = (
        v.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") >= F.col("vts"))
            & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 240 MINUTES")),
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            (F.unix_micros(F.to_utc_timestamp("cts", "UTC"))
             - F.unix_micros(F.to_utc_timestamp("vts", "UTC"))).alias("gap_us"),
        )
        .orderBy("view_id", "click_id")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(batch.reset_index(drop=True))
    assert (got["gap_us"] >= 0).all() and (got["gap_us"] <= 240 * 60 * 1_000_000).all()
