"""Physical-plan quality gates (SURVEY.md §4; task brief: '.explain the
plan and iterate until it's the plan you'd want').

These pin the properties that make the engine scale: filters reach the
parquet scan, scans prune columns, small dims broadcast, relational
expressions stay inside whole-stage codegen, and no per-row Python UDF
(BatchEvalPython) appears anywhere (BASELINE.json:15 'no per-row Python').
"""

from __future__ import annotations

import pytest

from etf_topox_spark.registry import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.01"


def _plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(QUERIES["filter_project"](spark, SF))
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not an empty list
    assert "PushedFilters: []" not in plan


def test_column_pruning(spark):
    plan = _plan(QUERIES["filter_project"](spark, SF))
    # ReadSchema must not include the wide comment column
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "l_comment" not in read_schema[0]


def test_dim_join_broadcasts(spark):
    plan = _plan(QUERIES["join_broadcast_dims"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_relational_plans_stay_jvm_side(spark):
    # BatchEvalPython = row-at-a-time Python UDF; banned everywhere.
    # Relational/scalar/window/agg queries must also avoid Arrow UDFs —
    # they are pure Catalyst expressions.
    for name in (
        "q1_pricing_summary", "filter_project", "join_fact_fact",
        "window_rank", "agg_stats", "string_funcs", "datetime_funcs",
        "sessionize", "topk_per_group", "set_intersect",
    ):
        df = QUERIES[name](spark, SF)
        # collect() executes THIS DataFrame's QueryExecution so AQE
        # finalizes it (count() would plan a separate aggregation)
        df.collect()
        plan = _plan(df)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        # '*(n) Op' markers in simple mode = operator inside a
        # WholeStageCodegen span
        simple = _plan(df, "simple")
        assert "*(" in simple, (name, simple)


def test_no_per_row_python_udf_anywhere(spark):
    # X6 absence (COVERAGE.md): every query's plan is free of
    # row-at-a-time Python eval; Arrow kernels (MapInPandas/FlatMapGroups)
    # are the sanctioned Python path.
    offenders = []
    for name, fn in QUERIES.items():
        if name.startswith("streaming_"):
            continue  # streaming queries need a streaming harness
        try:
            plan = _plan(fn(spark, SF), "extended")
        except Exception:
            continue  # non-plan failures are other tests' business
        # BatchEvalPythonUDTF is Spark's node name for UDTF eval; with
        # spark.sql.execution.pythonUDTF.arrow.enabled (set in session.py)
        # it becomes ArrowEvalPythonUDTF. Only scalar row-at-a-time eval
        # (bare BatchEvalPython) is banned.
        if "BatchEvalPython " in plan or "BatchEvalPython(" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_lineage_resume_join_broadcasts(spark, tmp_path):
    from pyspark.sql import functions as F

    from etf_topox_spark.plans.lineage import checkpoint_write, resume_filter
    from etf_topox_spark.sources.tables import load_table as T

    ev = T(spark, SF, "events").select(F.col("event_id").alias("cell"), "value")
    checkpoint_write(ev.limit(100), str(tmp_path), "s1", cell_col="cell")
    plan = _plan(resume_filter(ev, spark, str(tmp_path), "s1"))
    # the tiny manifest must broadcast; the fact side must not shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("qname", ["spatial_pip_join", "spatial_knn_join"])
def test_spatial_broadcast_strategy_is_shuffle_free(spark, qname):
    plan = _plan(QUERIES[qname](spark, SF))
    # auto strategy resolves to broadcast at fixture scale: the probe/point
    # side flows straight into the Arrow kernel with no Exchange
    assert "MapInPandas" in plan
    assert "Exchange hashpartitioning" not in plan


def test_face_pipeline_no_single_partition_stage(spark):
    """The face traversal must not funnel all half-edges through one
    partition (the round-2 scale-killer was a global no-partitionBy
    ROW_NUMBER rank). Neither the successor-permutation build nor one
    round of the distributed pointer-doubling labeler may contain an
    Exchange SinglePartition."""
    from pyspark.sql import functions as F

    from etf_topox_spark.functions import coords as X
    from etf_topox_spark.operators.topology import (
        face_successor_pairs,
        rings_to_edges,
    )
    from etf_topox_spark.sources.mosaic import surface_mosaic

    rings = surface_mosaic(spark, rows=6, cols=6, defect="valid_mosaic")
    pairs = face_successor_pairs(rings_to_edges(rings))
    assert "SinglePartition" not in _plan(pairs)

    # one pointer-doubling round, as _face_labels_distributed builds it
    st = pairs.select(
        "theme",
        F.col("src_a").alias("ka"),
        F.col("src_b").alias("kb"),
        F.struct(
            X.unpack_x_col(F.col("src_a")).alias("fax"),
            X.unpack_y_col(F.col("src_a")).alias("fay"),
            X.unpack_x_col(F.col("src_b")).alias("fbx"),
            X.unpack_y_col(F.col("src_b")).alias("fby"),
        ).alias("lbl"),
        F.col("dst_a").alias("na"),
        F.col("dst_b").alias("nb"),
    )
    succ = st.select(
        F.col("theme").alias("t2"),
        F.col("ka").alias("ja"),
        F.col("kb").alias("jb"),
        F.col("lbl").alias("jlbl"),
        F.col("na").alias("jna"),
        F.col("nb").alias("jnb"),
    )
    rnd = st.join(
        succ,
        (F.col("theme") == F.col("t2"))
        & (F.col("na") == F.col("ja"))
        & (F.col("nb") == F.col("jb")),
    ).select("theme", "ka", "kb", F.least("lbl", "jlbl").alias("lbl"))
    assert "SinglePartition" not in _plan(rnd)


def test_sql_entrypoint_udfs(spark):
    """SURVEY §3.3: kernels callable from pure SQL text."""
    import numpy as np

    from etf_topox_spark.functions import cells as C
    from etf_topox_spark.sql import register_views

    register_views(spark, SF)
    row = spark.sql(
        "SELECT cell_of(1.25, 2.5) AS c, cell_parent(cell_of(1.25, 2.5)) AS p"
    ).collect()[0]
    expect_c = int(C.latlng_to_cell(np.array([1.25]), np.array([2.5]), 8)[0])
    expect_p = int(C.cell_to_parent(np.array([expect_c]), 4)[0])
    assert row["c"] == expect_c
    assert row["p"] == expect_p


def test_phash_knn_probes_broadcast(spark):
    # the probe side must broadcast: corpus never shuffles for the scan
    plan = _plan(QUERIES["image_phash_knn"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan


def test_bloom_prune_is_map_side(spark):
    # the bloom prune is a MapInPandas directly over the scan — the fact
    # table must not pass through any exchange before the membership filter
    from etf_topox_spark.operators.relational import bloom_prune
    from etf_topox_spark.sources.tables import load_table as T
    import numpy as np

    li = T(spark, SF, "lineitem").select("l_orderkey")
    pruned = bloom_prune(li, "l_orderkey", np.zeros((1 << 17) // 64, np.uint64))
    plan = _plan(pruned)
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_contamination_benchmark_side_broadcasts(spark):
    plan = _plan(QUERIES["text_contamination"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # the corpus side must not be shuffled for the gram join
    assert plan.count("SortMergeJoin") == 0


def test_exists_subquery_rewrites_to_semi_anti(spark):
    plan = _plan(QUERIES["join_exists_subquery"](spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan


def test_interior_errors_no_stats_wide_join(spark):
    """The R11 fast path must read hole-sharing off the stats aggregate —
    never re-join the full stats table on the undirected edge key (the
    legacy plan shuffled every stats row to probe a handful of holes)."""
    from pyspark.sql import functions as F

    from etf_topox_spark.operators.topology import (
        interior_errors,
        ring_meta,
        rings_to_edges,
        undirected_edge_stats,
    )
    from etf_topox_spark.sources.mosaic import surface_mosaic

    rings = surface_mosaic(spark, rows=6, cols=6, defect="hole_defect")
    edges = rings_to_edges(rings).filter(F.col("h1") != F.col("h2"))
    stats = undirected_edge_stats(edges, with_holes=True)
    plan = _plan(interior_errors(edges, stats, ring_meta(rings)))
    for line in plan.splitlines():
        if "Join" in line and ("lo_h" in line or "hi_h" in line):
            raise AssertionError(f"stats-wide edge-key join survived: {line}")


def test_aqe_runtime_replan_active(spark):
    """AQE must actually re-plan at runtime (north rule: 'AQE for runtime
    re-plan'): after executing a shuffle whose 32 static partitions carry
    tiny data, the final adaptive plan must show coalesced shuffle reads."""
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 100_000)
        .select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_q3_filters_push_below_joins_and_dim_broadcasts(spark):
    df = QUERIES["q3_shipping_priority"](spark, SF)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # both timestamp filters must reach the parquet scans
    assert plan.count("PushedFilters: [IsNotNull") >= 2
    assert "1998-03-15" in plan  # pushed literal visible at a scan


def test_polyfill_is_shuffle_free_codegen(spark):
    df = QUERIES["cell_polyfill"](spark, SF)
    plan = _plan(df)
    # map-side explode + bit ops only: no exchange other than the final
    # presentation sort, no Python eval of any kind
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only exchange is the presentation orderBy (range partitioning);
    # the kernel itself never hash-shuffles (Generate nodes split the
    # codegen span, so no WSCG assertion — the ops are still all JVM)
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" in plan


def test_market_basket_supports_broadcast_back(spark):
    df = QUERIES["orders_market_basket"](spark, SF)
    df.collect()
    plan = _plan(df)
    # the per-item support join and the one-row totals join both broadcast;
    # only the within-order pair join and the aggregates may shuffle
    assert plan.count("BroadcastHashJoin") >= 2 or (
        "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" in plan
    )


def test_zscore_moments_broadcast_back(spark):
    df = QUERIES["events_anomaly_zscore"](spark, SF)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_box_match_pr_no_single_partition_window(spark):
    """The PR-matching argmax windows partition on box_id / gt_id — a
    no-partitionBy window (Exchange SinglePartition) would serialize all
    detections through one task. The image join must be a real equi-join
    (hash-partitioned or broadcast), never a cartesian product."""
    plan = _plan(QUERIES["image_box_match_pr"](spark, SF))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hausdorff_partial_aggregation(spark):
    """Both MIN and MAX reductions must partial-aggregate map-side (two
    HashAggregate levels around each exchange) and the pair join must be
    an equi-join on the group key."""
    plan = _plan(QUERIES["geom_hausdorff_discrete"](spark, SF))
    assert "partial_min" in plan and "partial_max" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize(
    "qname",
    ["graph_bfs_hops", "events_markov_transitions", "geom_line_interpolate",
     "part_skyline", "text_pii_redact", "embedding_pca_power"],
)
def test_round3f_ops_stay_clean(spark, qname):
    """Round-3f additions: no cartesian products, no row-at-a-time Python,
    and no accidental single-partition funnel beyond the presentation sort
    (rangepartitioning for a final orderBy is fine; Exchange
    SinglePartition anywhere else is not)."""
    plan = _plan(QUERIES[qname](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    body = plan.split("== Physical Plan ==")[-1]
    # skyline's stage-2 front merge legitimately coalesces to one task
    if qname != "part_skyline":
        assert "SinglePartition" not in body


@pytest.mark.parametrize("qname", ["graph_connected_components", "graph_weighted_sssp"])
def test_round3g_graph_ops_stay_clean(spark, qname):
    """Round-3g graph additions: every iterative round is an equi-join on
    the node id — no cartesian, no Python rows, no single-partition funnel
    beyond the presentation sort."""
    plan = _plan(QUERIES[qname](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    body = plan.split("== Physical Plan ==")[-1]
    assert "SinglePartition" not in body


def test_morans_i_partial_aggregates(spark):
    """Moran's I: the cell count and the num/den reductions must partial-
    aggregate map-side (the only SinglePartition exchanges are the final
    single-row reduces), the neighbor pairing must be a hash equi-join on
    the shifted cell key (never a cartesian/theta join), and the whole plan
    stays JVM-side."""
    plan = _plan(QUERIES["spatial_morans_i"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_zorder_layout_no_sort_no_python(spark):
    """The z-layout must assign by Morton PREFIX — no global ordering
    exchange (rangepartitioning only for the 2-row presentation sort), no
    Python, no cartesian; the file-stats reduce partial-aggregates."""
    plan = _plan(QUERIES["zorder_layout_stats"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan or "partial_count" in plan


def test_bigram_lm_vocabulary_broadcasts(spark):
    """The bigram model table is alphabet²-bounded → must join back as a
    broadcast, and the extraction explode stays JVM-side."""
    plan = _plan(QUERIES["text_bigram_likelihood"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize(
    "qname",
    ["graph_kcore", "events_cusum_changepoint", "image_channel_histogram"],
)
def test_round3g_batch2_ops_stay_clean(spark, qname):
    """k-core peel rounds are node-keyed equi-joins; CUSUM windows
    partition on event_type (never global); the histogram's only Python is
    the Arrow decode kernel (ArrowEvalPython/MapInPandas — allowed), with
    the (channel, bin) reduce partial-aggregated."""
    plan = _plan(QUERIES[qname](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    body = plan.split("== Physical Plan ==")[-1]
    assert "SinglePartition" not in body


@pytest.mark.parametrize(
    "qname",
    [
        "spatial_str_pack",
        "spatial_quadtree_partition",
        "raster_zonal_stats",
        "raster_tile_cover",
        "image_pyramid_stats",
        "image_integral_boxsum",
    ],
)
def test_round3h_partitioners_stay_distributed(spark, qname):
    """STR's global rank must NOT be a single-partition sort (that is the
    exact shape the distributed range-rank replaces); the quadtree is
    explode → partial-agg → self-join; zonal stats decode in Arrow kernels
    only (MapInPandas, never BatchEvalPython) and the per-zone reduce is
    an ordinary hash aggregate."""
    plan = _plan(QUERIES[qname](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    body = plan.split("== Physical Plan ==")[-1]
    assert "SinglePartition" not in body


def test_plans_md_covers_every_query():
    """PLANS.md staleness gate (VERDICT r3 'Next round' #3): the audit
    artifact must have exactly one row per registered query — a new
    query without a regenerated audit fails here, so the table can't
    silently drift from the registry again."""
    import os
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md")
    with open(path) as f:
        txt = f.read()
    audited = set(re.findall(r"^\| (\S+) \|", txt, flags=re.M)) - {"query", "---"}
    registered = set(QUERIES)
    missing = sorted(registered - audited)
    stale = sorted(audited - registered)
    assert not missing, f"queries missing from PLANS.md: {missing} (run tools/plan_audit.py)"
    assert not stale, f"PLANS.md rows with no registered query: {stale} (run tools/plan_audit.py)"
