"""Structured-Streaming surface over the events table (SURVEY.md §2.B
T1-T6): watermarks, tumbling/session windows, stateful dedup, arbitrary
state, and replay-equivalence with the batch twins.

Local streams replay the events parquet through a file source with an
availableNow trigger into a memory sink — a deterministic single pass whose
result must equal the batch query (tests assert it; the driver checks
`streaming_tumbling_replay` against the same DuckDB oracle as the batch
tumbling window).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.relational import _dsum_sql, dsum
from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _stage_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Copy the events parquet into a per-(sf,pid) temp dir so the file
    source has a stable directory to watch."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(tempfile.gettempdir(), f"etfx_stream_{tag}_{os.getpid()}")
    if not os.path.isdir(d) or not os.listdir(d):
        os.makedirs(d, exist_ok=True)
        shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet"))
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # single batch → deterministic
        .parquet(_stage_stream_dir(spark, sf_dir))
    )
    # watermarks require TIMESTAMP; interpret the naive ts as a UTC instant
    # (session-TZ-independent: to_utc_timestamp(ntz,'UTC') →
    # convert_timezone('UTC','UTC', ·) round-trips exactly)
    return s.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))


def _ntz(col):
    """TIMESTAMP (UTC-instant) → the original naive wall time."""
    return F.convert_timezone(F.lit("UTC"), F.lit("UTC"), col)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- T1+T2: watermarked tumbling windows, replay == batch == DuckDB oracle ----

_TUMBLING_ORACLE = f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
"""


@query("streaming_tumbling_replay", oracle=_TUMBLING_ORACLE)
def streaming_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = s.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value")
    )
    out = run_to_memory(agg, f"tumbling_replay_{abs(hash(sf_dir)) % 10**6}", "complete")
    return out.select(
        _ntz(F.col("w.start")).alias("window_start"), "event_type", "n_events", "sum_value"
    ).orderBy("window_start", "event_type")


# --- T3: streaming session windows ---------------------------------------------

# batch-equivalence oracle: F.session_window merges touching windows
# (probed: an exact 30:00 gap continues the session), so the lag-gap-cumsum
# twin breaks strictly on gap > 30 min — the same rule as the batch
# `sessionize` oracle.
_SESSION_STREAM_ORACLE = """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    ORDER BY user_id, session_start
"""


@query("streaming_session_windows", oracle=_SESSION_STREAM_ORACLE)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = s.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = run_to_memory(agg, f"session_replay_{abs(hash(sf_dir)) % 10**6}", "complete")
    return out.select(
        "user_id", _ntz(F.col("sw.start")).alias("session_start"), "n_events"
    ).orderBy("user_id", "session_start")


# --- T4: stateful dedup -----------------------------------------------------------

# batch twin: the planted duplicates are exact row copies, so surviving
# uniques per type = COUNT(DISTINCT event_id) per type.
_DEDUP_ORACLE = """
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type ORDER BY event_type
"""


@query("streaming_dedup", oracle=_DEDUP_ORACLE)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    # planted duplicates: replay each event twice via unionByName
    dup = s.unionByName(s)
    dd = dup.dropDuplicatesWithinWatermark(["event_id"])
    agg = dd.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
    out = run_to_memory(agg, f"dedup_replay_{abs(hash(sf_dir)) % 10**6}", "complete")
    return out.orderBy("event_type")


# --- T6: foreachBatch → checkpoint sink (reuses the S5 lineage machinery) ----

@query("streaming_foreachbatch_checkpoint")
def streaming_foreachbatch_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream → foreachBatch → range-partitioned checkpoint with lineage
    (SURVEY.md §2.B T6/S5): returns the manifest rows written."""
    import tempfile

    from etf_topox_spark.plans.lineage import checkpoint_write, completed_ranges

    base = os.path.join(
        tempfile.gettempdir(),
        f"etfx_stream_ckpt_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)
    s = events_stream(spark, sf_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        checkpoint_write(
            batch_df.select(F.col("event_id").alias("cell"), "user_id", "value"),
            base,
            stage=f"batch_{batch_id}",
            cell_col="cell",
        )

    q = s.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    m = spark.read.parquet(os.path.join(base, "manifest"))
    return m.select("stage", "part_id", "cell_min", "cell_max", "row_count").orderBy(
        "stage", "part_id"
    )


# --- T5: arbitrary state (per-user running tally kernel) ---------------------------

def user_tally_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState: per-user event tally + max value — the
    TopologyErrorCollector-style incremental tally re-expressed as a
    stateful streaming kernel (SURVEY.md §2.B T5)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")

    def tally(key, pdfs, state: GroupState):
        count, vmax = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            count += len(pdf)
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
        state.update((count, vmax))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [count], "max_value": [vmax]}
        )

    return s.groupBy("user_id").applyInPandasWithState(
        tally,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n_events long, max_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# batch twin of the final state: the tally kernel's count and running max
# are monotone across update emissions, so max-aggregating the update rows
# yields exactly the per-user batch aggregate regardless of batch slicing.
_TALLY_ORACLE = """
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
"""


@query("streaming_stateful_tally", oracle=_TALLY_ORACLE)
def streaming_stateful_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_to_memory(
        user_tally_stream(spark, sf_dir),
        f"tally_replay_{abs(hash(sf_dir)) % 10**6}",
        "update",
    )
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
        .orderBy("user_id")
    )


# --- T7: watermarked stream-stream interval join -------------------------------

# batch twin: the availableNow replay delivers everything before any
# watermark closes, and inner stream-stream joins emit matches as they
# form (the watermark only bounds state retention), so the streaming
# result equals the batch interval join exactly.
_SS_JOIN_ORACLE = """
    SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM events v JOIN events c
      ON c.user_id = v.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 240 MINUTE
    ORDER BY view_id, click_id
"""


@query("streaming_stream_stream_join", oracle=_SS_JOIN_ORACLE)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click attribution as a watermarked stream-stream self-join:
    each 'view' joins every click by the same user within the following
    4 hours. Both sides carry watermarks so the join state is bounded
    (Spark drops buffered rows once the other side's watermark passes the
    interval bound) — the unbounded-state hazard of stream-stream joins is
    exactly what the time-range condition + watermark pair solves at
    scale."""
    s = events_stream(spark, sf_dir)
    views = (
        s.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "300 minutes")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "300 minutes")
    )
    j = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 240 MINUTES")),
    )
    out = run_to_memory(j, f"ss_join_{abs(hash(sf_dir)) % 10**6}", "append")
    return out.select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    ).orderBy("view_id", "click_id")


# --- T2b: sliding-window top-k event types -------------------------------------

TOPK_K = 3

# batch twin: every event lands in exactly 2 sliding windows (30-min window,
# 15-min slide): its own 15-min bucket and the one before
_SLIDING_TOPK_ORACLE = f"""
WITH wins AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts)
           - k.range * INTERVAL '15 minutes' AS window_start,
         event_type
  FROM events, range(0, 2) k),
agg AS (
  SELECT window_start, event_type, COUNT(*) AS n_events
  FROM wins GROUP BY 1, 2),
rk AS (
  SELECT window_start, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type) AS rnk
  FROM agg)
SELECT window_start, event_type, n_events, CAST(rnk AS INT) AS rnk
FROM rk WHERE rnk <= {TOPK_K}
ORDER BY window_start, rnk
"""


@query("streaming_sliding_topk", oracle=_SLIDING_TOPK_ORACLE)
def streaming_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-topics shape: sliding-window (30 min / 15 min slide)
    event-type counts as a WATERMARKED STREAMING aggregation, then top-k
    per window ranked on the materialized (already tiny) result — rank is
    not a streaming-supported op, so the two-phase split is the production
    pattern (stream keeps the heavy count state, the per-trigger rank runs
    on #windows × #types rows). The (count desc, event_type) ordering is a
    total order, so the k-frontier is engine-independent under count ties.
    The oracle replays it as a batch: each event belongs to exactly two
    slide buckets."""
    from pyspark.sql.window import Window as W

    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "30 minutes", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            _ntz(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    done = run_to_memory(agg, "sliding_topk", "complete")
    rnk = F.row_number().over(
        W.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.col("event_type")
        )
    )
    return (
        done.select("window_start", "event_type", "n_events", rnk.alias("rnk"))
        .where(F.col("rnk") <= TOPK_K)
        .orderBy("window_start", "rnk")
    )


# --- T7b: watermarked stream-stream LEFT OUTER join ----------------------------

# Outer null rows are watermark-gated: Spark emits a null-padded view only
# once the GLOBAL watermark (min over both sides' watermarks = min(max view
# ts, max click ts) − 30 min, millisecond precision) has passed the view's
# match interval (view_ts + 240 min) — rows nearer the end of the replay
# stay buffered forever (no more triggers advance the watermark), so the
# exact closed form is: matched pairs (same as the inner join) UNION the
# unmatched views with ts + 240min < wm. Calibrated empirically at sf0.001
# AND sf0.01 (distinct per-side maxima pin min-vs-global and the −240
# offset independently).
_SS_LEFT_OUTER_ORACLE = """
WITH wm AS (
  SELECT LEAST(MAX(CASE WHEN event_type = 'view' THEN ts END),
               MAX(CASE WHEN event_type = 'click' THEN ts END))
         - INTERVAL 30 MINUTE AS w
  FROM events
),
pairs AS (
  SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
         epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
  FROM events v JOIN events c
    ON c.user_id = v.user_id
   AND v.event_type = 'view' AND c.event_type = 'click'
   AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 240 MINUTE
),
evicted AS (
  SELECT v.event_id AS view_id, CAST(NULL AS BIGINT) AS click_id,
         v.user_id, CAST(NULL AS BIGINT) AS gap_us
  FROM events v, wm
  WHERE v.event_type = 'view'
    AND v.ts + INTERVAL 240 MINUTE < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = v.user_id AND c.event_type = 'click'
        AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 240 MINUTE)
)
SELECT * FROM pairs
UNION ALL SELECT * FROM evicted
ORDER BY view_id, click_id
"""


@query("streaming_left_outer_join", oracle=_SS_LEFT_OUTER_ORACLE)
def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution WITH the misses: the stream-stream join as LEFT OUTER,
    so views that never convert emit a null-padded row once the watermark
    proves no click can still arrive — the shape every funnel/attribution
    pipeline actually ships (the inner join silently drops non-converters).
    State stays bounded exactly as in the inner variant; the only new
    semantics is the watermark-gated null emission, whose closed form the
    oracle pins (see _SS_LEFT_OUTER_ORACLE). At 10^12 events: identical
    exchanges to the inner join (both sides hash-partition on user_id),
    plus nothing — null emission is a state-store scan at watermark
    advance, no extra shuffle."""
    s = events_stream(spark, sf_dir)
    views = (
        s.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "30 minutes")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    j = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 240 MINUTES")),
        "left_outer",
    )
    out = run_to_memory(j, f"ss_louter_{abs(hash(sf_dir)) % 10**6}", "append")
    return out.select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    ).orderBy("view_id", "click_id")


# --- T5b: CDC latest-wins upsert snapshot (streaming twin of cdc_upsert_snapshot)

# batch twin: the stateful kernel keeps, per key, the max-(ts, event_id)
# operation seen so far; both the count and the kept op are monotone
# across update emissions, so taking each user's LAST update row (max
# n_ops) equals the batch row_number pick. A final 'error' op is the
# tombstone: the key is dropped from the snapshot.
_CDC_STREAM_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_ops
  FROM events
)
SELECT user_id, event_id AS last_event_id, ts AS last_ts,
       event_type AS last_type, value AS last_value, n_ops
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def cdc_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState CDC apply: per key, latest-wins by the
    (ts, event_id) total order, 'error' as the tombstone type — the
    streaming MERGE INTO every CDC lakehouse feed runs (SURVEY.md §2.B T5
    shape, §2.C curation mechanics)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")

    def apply_cdc(key, pdfs, state: GroupState):
        if state.exists:
            n_ops, ts_us, eid, etype, val = state.get
        else:
            n_ops, ts_us, eid, etype, val = 0, -1, -1, "", 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_ops += len(pdf)
            ts_np = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            # python-int (unbounded) packing of the (ts, event_id) total
            # order — 10**12 headroom keeps event_id from colliding with ts
            order = (ts_np.astype(object) * 10**12) + pdf["event_id"].to_numpy()
            j = int(order.argmax())
            if int(order[j]) > ts_us * 10**12 + eid:
                ts_us = int(ts_np[j])
                eid = int(pdf["event_id"].iloc[j])
                etype = str(pdf["event_type"].iloc[j])
                val = float(pdf["value"].iloc[j])
        state.update((n_ops, ts_us, eid, etype, val))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_event_id": [eid],
                "last_ts_us": [ts_us],
                "last_type": [etype],
                "last_value": [val],
                "n_ops": [n_ops],
            }
        )

    return s.groupBy("user_id").applyInPandasWithState(
        apply_cdc,
        outputStructType=(
            "user_id long, last_event_id long, last_ts_us long, "
            "last_type string, last_value double, n_ops long"
        ),
        stateStructType=(
            "n_ops long, last_ts_us long, last_event_id long, "
            "last_type string, last_value double"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query("streaming_cdc_upsert", oracle=_CDC_STREAM_ORACLE)
def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_to_memory(
        cdc_upsert_stream(spark, sf_dir),
        f"cdc_upsert_{abs(hash(sf_dir)) % 10**6}",
        "update",
    )
    from pyspark.sql.window import Window

    # last update row per key = the final state (n_ops is monotone)
    w = F.row_number().over(Window.partitionBy("user_id").orderBy(F.desc("n_ops")))
    return (
        out.withColumn("rn", w)
        .filter((F.col("rn") == 1) & (F.col("last_type") != "error"))
        .select(
            "user_id",
            "last_event_id",
            F.timestamp_micros(F.col("last_ts_us")).cast("timestamp_ntz").alias("last_ts"),
            "last_type",
            "last_value",
            "n_ops",
        )
        .orderBy("user_id")
    )


# --- A+B x streaming: per-geo-cell stateful perceptual dedup -------------------

# The image corpus's metadata (id, phash, geo cell) streams in TWO
# micro-batches — the base corpus first, the planted duplicate uploads
# second — so the dedup state built in batch 1 must survive into batch 2
# for any duplicate to be caught: a REAL cross-batch state exercise, not a
# single-pass simulation. Keyed by 4-degree geo cell (co-location is the
# blocking key, exactly like the batch twin image_geo_phash_dedup); state
# per cell = the first-seen (phash -> seq, id) registry.
_N_STREAM_IMG = 400   # = operators.image_queries.N_PHASH_IMAGES (shared corpus SQL)
_N_STREAM_DUP = 50    # = operators.image_queries.N_DUP_IMAGES
_STREAM_CELL = 4000   # 4-degree cells in milli-degrees


def _stage_image_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Two ordered parquet files (base corpus, then duplicate uploads) in a
    per-(sf,pid) temp dir. Bounded driver materialization: ~450 metadata
    rows (id, phash, cell) — pixels never leave the executors."""
    from etf_topox_spark.sources.images import GEO_KX, GEO_KY, GEO_M, synthetic_images

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(tempfile.gettempdir(), f"etfx_imgstream_{tag}_{os.getpid()}")
    if os.path.isdir(d) and len(os.listdir(d)) == 2:
        return d
    os.makedirs(d, exist_ok=True)
    i0 = F.substring("image_id", -12, 12).cast("long")
    meta = (
        synthetic_images(spark, _N_STREAM_IMG)
        .select(
            "image_id",
            "phash",
            i0.alias("i"),
            (((i0 * GEO_KX) % GEO_M) / _STREAM_CELL).cast("long").alias("cell_x"),
            (((i0 * GEO_KY) % GEO_M) / _STREAM_CELL).cast("long").alias("cell_y"),
        )
        .toPandas()
        .sort_values("i")
    )
    base = meta.assign(seq=meta["i"]).drop(columns=["i"])
    dups = meta[meta["i"] < _N_STREAM_DUP].copy()
    dups["seq"] = _N_STREAM_IMG + dups["i"]
    dups["image_id"] = "dup_" + dups["image_id"]
    dups = dups.drop(columns=["i"])
    base.to_parquet(os.path.join(d, "0_base.parquet"), index=False)
    dups.to_parquet(os.path.join(d, "1_dups.parquet"), index=False)
    return d


# batch twin: a duplicate is any image with an EARLIER (smaller seq) image
# of identical phash in the same cell; its origin is the first such image.
# The corpus CTE is shared with the batch geo-dedup query (pixel formulas
# replayed symbolically), so this oracle re-derives phashes from scratch.
def _image_stream_dedup_oracle() -> str:
    from etf_topox_spark.operators.image_queries import _PHASH_CORPUS_SQL

    return f"""
WITH {_PHASH_CORPUS_SQL},
stream AS (
  SELECT image_id, phash,
         CAST(substr(image_id, length(image_id) - 11, 12) AS BIGINT) AS i0,
         CASE WHEN image_id LIKE 'dup_%'
              THEN {_N_STREAM_IMG} + CAST(substr(image_id, length(image_id) - 11, 12) AS BIGINT)
              ELSE CAST(substr(image_id, length(image_id) - 11, 12) AS BIGINT) END AS seq
  FROM corpus
),
cells AS (
  SELECT image_id, phash, seq,
         ((i0 * 9241) % 20000) // {_STREAM_CELL} AS cell_x,
         ((i0 * 5437) % 20000) // {_STREAM_CELL} AS cell_y
  FROM stream
),
marked AS (
  SELECT *,
         MIN(seq) OVER (PARTITION BY cell_x, cell_y, phash) AS first_seq,
         FIRST_VALUE(image_id) OVER (
           PARTITION BY cell_x, cell_y, phash ORDER BY seq
         ) AS orig_id
  FROM cells
)
SELECT image_id AS dup_id, orig_id, cell_x, cell_y
FROM marked WHERE seq > first_seq
ORDER BY dup_id
"""


@query("streaming_image_geo_dedup", oracle=_image_stream_dedup_oracle())
def streaming_image_geo_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming re-upload detection: image metadata events stream in two
    micro-batches (base corpus, then duplicate uploads); per-geo-cell
    applyInPandasWithState keeps the first-seen phash registry and emits a
    (dup, origin) alert the moment a same-cell exact-phash repeat arrives.
    The planted uploads of batch 2 are only caught because batch 1's state
    survived the micro-batch boundary (maxFilesPerTrigger=1 forces the
    split) — the T5 arbitrary-state kernel fused with the A+B geo-blocked
    dedup shape.

    Scale shape: state per cell is the (phash, seq, id) registry of
    first-seens — bounded by distinct content per cell, never raw bytes;
    the stream carries 28 B/row of metadata. Cross-batch determinism:
    rows are processed in seq order inside each group call, and the file
    source's lexicographic staging fixes batch order."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    s = (
        spark.readStream.schema(
            "image_id string, phash long, cell_x long, cell_y long, seq long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(_stage_image_stream_dir(spark, sf_dir))
    )

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            phashes, seqs, ids = state.get
            reg = {p: (sq, d) for p, sq, d in zip(phashes, seqs, ids)}
        else:
            reg = {}
        out = []
        for pdf in pdfs:
            for r in pdf.sort_values("seq").itertuples():
                hit = reg.get(r.phash)
                if hit is None:
                    reg[r.phash] = (r.seq, r.image_id)
                else:
                    out.append((r.image_id, hit[1], key[0], key[1]))
        items = sorted(reg.items(), key=lambda kv: kv[1][0])
        state.update((
            [p for p, _ in items],
            [sq for _, (sq, _) in items],
            [d for _, (_, d) in items],
        ))
        yield pd.DataFrame(
            out, columns=["dup_id", "orig_id", "cell_x", "cell_y"]
        )

    alerts = s.groupBy("cell_x", "cell_y").applyInPandasWithState(
        dedup,
        outputStructType="dup_id string, orig_id string, cell_x long, cell_y long",
        stateStructType="phashes array<long>, seqs array<long>, ids array<string>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(
        alerts, f"imgdedup_replay_{abs(hash(sf_dir)) % 10**6}", "update"
    )
    return out.orderBy("dup_id")
