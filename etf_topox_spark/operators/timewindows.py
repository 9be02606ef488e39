"""Batch analogs of the streaming window operators (SURVEY.md §2.B T2/T3).

The streaming forms live in etf_topox_spark.streaming; these batch twins are
what the DuckDB oracle can check — the pytest suite additionally asserts
stream-vs-batch equivalence on replay (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etf_topox_spark.operators.relational import _dsum_sql, dsum
from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T


# --- T2: tumbling windows (15-minute buckets, epoch-aligned) -----------------

@query(
    "window_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# --- T2b: sliding windows (30-minute window sliding by 15) -------------------

@query(
    "window_sliding",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(CAST(s.off AS BIGINT))
               AS window_start,
             event_id
      FROM events, (SELECT unnest([0, 15]) AS off) s
    )
    SELECT window_start, COUNT(*) AS n_events
    FROM slid GROUP BY window_start ORDER BY window_start
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


# --- T3: session windows (gap > 30 min starts a new session).
# Batch form = the classic lag/gap/cumsum decomposition, identical SQL on
# both sides; the streaming form uses F.session_window (streaming module).

_SESSION_SQL = """
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked)
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""


@query("sessionize", oracle=_SESSION_SQL)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: interval arithmetic is timezone-free and exact to
    # the microsecond, unlike unix_* (needs TIMESTAMP) or second-truncation
    prev_ts = F.lag("ts").over(w)
    is_start = (
        prev_ts.isNull()
        | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES"))
    ).cast("long")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        e.select("user_id", "ts", "event_id", is_start.alias("is_start"))
        .withColumn("session_id", F.sum("is_start").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


# --- T2c: gap-fill / resample with forward fill --------------------------------

@query(
    "timeseries_gapfill",
    oracle=f"""
    WITH b AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             {_dsum_sql('value')} AS sum_value,
             COUNT(*) AS n_events
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    span AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
    grid AS (
      SELECT u.user_id, g.bucket
      FROM (SELECT DISTINCT user_id FROM b) u,
           (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
            FROM span) g
    ),
    j AS (
      SELECT grid.user_id, grid.bucket, b.sum_value, b.n_events
      FROM grid LEFT JOIN b USING (user_id, bucket)
    )
    SELECT user_id, bucket,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(sum_value,
                    LAST_VALUE(sum_value IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    0.0) AS filled_value,
           n_events IS NULL AS is_gap
    FROM j
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's click stream to a dense 1-hour grid and
    forward-fill gaps — the sensor/metrics regularization op (and the
    shape a feature-extraction pipeline uses before windowed training).

    Scale shape: the raw table reduces FIRST (per-(user, bucket) partial
    agg — the only input-sized exchange); the dense grid is generated from
    the reduced table's span via sequence() (never a row per raw event),
    and the fill is a per-user window over the reduced grid. Grid size =
    users × buckets, independent of event count."""
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    b = e.groupBy(
        "user_id", F.window("ts", "1 hour").start.alias("bucket")
    ).agg(dsum(F.col("value")).alias("sum_value"), F.count(F.lit(1)).alias("n_events"))
    span = b.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = (
        b.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    j = grid.join(b, ["user_id", "bucket"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce(
            "sum_value", F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


# --- retention cohort matrix ---------------------------------------------------

_RETENTION_SQL = """
WITH firstw AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id),
act AS (
  SELECT DISTINCT e.user_id, f.cohort_week, date_trunc('week', e.ts) AS week
  FROM events e JOIN firstw f ON e.user_id = f.user_id),
mat AS (
  SELECT cohort_week,
         date_diff('day', cohort_week, week) // 7 AS week_idx,
         COUNT(*) AS n_users
  FROM act GROUP BY 1, 2)
SELECT m.cohort_week, m.week_idx, m.n_users,
       CAST(m.n_users AS DOUBLE) / c.n_users AS retention
FROM mat m JOIN mat c
  ON c.cohort_week = m.cohort_week AND c.week_idx = 0
ORDER BY m.cohort_week, m.week_idx
"""


@query("event_retention_cohorts", oracle=_RETENTION_SQL)
def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-activity week,
    counted as retained in each later week they act in. Every exchange
    keys on user_id until the final tiny (cohort, week) rollup — the
    sessionize/funnel partitioning reused; the week-0 denominator joins
    back on the already-small matrix (broadcast). date_trunc('week') is
    Monday-anchored in both engines and NTZ-safe (no epoch math)."""
    ev = T(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = (
        ev.join(firstw, "user_id")
        .select(
            "user_id", "cohort_week", F.date_trunc("week", "ts").alias("week")
        )
        .distinct()
    )
    mat = act.groupBy(
        "cohort_week",
        F.expr("datediff(week, cohort_week) div 7").alias("week_idx"),
    ).agg(F.count(F.lit(1)).alias("n_users"))
    base = (
        mat.where(F.col("week_idx") == 0)
        .select("cohort_week", F.col("n_users").alias("base_users"))
    )
    return (
        mat.join(F.broadcast(base), "cohort_week")
        .select(
            "cohort_week",
            "week_idx",
            "n_users",
            (F.col("n_users").cast("double") / F.col("base_users")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_idx")
    )


# --- first-order Markov transition matrix over event sequences ----------------

_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT prev_type, SUM(n) AS row_n FROM trans GROUP BY 1)
SELECT t.prev_type, t.next_type, t.n,
       CAST(t.n AS DOUBLE) / tot.row_n AS p
FROM trans t JOIN tot USING (prev_type)
ORDER BY prev_type, next_type
"""


@query("events_markov_transitions", oracle=_MARKOV_SQL)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    — the behavioral-model fit every clickstream pipeline runs: LAG within
    the (user_id) window pairs consecutive events ((ts, event_id) total
    order makes ties deterministic), then one tiny (prev, next) count
    matrix with row-normalized probabilities as a single exact int/int
    division. Scale shape: the lag window shares the user_id exchange the
    sessionize/funnel family already uses; the transition matrix is
    #types² rows whatever the event volume, and its normalizer joins back
    broadcast."""
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.col("row_n")).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


# --- interval-union coverage (islands & gaps) ---------------------------------

_COVER_DAYS = 30  # each order opens a 30-day activity window

_INTERVAL_COVER_SQL = f"""
WITH iv AS (
  SELECT o_custkey,
         datediff('day', DATE '1992-01-01', o_orderdate) AS s,
         datediff('day', DATE '1992-01-01', o_orderdate) + {_COVER_DAYS} AS e
  FROM orders
),
marked AS (
  SELECT o_custkey, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY o_custkey ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
isl AS (
  SELECT o_custkey, s, e,
         SUM(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island_id
  FROM marked
),
per_island AS (
  SELECT o_custkey, island_id, MAX(e) - MIN(s) AS len
  FROM isl GROUP BY 1, 2
)
SELECT o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(len) AS BIGINT) AS covered_days
FROM per_island GROUP BY 1 ORDER BY 1
"""


@query("orders_interval_coverage", oracle=_INTERVAL_COVER_SQL)
def orders_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union length per key — the islands-and-gaps pattern every
    warehouse runs for activity coverage / SLA uptime / sensor-online
    time: each order opens a {_COVER_DAYS}-day window, overlapping windows
    merge, and the answer is the number of merged islands and their total
    covered days. One running-max window marks island starts (an interval
    begins a new island iff its start clears every earlier end), a running
    sum numbers them, and a per-island MAX(e)−MIN(s) aggregate measures
    them — all integer day arithmetic from a fixed epoch, all windows
    partitioned on the customer key (the user_id-family exchange,
    reused), no global stage anywhere."""
    o = T(spark, sf_dir, "orders")
    s = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    iv = o.select("o_custkey", s.alias("s"), (s + _COVER_DAYS).alias("e"))
    w = W.partitionBy("o_custkey").orderBy("s", "e")
    wprev = w.rowsBetween(W.unboundedPreceding, -1)
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    marked = iv.select(
        "o_custkey",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)), 1
        ).otherwise(0).alias("new_island"),
    )
    isl = marked.select(
        "o_custkey", "s", "e", F.sum("new_island").over(wcum).alias("island_id")
    )
    per_island = isl.groupBy("o_custkey", "island_id").agg(
        (F.max("e") - F.min("s")).alias("len")
    )
    return (
        per_island.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("len").alias("covered_days"),
        )
        .orderBy("custkey")
    )


# --- CUSUM changepoint detection per event type -------------------------------

_CUSUM_SQL = """
WITH ev AS (
  SELECT event_type, ts, event_id,
         CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vi
  FROM events
),
st AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(vi) AS BIGINT) AS s
       FROM ev GROUP BY 1),
d AS (SELECT e.event_type, e.ts, e.event_id, st.n * e.vi - st.s AS dv
      FROM ev e JOIN st USING (event_type)),
c1 AS (
  SELECT event_type, ts, event_id,
         SUM(dv) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d
),
c2 AS (
  SELECT event_type, ts,
         cum - LEAST(CAST(0 AS BIGINT),
                     MIN(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS cusum
  FROM c1
),
r AS (
  SELECT event_type, ts, cusum,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cusum DESC, ts) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_events
  FROM c2
)
SELECT event_type, n_events, cusum AS max_cusum, ts AS ts_changepoint
FROM r WHERE rn = 1 ORDER BY event_type
"""


@query("events_cusum_changepoint", oracle=_CUSUM_SQL)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection per event type — the classic
    sequential drift monitor, made window-expressible by the prefix
    identity s_i = max(0, s_{i-1} + d_i) = cum_i − min(0, min_{j≤i} cum_j):
    no sequential recurrence, just two cumulative windows. The argmax of
    the CUSUM path is the standard changepoint location estimate. All
    arithmetic is exact int64: values floor-scale to micro-units, and the
    deviation from the per-type mean uses the N·v − S integer form (the
    Moran's-I trick), so both engines agree bit-for-bit with no float
    summation anywhere.

    Scale shape: one per-type stats aggregate (broadcast back), then
    windows partitioned on event_type ordered by event time — the same
    per-key time-ordered exchange every sessionizer needs; at 10^12 events
    the partition key spreads over (type, day) buckets with a carry-in
    merge, the documented scale-out of all cumulative windows here."""
    ev = T(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000000.0).alias("vi"),
    )
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vi").alias("s")
    )
    d = ev.join(F.broadcast(st), "event_type").select(
        "event_type", "ts", "event_id",
        (F.col("n") * F.col("vi") - F.col("s")).alias("dv"),
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # event_id rides through c1 so the running-min frame below shares the
    # SAME total order (ts, event_id) as the cum window — with ts-only
    # ordering, duplicate (event_type, ts) rows would make the ROWS-frame
    # prefix-min nondeterministic on both engines (ADVICE r3).
    c1 = d.select(
        "event_type", "ts", "event_id", F.sum("dv").over(wcum).alias("cum")
    )
    wmin = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c2 = c1.select(
        "event_type",
        "ts",
        (
            F.col("cum")
            - F.least(F.lit(0).cast("long"), F.min("cum").over(wmin))
        ).alias("cusum"),
    )
    wrank = W.partitionBy("event_type").orderBy(F.col("cusum").desc(), "ts")
    wall = W.partitionBy("event_type")
    r = c2.select(
        "event_type",
        "ts",
        "cusum",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_events"),
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_events",
            F.col("cusum").alias("max_cusum"),
            F.col("ts").alias("ts_changepoint"),
        )
        .orderBy("event_type")
    )
