"""Change-data-capture surface: SCD type-2 dimension builds and
latest-wins upsert snapshots (SURVEY.md §2.C curation mechanics — the
ingestion layer every warehouse/lakehouse feed runs before analytics).

Both operators are pure window algebra (lag/lead + row_number) — single
hash exchange on the entity key, no driver state — and both carry full
DuckDB oracles replaying the identical total order.

Reference parity: the reference engine's ingest path upserts features by
id before validation ([ref-pub LOW] — snapshot empty, recalled API shape
only); these queries generalize that to the standard CDC contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

# --------------------------------------------------------------------------
# SCD type-2: collapse a change log into versioned validity intervals
# --------------------------------------------------------------------------

# orders as the change log: per customer, the sequence of order priorities
# ordered by (o_orderdate, o_orderkey) is a stream of attribute
# observations; consecutive equal values collapse into one version
# (the SCD2 no-op-change rule), valid_from = first observation of the run,
# valid_to = start of the next run (NULL while current).

_SCD2_SQL = """
WITH log AS (
  SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS seq,
         o_orderpriority AS attr
  FROM orders
),
marked AS (
  SELECT custkey, ts, seq, attr,
         CASE WHEN LAG(attr) OVER w IS DISTINCT FROM attr THEN 1 ELSE 0 END
           AS is_change
  FROM log WINDOW w AS (PARTITION BY custkey ORDER BY ts, seq)
),
runs AS (
  SELECT custkey, ts, seq, attr,
         SUM(is_change) OVER (PARTITION BY custkey ORDER BY ts, seq
                              ROWS UNBOUNDED PRECEDING) AS version
  FROM marked
),
versions AS (
  SELECT custkey, CAST(version AS BIGINT) AS version, attr,
         MIN(ts) AS valid_from, COUNT(*) AS n_observations
  FROM runs GROUP BY custkey, version, attr
)
SELECT custkey, version, attr, valid_from,
       LEAD(valid_from) OVER (PARTITION BY custkey ORDER BY version)
         AS valid_to,
       CAST(LEAD(valid_from) OVER (PARTITION BY custkey ORDER BY version)
              IS NULL AS BOOLEAN) AS is_current,
       n_observations
FROM versions
ORDER BY custkey, version
"""


@query("scd2_dimension_build", oracle=_SCD2_SQL)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from a change log: per customer, runs of
    equal o_orderpriority (totally ordered by (o_orderdate, o_orderkey))
    collapse into versions with [valid_from, valid_to) validity and an
    is_current flag — the standard island-detection build (lag-change flag
    → prefix-sum version number → per-version aggregate → lead validity).

    Scale shape: ONE hash exchange on custkey; all three windows and the
    version aggregate share that partitioning (Catalyst keeps them in one
    sort within the exchange). At 10^9 keys the per-key history is tiny,
    so no skew handling is needed; a hot entity would ride the existing
    salted-window pattern (operators/windows_sets.py)."""
    log = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderpriority").alias("attr"),
    )
    w = Window.partitionBy("custkey").orderBy("ts", "seq")
    marked = log.withColumn(
        "is_change",
        F.when(
            ~F.lag("attr").over(w).eqNullSafe(F.col("attr")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    runs = marked.withColumn(
        "version",
        F.sum("is_change").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    versions = runs.groupBy("custkey", "version", "attr").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    wv = Window.partitionBy("custkey").orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return versions.select(
        "custkey",
        "version",
        "attr",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_observations",
    ).orderBy("custkey", "version")


# --------------------------------------------------------------------------
# CDC latest-wins upsert snapshot (batch twin of streaming_cdc_upsert)
# --------------------------------------------------------------------------

# events as the CDC stream: per user, the latest event by (ts, event_id)
# wins; a latest 'error' op acts as the tombstone (delete) — the user is
# absent from the snapshot.

_CDC_SNAPSHOT_SQL = """
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


@query("cdc_upsert_snapshot", oracle=_CDC_SNAPSHOT_SQL)
def cdc_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins snapshot: per key, keep only the newest operation
    by the (ts, event_id) total order; keys whose newest op is the
    tombstone type drop out. This is the MERGE INTO / compaction semantics
    of every CDC lakehouse feed, as one row_number window.

    Scale shape: ONE hash exchange on the key. At 10^12 change rows the
    production variant pre-reduces map-side with max_by(struct(ts, id))
    partial aggregation instead of the full sort window — same result,
    shuffle carries one row per key per map partition; kept as the window
    form here because the oracle contract wants the identical total
    order spelled out."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    e = T(spark, sf_dir, "events")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            "n_ops",
        )
        .orderBy("user_id")
    )
