"""Window functions, sorts/limits/top-k, and set operations
(SURVEY.md §2.B W1-W3, O1-O3, U1-U2).

W2 (lag/lead) is the primitive behind the reference's CCW edge chaining
around nodes (SURVEY.md §2.A R7); O3's window-top-k is the kNN core (J11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from pyspark.sql.window import Window as W

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T


# --- W1: ranking ------------------------------------------------------------

@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rk,
             DENSE_RANK() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS drk,
             NTILE(4) OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer) t
    WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    # tie-break on the unique key so ranks are deterministic across engines
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- W2: lag/lead ------------------------------------------------------------

@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           value - COALESCE(LAG(value) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id), 0.0) AS delta
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias("delta"),
    )


# --- W3: running frame — decimal-exact running sum so both engines agree ----

@query(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DecimalType(30, 6)))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# --- O1/O2: global sort + limit ----------------------------------------------

@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    # global orderBy = range-partitioned exchange; limit pushes a partial
    # TakeOrdered into each partition before the final merge
    return o.select("o_orderkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(50)


# --- O3: per-group top-k — window, never a global sort ------------------------

@query(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) t
    WHERE rn <= 2
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# --- U1: union all / by-name ---------------------------------------------------

@query(
    "set_union_all",
    oracle="""
    SELECT event_id, 'click' AS kind FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, 'view' AS kind FROM events WHERE event_type = 'view'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", F.lit("click").alias("kind")
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.lit("view").alias("kind"), "event_id"
    )
    return clicks.unionByName(views)  # by-name: column order differs on purpose


# --- U2: intersect / except -----------------------------------------------------

@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ordered = o.select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(ordered)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.select("c_custkey").exceptAll(o.select(F.col("o_custkey").alias("c_custkey"))).distinct()


# --- W-extra: RANGE window frame (value-based, not row-based) -----------------

@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
             AS n_similar_spend
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per order, how many of the customer's
    orders land within ±10k of its price — the 'peer band' window shape
    (row frames can't express it). One partition-local sort per custkey."""
    o = T(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_spend"),
    )


# --- A-extra: median / mode (deterministic tie rule) --------------------------

@query(
    "agg_median_mode",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS med_qty,
           (SELECT MIN(q) FROM (
              SELECT l2.l_quantity AS q, COUNT(*) AS c
              FROM lineitem l2 WHERE l2.l_returnflag = l.l_returnflag
              GROUP BY 1
              QUALIFY c = MAX(c) OVER ()
            )) AS mode_qty
    FROM lineitem l GROUP BY l_returnflag
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + smallest-value mode per group. Mode is re-derived
    from the (group, value) count table with an explicit min-of-argmax tie
    rule — engine built-ins disagree on ties, a closed rule doesn't."""
    li = T(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(F.median("l_quantity").alias("med_qty"))
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("l_returnflag")
    mode = (
        counts.withColumn("cmax", F.max("c").over(w))
        .filter(F.col("c") == F.col("cmax"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("mode_qty"))
    )
    return med.join(mode, "l_returnflag")


# --- skyline (Pareto front) --------------------------------------------------

_SKYLINE_SQL = """
WITH p AS (SELECT p_partkey, p_retailprice, p_size FROM part)
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
)
ORDER BY a.p_partkey
"""


def _skyline_2d(pdf):
    """Local 2-D skyline: sort by (price asc, size asc), keep a row iff its
    size is strictly below every strictly-cheaper row's running-min size
    AND below the min size of its own price tier's better rows — i.e. the
    standard sorted-scan cummin filter. Ties on BOTH dims are kept
    (neither dominates the other)."""
    import numpy as np

    price = pdf["p_retailprice"].to_numpy()
    size = pdf["p_size"].to_numpy()
    order = np.lexsort((size, price))
    p_s, s_s = price[order], size[order]
    # running min of size over STRICTLY cheaper rows: shift the cummin to
    # the start of each price tier
    cm = np.minimum.accumulate(s_s)
    tier_start = np.r_[True, p_s[1:] != p_s[:-1]]
    start_idx = np.maximum.accumulate(np.where(tier_start, np.arange(len(p_s)), 0))
    prev_min = np.where(
        start_idx > 0, cm[np.maximum(start_idx - 1, 0)], np.iinfo(np.int64).max
    )
    # survivors: the row must be its own price tier's min size (a same-
    # price smaller size dominates, strict in size) AND strictly below
    # every cheaper tier's min (a cheaper row with size <= s dominates,
    # strict in price). Equal (price, size) duplicates all satisfy both.
    tier_min = s_s[start_idx]
    keep_sorted = (s_s == tier_min) & (s_s < prev_min)
    keep = np.zeros(len(pdf), bool)
    keep[order] = keep_sorted
    return pdf[keep]


@query("part_skyline", oracle=_SKYLINE_SQL)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto front over (p_retailprice ↓-better, p_size
    ↓-better): parts no other part dominates (≤ on both dims, < on at
    least one; exact duplicates on both dims all survive — neither
    dominates). The classic database operator, built on the same
    partial-merge identity as the convex hull: skyline(S₁∪S₂) =
    skyline(skyline(S₁) ∪ skyline(S₂)), so stage 1 collapses each
    partition to its local front with one sorted cummin scan (Arrow
    kernel, map-side), and stage 2 re-runs the same kernel on the tiny
    union of fronts (expected O(log n) points for independent dims) in
    one task — input-sized data never converges on a single node, only
    fronts do. The naive NOT-EXISTS self-join the ORACLE runs is O(n²)
    and exchange-heavy; the engine's form is one scan + one
    front-sized exchange."""
    cols = ["p_partkey", "p_retailprice", "p_size"]
    p = T(spark, sf_dir, "part").select(*cols)
    schema = "p_partkey long, p_retailprice double, p_size int"

    def local_front(batches):
        import pandas as pd

        chunks = [b for b in batches if len(b)]
        if chunks:
            yield _skyline_2d(
                pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            )

    fronts = p.mapInPandas(local_front, schema)
    merged = fronts.coalesce(1).mapInPandas(local_front, schema)
    return merged.orderBy("p_partkey")


# --- W1b: distribution window functions (ntile / percent_rank / cume_dist) ---

_DISTRIBUTION_SQL = """
    SELECT c_custkey, c_nationkey, c_acctbal,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, c_acctbal, c_custkey
"""


@query("window_distribution", oracle=_DISTRIBUTION_SQL)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window family (W1's remaining members): NTILE
    equi-height bucketing, PERCENT_RANK, CUME_DIST over a deterministic
    total order. Both ratios are single IEEE divisions of exact integers
    ((rank-1)/(n-1), n_leq/n), so the doubles are bit-identical across
    engines with no rounding shim.

    Scale shape: one hash exchange on the partition key, one sort within —
    identical to window_rank; NTILE at 10^12 rows wants the partition key
    to bound group size (it does here: customers per nation)."""
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        T(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_nationkey", "c_acctbal", "c_custkey")
    )
