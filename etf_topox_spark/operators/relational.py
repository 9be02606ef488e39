"""Relational operator sweep (SURVEY.md §2.B: P1-P3, J1-J9, J14, A1-A7,
W1-W3, O1-O3, U1-U2, F1-F7, T2-T3 batch analogs).

Every query here is pure DataFrame code — no Python UDFs — so Catalyst gets
the whole plan: predicate pushdown, column pruning, broadcast selection,
partial aggregation and AQE all apply (SURVEY.md §4.2). Each query carries
its DuckDB oracle inline.

Float determinism contract (registry docstring): aggregates over doubles are
computed as exact DECIMAL(30,6) sums cast back to double on BOTH sides, so
the driver's value-hash matches bit-for-bit. Per-row double arithmetic uses
identical expression trees on both sides (IEEE ops are deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from pyspark.sql.window import Window as W

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T


def dsum(c: Column) -> Column:
    """Exact sum of a double expression: cast each term to DECIMAL(30,6)
    (deterministic round of an IEEE double), sum exactly, return double."""
    return F.sum(c.cast(DecimalType(30, 6))).cast("double")


def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (A1 + P2 + O1)
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc * (F.lit(1) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# P1/P2: projection + predicate filter (pushdown-verified in tests)
# --------------------------------------------------------------------------

@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 + l_tax) AS gross_price
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 15
      AND l_returnflag IN ('A', 'N')
      AND l_discount < 0.05
      AND l_shipdate IS NOT NULL
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 15)
        & F.col("l_returnflag").isin("A", "N")
        & (F.col("l_discount") < 0.05)
        & F.col("l_shipdate").isNotNull()
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) + F.col("l_tax"))).alias("gross_price"),
    )


# --------------------------------------------------------------------------
# P3: conditional expressions (CASE / coalesce / nullif / greatest)
# --------------------------------------------------------------------------

@query(
    "conditional_expr",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           GREATEST(o_totalprice, 100000.0) AS floor_price
    FROM orders
    """,
)
def conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "high")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floor_price"),
    )


# --------------------------------------------------------------------------
# J1: broadcast hash join over the dim chain (customer→nation→region)
# --------------------------------------------------------------------------

@query(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers, {_dsum_sql('c.c_acctbal')} AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    # dims are tiny at every sf: broadcast both so the fact side never shuffles
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
        .orderBy("region_name", "nation_name")
    )


# --------------------------------------------------------------------------
# J2: shuffle (sort-merge) fact-fact equi join
# --------------------------------------------------------------------------

@query(
    "join_fact_fact",
    oracle=f"""
    SELECT o.o_orderstatus,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# J3: outer join (customers with zero orders kept)
# --------------------------------------------------------------------------

@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# J4: left semi / left anti — the anti-join is the checkpoint-resume
# primitive (BASELINE.json:14 "resumable"; see plans.lineage)
# --------------------------------------------------------------------------

@query(
    "join_semi",
    oracle="""
    SELECT p.p_partkey, p.p_brand
    FROM part p WHERE EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_brand")


@query(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


# --------------------------------------------------------------------------
# J5: theta join — equi prefilter on the coarse key + residual predicate
# --------------------------------------------------------------------------

@query(
    "join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    c = T(spark, sf_dir, "customer")
    # equi component drives the hash join; residual evaluated post-match —
    # never a cross join (SURVEY.md §2.B J5)
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    ).select("s_suppkey", "c_custkey")


# --------------------------------------------------------------------------
# J6: cross join (tiny legs only)
# --------------------------------------------------------------------------

@query(
    "join_cross_tiny",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b WHERE a.r_regionkey < b.r_regionkey
    """,
)
def join_cross_tiny(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = T(spark, sf_dir, "region")
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))
    )


# --------------------------------------------------------------------------
# J7: range join — bucket both sides, equi-join on bucket, residual filter.
# The naive form is a theta join (the oracle); the engine form stays
# O(rows × buckets-overlapped) and shuffles on the bucket key only.
# --------------------------------------------------------------------------

_RANGE_BUCKETS_SQL = """
    SELECT r AS bucket_id, r * 20.0 AS lo, r * 20.0 + 40.0 AS hi
    FROM range(0, 10) t(r)
"""


@query(
    "join_range",
    oracle=f"""
    SELECT e.event_id, b.bucket_id
    FROM events e JOIN ({_RANGE_BUCKETS_SQL}) b
      ON e.value >= b.lo AND e.value < b.hi
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    buckets = spark.range(0, 10).select(
        F.col("id").alias("bucket_id"),
        (F.col("id") * 20.0).alias("lo"),
        (F.col("id") * 20.0 + 40.0).alias("hi"),
    )
    width = 20.0  # bucket stride; each interval spans ceil(40/20)=2 strides
    # explode each interval over the strides it covers, equi-join on stride
    bux = buckets.select(
        "bucket_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / width).cast("long"),
                F.floor((F.col("hi") - 1e-9) / width).cast("long"),
            )
        ).alias("stride"),
    )
    ex = e.select("event_id", "value", F.floor(F.col("value") / width).cast("long").alias("stride"))
    return (
        ex.join(F.broadcast(bux), "stride")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .select("event_id", "bucket_id")
    )


# --------------------------------------------------------------------------
# J8: interval-overlap join (same bucketing scheme, symmetric residual)
# --------------------------------------------------------------------------

_SPAN_SQL = """
    SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
    FROM events GROUP BY event_type
"""


@query(
    "join_interval_overlap",
    oracle=f"""
    SELECT s.event_type, b.bucket_id
    FROM ({_SPAN_SQL}) s JOIN ({_RANGE_BUCKETS_SQL}) b
      ON s.lo <= b.hi AND b.lo <= s.hi
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    spans = e.groupBy("event_type").agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    buckets = spark.range(0, 10).select(
        F.col("id").alias("bucket_id"),
        (F.col("id") * 20.0).alias("lo"),
        (F.col("id") * 20.0 + 40.0).alias("hi"),
    )
    width = 50.0
    def strides(df: DataFrame, keep: list) -> DataFrame:
        return df.select(
            *keep,
            F.col("lo").alias("_lo"),
            F.col("hi").alias("_hi"),
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / width).cast("long"),
                    F.floor(F.col("hi") / width).cast("long"),
                )
            ).alias("stride"),
        )

    sx = strides(spans, ["event_type"])
    bx = strides(buckets, ["bucket_id"]).withColumnsRenamed({"_lo": "b_lo", "_hi": "b_hi"})
    return (
        sx.join(F.broadcast(bx), "stride")
        .filter((F.col("_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("_hi")))
        .select("event_type", "bucket_id")
        .distinct()  # an overlapping pair can meet in several strides
    )


# --------------------------------------------------------------------------
# J9: as-of join — latest signup at-or-before each click, per user.
# Engine form: union-tag both sides + one window pass (a single shuffle on
# user_id; never a per-probe subquery). Oracle: DuckDB native ASOF JOIN.
# --------------------------------------------------------------------------

@query(
    "join_asof",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON c.user_id = s.user_id AND c.ts >= s.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    tagged = clicks.withColumn("signup_ts", F.lit(None).cast("timestamp")).unionByName(
        signups.withColumn("click_id", F.lit(None).cast("long")).withColumn(
            "click_ts", F.lit(None).cast("timestamp")
        )
    )
    # order by event time; signup rows sort before a click at the same ts
    # (is_probe=1 for clicks) to honor ts >= signup_ts inclusivity
    ts = F.coalesce(F.col("click_ts"), F.col("signup_ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(ts.asc(), F.col("click_id").isNotNull().cast("int").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("signup_ts", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("click_id").isNotNull() & F.col("signup_ts").isNotNull())
        .select("click_id", "user_id", "click_ts", "signup_ts")
    )


# --------------------------------------------------------------------------
# J14: skew-defused join — explicit salting; result provably salt-invariant
# (oracle = the unsalted join). At 100 TB the hot key is a city-block cell
# with 10^6 edges; here the mechanics are identical on (l_suppkey).
# --------------------------------------------------------------------------

_SALT = 8


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT s.s_nationkey, {_dsum_sql('l.l_extendedprice')} AS sum_price,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey ORDER BY s.s_nationkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT))
    )
    s = T(spark, sf_dir, "supplier")
    # replicate the small side ×SALT so each (key, salt) shuffle partition
    # joins locally — the hot key's rows spread over SALT reducers
    s_rep = s.crossJoin(spark.range(_SALT).select(F.col("id").alias("salt")))
    return (
        li.join(s_rep, (li.l_suppkey == s_rep.s_suppkey) & (li.salt == s_rep.salt))
        .groupBy("s_nationkey")
        .agg(
            dsum(F.col("l_extendedprice")).alias("sum_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("s_nationkey")
    )


# --- SQL-string entry point (SURVEY.md §3.3) ---------------------------------
# The SAME ANSI text runs on Spark (via temp views) and DuckDB — no oracle
# twin that could drift.

from etf_topox_spark.sql import ANSI_NATION_BALANCES, register_views  # noqa: E402


@query("sql_entrypoint_nation_balances", oracle=ANSI_NATION_BALANCES)
def sql_entrypoint_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(ANSI_NATION_BALANCES)


# --------------------------------------------------------------------------
# J15: runtime bloom-filter join pruning (the scale path for selective joins)
# --------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 17  # 16 KiB bitset — broadcastable at any scale
BLOOM_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)
BLOOM_NATION = 3


def _bloom_positions(keys) -> "np.ndarray":
    """(n, k) bit positions via the splitmix64 finalizer over key^seed —
    pure uint64 numpy, identical on driver and executors."""
    import numpy as np

    x = keys.astype(np.uint64)[:, None] ^ np.array(BLOOM_SEEDS, np.uint64)[None, :]
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(BLOOM_M_BITS)).astype(np.int64)


def bloom_build(keys_df: DataFrame, col: str) -> "np.ndarray":
    """Distributed bloom build: executors emit each key's distinct bit
    positions (map-side, deduped per batch), ONE distinct() exchange of at
    most BLOOM_M_BITS ints reaches the driver, which packs the bitset.
    Never collects the keys themselves — the 100 TB build path."""
    import numpy as np
    import pandas as pd

    def pos_kernel(batches):
        for pdf in batches:
            p = _bloom_positions(pdf[col].to_numpy())
            yield pd.DataFrame({"pos": np.unique(p)})

    pos = (
        keys_df.select(col).mapInPandas(pos_kernel, "pos long").distinct().toPandas()
    )
    bits = np.zeros(BLOOM_M_BITS // 64, np.uint64)
    p = pos["pos"].to_numpy()
    np.bitwise_or.at(bits, p // 64, np.uint64(1) << (p % 64).astype(np.uint64))
    return bits


def bloom_prune(df: DataFrame, col: str, bits) -> DataFrame:
    """Map-side membership pre-filter: keep rows whose key hits all k bloom
    bits (no false negatives; false positives removed by the exact join
    that follows). Arrow-vectorized, zero shuffle."""
    import numpy as np

    bc = df.sparkSession.sparkContext.broadcast(bits)

    def kernel(batches):
        bs = bc.value
        for pdf in batches:
            p = _bloom_positions(pdf[col].to_numpy())
            hit = (bs[p // 64] >> (p % 64).astype(np.uint64)) & np.uint64(1)
            yield pdf[hit.all(axis=1)]

    return df.mapInPandas(kernel, df.schema)


@query(
    "join_bloom_pruned",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = {BLOOM_NATION}
    GROUP BY 1 ORDER BY 1
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-to-fact join accelerated by a runtime bloom filter —
    the engine-level twin of Spark's runtime row-group filters: the
    qualifying orderkey set (orders of one nation's customers, ~4% of
    rows) is summarized into a 16 KiB bitset, broadcast, and applied as a
    map-side prune on the lineitem scan BEFORE the join shuffle, so ~96%
    of the fact table never crosses the exchange. False positives are
    removed by the exact join that follows, so the result — and the
    oracle — is the plain three-way join."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey") == BLOOM_NATION)
    keys = o.join(
        F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey")
    bits = bloom_build(keys, "o_orderkey")
    pruned = bloom_prune(li.select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey", bits)
    return (
        pruned.join(keys, pruned.l_orderkey == keys.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("orderkey")
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling (training-data pipeline op)
# --------------------------------------------------------------------------

# per-stratum sampling rates in basis points of 10_000 (l_returnflag strata)
SAMPLE_RATES_BP = {"A": 200, "N": 500, "R": 300}

_SAMPLE_RATE_CASE = "CASE l_returnflag " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES_BP.items()
) + " ELSE 0 END"

_SAMPLE_STRATIFIED_SQL = f"""
WITH hashed AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
         ('0x' || substr(md5(l_orderkey || '|' || l_linenumber), 1, 15))::BIGINT
           % 10000 AS bucket
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_returnflag, bucket
FROM hashed WHERE bucket < {_SAMPLE_RATE_CASE}
ORDER BY l_orderkey, l_linenumber
"""


@query("sample_stratified", oracle=_SAMPLE_STRATIFIED_SQL)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling — the reproducible
    subsampling primitive of a training-data pipeline: every row maps to a
    uniform bucket via md5 of its stable key, and each stratum keeps rows
    under its own rate cutoff. Unlike rand()-based sampling the selection
    is a pure function of the data, so re-runs, retries, and the DuckDB
    oracle all agree row-for-row, and at 100 TB the operator is a
    stateless map-side filter (no seed coordination across executors)."""
    li = T(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    rate = F.coalesce(
        *[
            F.when(F.col("l_returnflag") == k, F.lit(v))
            for k, v in SAMPLE_RATES_BP.items()
        ],
        F.lit(0),
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- J-extra: correlated-existence patterns (EXISTS / NOT EXISTS) -------------

@query(
    "join_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice < 5000)
    """,
)
def join_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS via the SQL surface — Catalyst
    rewrites both to semi/anti hash joins (the plan a hand-built
    .join(..., 'semi') would give), so the subquery form costs nothing."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    c.createOrReplaceTempView("_ex_customer")
    o.createOrReplaceTempView("_ex_orders")
    return c.sparkSession.sql(
        """
        SELECT c_custkey, c_name
        FROM _ex_customer c
        WHERE EXISTS (SELECT 1 FROM _ex_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM _ex_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 5000)
        """
    )


# --------------------------------------------------------------------------
# TPC-H-Q3-style shipping priority (3-table join + agg + deterministic top-k)
# --------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT l_orderkey,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filter both fact sides BEFORE the joins (predicate
    pushdown reaches both scans), customer side broadcasts (dim-sized after
    the segment filter), revenue via the exact decimal-cast sum. The LIMIT
    carries a total tiebreak (revenue, o_orderdate, l_orderkey) so the
    top-k frontier is engine-independent even under revenue ties."""
    cutoff = F.to_timestamp_ntz(F.lit("1998-03-15 00:00:00"))
    c = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = T(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Market-basket pair mining (co-occurrence + lift)
# --------------------------------------------------------------------------

BASKET_MIN_SUP = 3

_BASKET_SQL = f"""
WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM it),
supp AS (SELECT l_partkey, COUNT(*) AS n_ord FROM it GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MIN_SUP})
SELECT p.part_a, p.part_b, p.n_pair, sa.n_ord AS n_a, sb.n_ord AS n_b,
       (CAST(p.n_pair AS DOUBLE) * n.n_orders) / (sa.n_ord * sb.n_ord) AS lift
FROM pairs p
JOIN supp sa ON sa.l_partkey = p.part_a
JOIN supp sb ON sb.l_partkey = p.part_b
CROSS JOIN n
ORDER BY part_a, part_b
"""


@query("orders_market_basket", oracle=_BASKET_SQL)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining: part pairs co-ordered in the same order, with
    support counts and lift = P(a,b)/(P(a)P(b)). The pair fan-out is the
    within-order self-join — bounded by basket size (≤ 13 parts/order in
    this corpus, ≤ 10² in any retail corpus), so pairs ≈ k²/2 × #orders,
    never #parts². Part supports (|parts| rows) broadcast back onto the
    pair aggregate; the one-row order count broadcasts too. lift keeps a
    single double division (exact-int operands) so engines agree
    bit-for-bit."""
    it = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    b = it.select(
        F.col("l_orderkey").alias("bo"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        it.join(b, (it.l_orderkey == b.bo) & (it.l_partkey < b.part_b))
        .groupBy(F.col("l_partkey").alias("part_a"), "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= BASKET_MIN_SUP)
    )
    supp = it.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    n = it.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("n_a"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "n_pair", "n_a", "n_b",
            (
                (F.col("n_pair").cast("double") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy("part_a", "part_b")
    )


# --------------------------------------------------------------------------
# Fixed-iteration PageRank over the nation trade graph
# --------------------------------------------------------------------------

PR_DAMP = 0.85
PR_ITERS = 3


def _pr_edges_sql() -> str:
    """Edge weights: lineitem count from customer-nation u to
    supplier-nation v, normalized to out-shares of u."""
    return """
edges AS (
  SELECT c.c_nationkey AS u, s.s_nationkey AS v, COUNT(*) AS cnt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2),
outw AS (SELECT u, CAST(SUM(cnt) AS BIGINT) AS tot FROM edges GROUP BY 1),
w AS (SELECT e.u, e.v, CAST(e.cnt AS DOUBLE) / o.tot AS share
      FROM edges e JOIN outw o ON e.u = o.u),
nn AS (SELECT COUNT(*) AS n FROM nation)"""


def _pr_iter_sql(prev: str, out: str) -> str:
    # order-independent sum via integer floor-scaling: floor((r*share)*1e12)
    # is one unambiguous chain of IEEE ops (a DECIMAL cast would NOT be —
    # Spark converts double->decimal through exact BigDecimal while DuckDB
    # scales in double arithmetic, and they disagree near quantum
    # boundaries; measured one 1e-6 flip on this very graph)
    return f""",
{out} AS (
  SELECT nt.n_nationkey AS v,
         -- CAST the damping factor: DuckDB parses bare 0.85 as DECIMAL and
         -- would compute (1-0.85) EXACTLY, while Spark subtracts doubles
         -- (0.15000000000000002) — a measured 1-ulp r divergence
         (1 - CAST({PR_DAMP} AS DOUBLE)) / nn.n
           + CAST({PR_DAMP} AS DOUBLE)
             * (CAST(COALESCE(m.acc, 0) AS DOUBLE) / 1e12) AS r
  FROM nation nt
  CROSS JOIN nn
  LEFT JOIN (
    SELECT w.v,
           CAST(SUM(CAST(floor((p.r * w.share) * 1e12) AS BIGINT)) AS BIGINT) AS acc
    FROM {prev} p JOIN w ON w.u = p.v GROUP BY w.v) m
    ON m.v = nt.n_nationkey)"""


_PAGERANK_SQL = (
    "WITH "
    + _pr_edges_sql()
    + """,
r0 AS (SELECT n_nationkey AS v, CAST(1 AS DOUBLE) / nn.n AS r
       FROM nation CROSS JOIN nn)"""
    + "".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(PR_ITERS))
    + f"""
SELECT nt.n_name AS nation, rk.r AS rank
FROM r{PR_ITERS} rk JOIN nation nt ON nt.n_nationkey = rk.v
ORDER BY nation
"""
)


@query("graph_pagerank", oracle=_PAGERANK_SQL)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, d=0.85) over the nation trade graph
    (customer-nation -> supplier-nation, edge weight = lineitem count
    normalized to out-shares). The iterative-join algebra the engine's CC
    already uses, with VALUES instead of labels: each iteration is one
    equi-join rank⋈edges + one groupBy on the destination — at 10^9 nodes
    the join keys on the partitioned node id and the rank table reuses the
    same partitioning every round (no re-exchange of the edge table). Each
    r*share term floor-scales to an int64 at 1e-12 before summation, so the
    ranks are bit-identical on both engines regardless of add order (an
    exact-integer variant of the dsum pattern — see _pr_iter_sql for why a
    DECIMAL cast is not engine-portable here).
    Dangling mass is dropped (standard simplification), teleport keeps the
    distribution proper."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nt = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    outw = edges.groupBy("u").agg(F.sum("cnt").alias("tot"))
    # cache the weighted edge table: every iteration re-joins it, and
    # WITHOUT this the 4-table edge build replays per iteration (the
    # classic iterative-Spark lineage blowup — the plan audit showed 17
    # exchanges; cached it is built once and re-read)
    w = (
        edges.join(outw, "u")
        .select("u", "v", (F.col("cnt").cast("double") / F.col("tot")).alias("share"))
        .cache()
    )
    n_nations = nt.count()  # 25-row dim: a driver count is the broadcast
    ranks = nt.select(
        F.col("n_nationkey").alias("v"),
        (F.lit(1.0) / n_nations).cast("double").alias("r"),
    )
    for _ in range(PR_ITERS):
        src = ranks.select(F.col("v").alias("src"), "r")
        acc = (
            src.join(w, src.src == w.u)
            .groupBy(F.col("v").alias("dst"))
            .agg(
                F.sum(F.floor((F.col("r") * F.col("share")) * F.lit(1e12))).alias(
                    "acc"
                )
            )
        )
        ranks = (
            nt.select(F.col("n_nationkey").alias("v"))
            .join(F.broadcast(acc), F.col("v") == F.col("dst"), "left")
            .select(
                "v",
                (
                    F.lit((1 - PR_DAMP)) / n_nations
                    + PR_DAMP
                    * (F.coalesce(F.col("acc"), F.lit(0)).cast("double") / F.lit(1e12))
                ).alias("r"),
            )
        )
    return (
        ranks.join(F.broadcast(nt), ranks.v == nt.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("r").alias("rank"))
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# BFS shortest hop distance (iterative frontier expansion)
# --------------------------------------------------------------------------

BFS_N = 20_000  # node universe; avg degree ~6 at sf0.01 → non-trivial frontier
BFS_HOPS = 6    # fixed exploration depth (deterministic round count)

_BFS_SQL = f"""
WITH RECURSIVE edges0 AS (
  SELECT DISTINCT l_orderkey % {BFS_N} AS u, l_partkey % {BFS_N} AS v
  FROM lineitem
),
edges AS (
  SELECT u AS src, v AS dst FROM edges0
  UNION
  SELECT v, u FROM edges0
),
walk(node, d) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS d
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.d < {BFS_HOPS}
)
SELECT node, CAST(MIN(d) AS INT) AS hops
FROM walk GROUP BY node ORDER BY node
"""


@query("graph_bfs_hops", oracle=_BFS_SQL)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest hop distance by distributed BFS — the
    iterative-frontier companion of graph_pagerank (values) and the CC
    labeler (labels): each round is ONE equi-join frontier⋈edges + a
    distinct + an anti-join against the settled set, all keyed on the node
    id. The edge table is cached once and every round reuses its
    partitioning; the frontier and settled tables are the only growing
    state, and each round localCheckpoints to keep the lineage flat
    (Spark would otherwise re-execute all prior rounds per action — the
    same flat-lineage discipline as connected_components). Fixed
    {BFS_HOPS}-round depth keeps the job plan deterministic; rounds whose
    frontier is already empty are no-ops.

    Oracle: DuckDB recursive CTE with UNION (set) semantics — distinct
    (node, depth) rows per level bound the recursion at N×{BFS_HOPS} rows,
    and MIN(d) per node is the shortest-walk distance. hops ≤ {BFS_HOPS}
    on both engines by construction."""
    li = T(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_orderkey") % BFS_N).alias("u"),
        (F.col("l_partkey") % BFS_N).alias("v"),
    ).distinct()
    edges = (
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .union(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = spark.createDataFrame([(0, 0)], "node long, hops int")
    frontier = dist.select("node")
    for d in range(1, BFS_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(d).cast("int").alias("hops"))
            .localCheckpoint(eager=False)
        )
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    return dist.orderBy("node")


# --------------------------------------------------------------------------
# Distribution analytics: ABC (Pareto) classes and per-nation Gini
# --------------------------------------------------------------------------

_ABC_SQL = """
WITH rev AS (
  SELECT c.c_nationkey, o.o_custkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS r
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_nationkey, o_custkey, r,
         CAST(SUM(r) OVER (PARTITION BY c_nationkey
                           ORDER BY r DESC, o_custkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS cum,
         CAST(SUM(r) OVER (PARTITION BY c_nationkey) AS DOUBLE) AS tot
  FROM rev
),
cls AS (
  SELECT c_nationkey,
         CASE WHEN cum / tot <= 0.8 THEN 'A'
              WHEN cum / tot <= 0.95 THEN 'B' ELSE 'C' END AS abc_class,
         r
  FROM ranked
)
SELECT n.n_name AS nation, abc_class,
       COUNT(*) AS n_customers,
       CAST(SUM(r) AS DOUBLE) AS class_revenue
FROM cls JOIN nation n ON n.n_nationkey = cls.c_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("orders_abc_analysis", oracle=_ABC_SQL)
def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/95) customer classification per nation: rank
    customers by exact decimal revenue within their nation, classify by
    cumulative revenue share, roll up to (nation, class) counts +
    revenue. Windows partition on nationkey (never global); revenue sums
    stay DECIMAL until the final share division, so the cumulative shares
    are bit-identical across engines. The per-customer reduce is the RFM
    family's exchange, reused."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DecimalType(30, 6))).alias("r"))
    )
    w = W.partitionBy("c_nationkey").orderBy(F.col("r").desc(), "o_custkey")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy("c_nationkey")
    ranked = rev.select(
        "c_nationkey",
        "r",
        (F.sum("r").over(wcum).cast("double")).alias("cum"),
        (F.sum("r").over(wall).cast("double")).alias("tot"),
    )
    share = F.col("cum") / F.col("tot")
    cls = ranked.select(
        "c_nationkey",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
        "r",
    )
    n = T(spark, sf_dir, "nation")
    return (
        cls.join(F.broadcast(n), cls.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .orderBy("nation", "abc_class")
    )


_GINI_SQL = """
WITH rev AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) * 100 AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_nationkey, cents,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY cents, o_custkey) AS i,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
         SUM(cents) OVER (PARTITION BY c_nationkey) AS tot
  FROM rev
)
SELECT nt.n_name AS nation, CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(SUM((2 * i - n - 1) * cents) AS DOUBLE) / (MAX(n) * MAX(tot)) AS gini
FROM ranked JOIN nation nt ON nt.n_nationkey = ranked.c_nationkey
GROUP BY 1 ORDER BY 1
"""


@query("orders_gini_by_nation", oracle=_GINI_SQL)
def orders_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per nation — the inequality
    summary (mean absolute difference form: Σ(2i−n−1)xᵢ / (n·Σx) over
    ascending xᵢ). Revenues convert to exact integer cents from the
    DECIMAL sum (never from a rounded double), so the whole statistic is
    int64 arithmetic until one final division — bit-identical across
    engines regardless of partitioning. Ranking windows partition on
    nationkey; ties break on custkey for a total order."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast(DecimalType(30, 6))) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = W.partitionBy("c_nationkey").orderBy("cents", "o_custkey")
    wall = W.partitionBy("c_nationkey")
    ranked = rev.select(
        "c_nationkey",
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cents").over(wall).alias("tot"),
    )
    n = T(spark, sf_dir, "nation")
    return (
        ranked.join(F.broadcast(n), ranked.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            (
                F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cents")).cast(
                    "double"
                )
                / (F.max("n") * F.max("tot"))
            ).alias("gini"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Fuzzy-name census (Levenshtein with prefix blocking) and Allen relations
# --------------------------------------------------------------------------

_FUZZY_K = 3

_FUZZY_SQL = f"""
WITH p AS (SELECT p_partkey, p_name FROM part),
pairs AS (
  SELECT substr(a.p_name, 1, 2) AS block,
         levenshtein(a.p_name, b.p_name) AS d
  FROM p a JOIN p b
    ON substr(a.p_name, 1, 2) = substr(b.p_name, 1, 2)
   AND a.p_partkey < b.p_partkey
   AND abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_K}
   AND a.p_name <> b.p_name
)
SELECT block, d AS distance, COUNT(*) AS n_pairs
FROM pairs WHERE d <= {_FUZZY_K}
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("text_fuzzy_name_census", oracle=_FUZZY_SQL)
def text_fuzzy_name_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate census over part names: pairs within Levenshtein
    {_FUZZY_K}, blocked by 2-char prefix + length band so the quadratic
    edit-distance only runs inside small buckets (the standard fuzzy-
    matching shape — blocking keys bound the candidate join, never an
    all-pairs product). Spark's levenshtein and DuckDB's compute the same
    classic DP distance, so the census is exact. Scale: ONE equi-join on
    the block key; a hot prefix bucket is pip_join's salting case."""
    p = T(spark, sf_dir, "part").select("p_partkey", "p_name")
    a = p.select(
        F.col("p_partkey").alias("ak"),
        F.col("p_name").alias("an"),
        F.substring("p_name", 1, 2).alias("block"),
    )
    b = p.select(
        F.col("p_partkey").alias("bk"),
        F.col("p_name").alias("bn"),
        F.substring("p_name", 1, 2).alias("bblock"),
    )
    pairs = a.join(
        b,
        (F.col("block") == F.col("bblock"))
        & (F.col("ak") < F.col("bk"))
        & (
            F.abs(F.length("an") - F.length("bn")) <= _FUZZY_K
        )
        & (F.col("an") != F.col("bn")),
    ).select("block", F.levenshtein("an", "bn").alias("d"))
    return (
        pairs.where(F.col("d") <= _FUZZY_K)
        .groupBy("block", F.col("d").alias("distance"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("block", "distance")
    )


_ALLEN_CASE = """
  CASE
    WHEN a_e < b_s THEN 'before'
    WHEN a_e = b_s THEN 'meets'
    WHEN b_e < a_s THEN 'after'
    WHEN b_e = a_s THEN 'met_by'
    WHEN a_s = b_s AND a_e = b_e THEN 'equals'
    WHEN a_s = b_s AND a_e < b_e THEN 'starts'
    WHEN a_s = b_s AND a_e > b_e THEN 'started_by'
    WHEN a_e = b_e AND a_s > b_s THEN 'finishes'
    WHEN a_e = b_e AND a_s < b_s THEN 'finished_by'
    WHEN a_s > b_s AND a_e < b_e THEN 'during'
    WHEN a_s < b_s AND a_e > b_e THEN 'contains'
    WHEN a_s < b_s THEN 'overlaps'
    ELSE 'overlapped_by'
  END
"""

_ALLEN_SQL = f"""
WITH iv AS (
  SELECT o_custkey, o_orderkey,
         datediff('day', DATE '1992-01-01', o_orderdate) AS s,
         datediff('day', DATE '1992-01-01', o_orderdate) + 30 AS e
  FROM orders
),
pairs AS (
  SELECT a.s AS a_s, a.e AS a_e, b.s AS b_s, b.e AS b_e
  FROM iv a JOIN iv b
    ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
)
SELECT {_ALLEN_CASE} AS relation, COUNT(*) AS n
FROM pairs GROUP BY 1 ORDER BY 1
"""


@query("join_allen_relations", oracle=_ALLEN_SQL)
def join_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra over each customer's order-activity
    windows: every within-customer pair classifies into one of the 13
    relations (before/meets/overlaps/starts/during/finishes/equals and
    inverses) by a single exhaustive integer CASE — the temporal-DB
    primitive beneath interval joins and conflict detection. Pairs are
    bounded per customer (the key the join runs on), so the quadratic
    stays inside buckets; the result is a ≤13-row census."""
    o = T(spark, sf_dir, "orders")
    s = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    iv = o.select("o_custkey", "o_orderkey", s.alias("s"), (s + 30).alias("e"))
    a = iv.select(
        F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("ak"),
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = iv.select(
        F.col("o_custkey").alias("ck2"), F.col("o_orderkey").alias("bk"),
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    pairs = a.join(
        b, (F.col("ck") == F.col("ck2")) & (F.col("ak") < F.col("bk"))
    )
    rel = F.expr(_ALLEN_CASE)
    return (
        pairs.select(rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("relation")
    )


# --------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# --------------------------------------------------------------------------

_TRIANGLE_SQL = f"""
WITH e0 AS (
  SELECT DISTINCT l_orderkey % {BFS_N} AS u, l_partkey % {BFS_N} AS v
  FROM lineitem
),
und AS (
  SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM e0 WHERE u <> v
  GROUP BY 1, 2
),
deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY 1
),
-- orient every edge from the lower-(degree, id) endpoint to the higher:
-- each wedge is then generated exactly once, at its smallest-degree apex
ori AS (
  SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS s,
         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS t
  FROM und u JOIN deg da ON da.n = u.a JOIN deg db ON db.n = u.b
),
wedge AS (
  SELECT e1.s AS apex, e1.t AS x, e2.t AS y
  FROM ori e1 JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t
),
tri AS (
  SELECT w.apex, w.x, w.y FROM wedge w
  JOIN und c ON c.a = LEAST(w.x, w.y) AND c.b = GREATEST(w.x, w.y)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes
FROM tri
"""


@query("graph_triangle_count", oracle=_TRIANGLE_SQL)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count by degree-ordered edge orientation — the
    classic bound that makes wedges Σ d_out² with d_out ≤ O(√m) instead
    of Σ d² (hub nodes never serve as wedge apexes): orient each
    undirected edge from its lower-(degree, id) endpoint, self-join the
    oriented list on the apex, close wedges against the undirected edge
    set. Same lineitem-derived graph as graph_bfs_hops. Three exchanges
    (degree count, apex join, closing join), all equi-keyed; no global
    structure."""
    li = T(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_orderkey") % BFS_N).alias("u"),
        (F.col("l_partkey") % BFS_N).alias("v"),
    ).distinct()
    und = (
        e0.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    j = und.join(da, "a").join(db, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = j.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("t"),
    )
    e1 = ori.select(F.col("s"), F.col("t").alias("x"))
    e2 = ori.select(F.col("s"), F.col("t").alias("y"))
    wedge = e1.join(e2, "s").where(F.col("x") < F.col("y"))
    tri = wedge.join(
        und,
        (F.least("x", "y") == F.col("a")) & (F.greatest("x", "y") == F.col("b")),
        "left_semi",
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return n_tri.crossJoin(n_edges).crossJoin(n_nodes)


# --------------------------------------------------------------------------
# Connected components as a first-class query (labels companion of BFS/PR)
# --------------------------------------------------------------------------

CC_N = 200_000  # node universe; l_linenumber=7 keeps the graph a sparse
                # forest (sf0.01: 8.6k edges, 5k components, max size 23)

_CC_SQL = f"""
WITH RECURSIVE ed AS (
  SELECT DISTINCT l_orderkey % {CC_N} AS u,
                  (l_partkey * 31 + l_suppkey) % {CC_N} AS v
  FROM lineitem WHERE l_linenumber = 7
),
edges AS (
  SELECT u AS s, v AS d FROM ed WHERE u <> v
  UNION SELECT v, u FROM ed WHERE u <> v
),
walk(node, lbl) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.node
)
SELECT node, MIN(lbl) AS root
FROM walk GROUP BY node ORDER BY node
"""


@query("graph_connected_components", oracle=_CC_SQL)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the sparse co-purchase graph, surfacing
    the engine's shared CC machinery (used internally by free-standing
    surfaces R10, dedup_clusters, spatial_cluster_points) as a driver query
    with its own exact oracle. Label rule: root = component-minimum node id.

    Scale shape: the hybrid CC in operators.topology — below the measured
    20M-pair crossover one vectorized driver union-find (one Spark action);
    above it alternating large-star/small-star rounds (Kiveris et al.) of
    bounded equi-joins with localCheckpoint lineage truncation — the 100 TB
    path needs no driver-side graph. Both strategies emit the same
    min-label roots; the union of root self-rows below makes the row set
    strategy-invariant (the star loop's converged edge list does not carry
    an explicit (root, root) row, the driver path does).

    Oracle: recursive min-label reachability walk — UNION set semantics
    bound the walk at Σ component_size² rows, which the sparse fixture
    keeps tiny (max component = 23 nodes)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 7)
    pairs = (
        li.select(
            (F.col("l_orderkey") % CC_N).alias("src"),
            ((F.col("l_partkey") * 31 + F.col("l_suppkey")) % CC_N).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    from etf_topox_spark.operators.topology import connected_components

    labels = connected_components(pairs)
    roots = labels.select(F.col("root").alias("node"), F.col("root"))
    return (
        labels.select("node", "root")
        .unionByName(roots)
        .distinct()
        .orderBy("node")
    )


# --------------------------------------------------------------------------
# Weighted single-source shortest paths (fixed-round Bellman-Ford)
# --------------------------------------------------------------------------

SSSP_N = 5_000   # node universe (denser than CC: every lineitem row)
SSSP_ROUNDS = 5  # fixed relaxation depth → shortest path over ≤5 edges

_SSSP_SQL = f"""
WITH RECURSIVE ed AS (
  SELECT DISTINCT l_orderkey % {SSSP_N} AS u, l_partkey % {SSSP_N} AS v
  FROM lineitem
),
edges AS (
  SELECT u AS src, v AS dst, (u + v) % 9 + 1 AS wt FROM ed WHERE u <> v
  UNION
  SELECT v, u, (u + v) % 9 + 1 FROM ed WHERE u <> v
),
walk(node, d, i) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w.d + e.wt, w.i + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.i < {SSSP_ROUNDS}
)
SELECT node, MIN(d) AS dist
FROM walk GROUP BY node ORDER BY node
"""


@query("graph_weighted_sssp", oracle=_SSSP_SQL)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths by {SSSP_ROUNDS} fixed
    Bellman-Ford relaxation rounds — the values-with-min companion of
    graph_bfs_hops (hops) and graph_pagerank (mass): every round is ONE
    equi-join dist⋈edges keyed on the node id plus a min-aggregate, the
    edge table is checkpointed once and its partitioning reused, and each
    round localCheckpoints so the lineage stays flat (the iterative-Spark
    discipline shared with the CC star loop). Integer weights make every
    distance exact on both engines; the fixed round count makes the result
    a deterministic function of the graph (shortest walk over ≤{SSSP_ROUNDS}
    edges), so the plan is static — no data-dependent convergence test in
    the hot path (at 10^9 nodes the usual stop-when-no-change probe is one
    extra count per round; fixed depth skips even that).

    Oracle: recursive walk bounded by the hop counter, UNION-deduped per
    (node, d, i) state; MIN(d) per node replays the relaxation exactly."""
    li = T(spark, sf_dir, "lineitem")
    e0 = (
        li.select(
            (F.col("l_orderkey") % SSSP_N).alias("u"),
            (F.col("l_partkey") % SSSP_N).alias("v"),
        )
        .distinct()
        .filter(F.col("u") != F.col("v"))
    )
    wt = (F.col("u") + F.col("v")) % 9 + 1
    edges = (
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"), wt.alias("wt"))
        .union(e0.select(F.col("v"), F.col("u"), wt))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = spark.createDataFrame([(0, 0)], "node long, d long")
    for _ in range(SSSP_ROUNDS):
        relaxed = (
            dist.join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("d") + F.col("wt")).alias("d"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
    return dist.select("node", F.col("d").alias("dist")).orderBy("node")


# --------------------------------------------------------------------------
# k-core decomposition (fixed peel rounds)
# --------------------------------------------------------------------------

KCORE_N = 20_000   # node universe; l_linenumber<=2 keeps avg degree ~3
KCORE_K = 3
KCORE_ROUNDS = 12  # fixture converges at round 11 (sf0.01) / 8 (sf0.001);
                   # one spare round makes the fixed-depth result THE k-core


def _kcore_sql() -> str:
    s = f"""WITH ed AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {KCORE_N} AS u, l_partkey % {KCORE_N} AS v
  FROM lineitem WHERE l_linenumber <= 2
), e0 AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM ed WHERE u <> v
  UNION SELECT v, u FROM ed WHERE u <> v
)"""
    for r in range(KCORE_ROUNDS):
        s += f""",
k{r} AS MATERIALIZED (SELECT src FROM e{r} GROUP BY src HAVING COUNT(*) >= {KCORE_K}),
e{r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r} e
  JOIN k{r} a ON a.src = e.src JOIN k{r} b ON b.src = e.dst)"""
    s += (
        f"\nSELECT src AS node, COUNT(*) AS degree"
        f" FROM e{KCORE_ROUNDS} GROUP BY src ORDER BY node"
    )
    return s


@query("graph_kcore", oracle=_kcore_sql())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the co-purchase graph by {KCORE_ROUNDS} fixed peel
    rounds: each round drops every node with surviving-degree < k, then
    drops edges touching a dropped node — the standard iterative peel,
    expressed as one degree aggregate + two semi-joins per round, all keyed
    on the node id. Fixed depth keeps the plan static (the data-dependent
    stop-when-stable probe is one count per round — skipped, like SSSP);
    the fixture converges inside the budget so the fixed-depth result IS
    the true k-core (pytest pins the fixpoint). localCheckpoint per round
    keeps the lineage flat — at 10^9 edges each round is two bounded
    equi-join shuffles, no driver-side graph state.

    Oracle: the same peel unrolled as MATERIALIZED CTE stages (without
    MATERIALIZED, each stage inlines its predecessor twice → exponential
    replay)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    e0 = (
        li.select(
            (F.col("l_orderkey") % KCORE_N).alias("u"),
            (F.col("l_partkey") % KCORE_N).alias("v"),
        )
        .distinct()
        .filter(F.col("u") != F.col("v"))
    )
    alive = (
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .union(e0.select(F.col("v"), F.col("u")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(KCORE_ROUNDS):
        keep = (
            alive.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select("src")
        )
        alive = (
            alive.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        alive.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("node")
    )


# --------------------------------------------------------------------------
# Label propagation community detection (synchronous, deterministic)
# --------------------------------------------------------------------------

LPA_N = 4_000     # node universe (co-purchase graph at sf0.01 → dense enough)
LPA_ROUNDS = 3    # fixed synchronous rounds (static plan, like PageRank/SSSP)


def _lpa_sql() -> str:
    """Unrolled synchronous-LPA CTE chain. Each round: count neighbor
    labels per node, keep the (count DESC, label ASC) argmax — the
    deterministic tie rule both engines implement identically in integer
    arithmetic. MATERIALIZED stops the exponential CTE re-inline."""
    parts = [
        f"""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {LPA_N} AS u, l_partkey % {LPA_N} AS v
  FROM lineitem WHERE l_linenumber <= 2
),
edges AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM e0 WHERE u <> v
  UNION
  SELECT v, u FROM e0 WHERE u <> v
),
l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS lbl FROM edges
)"""
    ]
    for t in range(LPA_ROUNDS):
        parts.append(
            f""",
c{t} AS MATERIALIZED (
  SELECT e.src AS node, l.lbl, COUNT(*) AS cnt
  FROM edges e JOIN l{t} l ON l.node = e.dst
  GROUP BY 1, 2
),
l{t + 1} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
    FROM c{t}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT lbl AS community, COUNT(*) AS n_members, MIN(node) AS min_node
FROM l{LPA_ROUNDS} GROUP BY lbl HAVING COUNT(*) >= 2
ORDER BY n_members DESC, community LIMIT 50"""
    )
    return "".join(parts)


@query("graph_label_propagation", oracle=_lpa_sql())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation ({LPA_ROUNDS}
    fixed rounds over the co-purchase graph): every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbors, ties to the smallest label — the classic Raghavan-style LPA
    made deterministic (synchronous update + total tie order), so both
    engines converge to the identical labeling with pure integer
    arithmetic.

    Scale shape: one labels⋈edges equi-join + one (node, lbl) count agg +
    one per-node argmax window per round — every exchange keys on the node
    id, the edge table is built once and localCheckpoint keeps lineage
    flat (the SSSP/kcore pattern). At 10^9 edges the argmax window
    partitions by node (never global); the label table is the only state,
    one row per node. Returns communities of size ≥ 2 (top 50) so the
    result is a stable, bounded summary."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    e0 = (
        li.select(
            (F.col("l_orderkey") % LPA_N).alias("u"),
            (F.col("l_partkey") % LPA_N).alias("v"),
        )
        .distinct()
        .filter(F.col("u") != F.col("v"))
    )
    edges = (
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .union(e0.select(F.col("v"), F.col("u")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w_arg = W.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("lbl").asc())
    for _ in range(LPA_ROUNDS):
        neigh = (
            edges.join(
                labels.select(F.col("node").alias("dst"), "lbl"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            neigh.withColumn("rn", F.row_number().over(w_arg))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=False)
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("node").alias("min_node"))
        .filter(F.col("n_members") >= 2)
        .orderBy(F.col("n_members").desc(), "community")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Deterministic per-stratum bottom-k sampling (the distributed reservoir)
# --------------------------------------------------------------------------

RESERVOIR_K = 50


def _bottomk_sql() -> str:
    return f"""
SELECT event_type, event_id, user_id
FROM (
  SELECT event_type, event_id, user_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),
                    event_id
         ) AS rn
  FROM events
) WHERE rn <= {RESERVOIR_K}
ORDER BY event_type, event_id
"""


@query("sample_bottomk_reservoir", oracle=_bottomk_sql())
def sample_bottomk_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-group sampling as BOTTOM-K BY HASH — the
    deterministic, mergeable equivalent of reservoir sampling: rank rows
    inside each stratum by md5(event_id:user_id) and keep the k smallest.
    Unlike an RNG reservoir, the sample is (a) reproducible across
    retries/resumes, (b) partition-layout independent, and (c) mergeable —
    bottom-k of a union is the bottom-k of each side's bottom-k, so at
    10^12 rows each partition pre-reduces to k rows map-side before one
    tiny per-group merge (Spark plans exactly that for the rank window
    after AQE; the md5 ranking key is computed scan-side). The md5 hex
    string compares identically in both engines."""
    e = T(spark, sf_dir, "events")
    key = F.md5(
        F.concat_ws(":", F.col("event_id").cast("string"), F.col("user_id").cast("string"))
    )
    w = W.partitionBy("event_type").orderBy(key.asc(), F.col("event_id").asc())
    return (
        e.select("event_type", "event_id", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select("event_type", "event_id", "user_id")
        .orderBy("event_type", "event_id")
    )
