"""Scalar function families (SURVEY.md §2.B F1-F7).

F3's bit-packing is the reference's object-ref scheme re-expressed: TopoX
packs (BaseX db index, pre id) into one long (SURVEY.md §2.A R5); here the
same shiftleft/OR composition packs (l_orderkey, l_linenumber).
F5's explode-over-arrays is the parse-surface analog of the reference's
posList streaming (SURVEY.md §2.A R3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T


# --- F1: strings -------------------------------------------------------------

@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_brand) AS brand_lower,
           upper(p_type) AS type_upper,
           substring(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lower"),
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
    )


# --- F2: math ------------------------------------------------------------------

@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           sqrt(l_quantity) AS qty_sqrt,
           ROUND(pow(l_discount, 2), 9) AS disc_sq,
           round(l_extendedprice, 0) AS price_round,
           floor(l_tax * 100) AS tax_pct_floor,
           ceil(l_quantity / 7.0) AS qty_ceil7,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(l_orderkey % 13 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("qty_sqrt"),  # sqrt is IEEE-exact: identical bits
        F.round(F.pow("l_discount", F.lit(2)), 9).alias("disc_sq"),  # pow may differ 1 ulp
        F.round("l_extendedprice", 0).alias("price_round"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_orderkey") % 13).alias("key_mod"),
    )


# --- F3: hash / bit-packing — the reference's (db, pre)→long ref scheme ---------

PACK_BITS = 8  # low bits carry the line number; cf. TopoX db-index packing


@query(
    "bitpack_refs",
    oracle=f"""
    SELECT (l_orderkey << {PACK_BITS}) | CAST(l_linenumber AS BIGINT) AS packed_ref,
           ((l_orderkey << {PACK_BITS}) | CAST(l_linenumber AS BIGINT)) >> {PACK_BITS}
             AS unpacked_order,
           ((l_orderkey << {PACK_BITS}) | CAST(l_linenumber AS BIGINT))
             & {(1 << PACK_BITS) - 1} AS unpacked_line,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor
    FROM lineitem
    """,
)
def bitpack_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    packed = F.shiftleft(F.col("l_orderkey"), PACK_BITS).bitwiseOR(
        F.col("l_linenumber").cast("long")
    )
    return li.select(
        packed.alias("packed_ref"),
        F.shiftright(packed, PACK_BITS).alias("unpacked_order"),
        packed.bitwiseAND(F.lit((1 << PACK_BITS) - 1)).alias("unpacked_line"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long")).alias("key_xor"),
    )


# --- F4: date/time ----------------------------------------------------------------

@query(
    "datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(extract(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(extract(month FROM o_orderdate) AS INTEGER) AS order_mon,
           CAST(extract(hour FROM o_orderdate) AS INTEGER) AS order_hour,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k
    FROM orders
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        F.hour("o_orderdate").alias("order_hour"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ).cast("long"),
    )


# --- F5: arrays (higher-order functions over the embedding vectors) ----------------

@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') AS vec_sum,
           list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS vec_max
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = T(spark, sf_dir, "embeddings")
    # both engines fold the list left-to-right in double, so the result is
    # bit-identical (verified against a sequential-sum oracle)
    vec_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    vec_max = F.array_max(F.transform("embedding", lambda x: x.cast("double")))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        vec_sum.alias("vec_sum"),
        vec_max.alias("vec_max"),
    )


@query(
    "array_explode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings WHERE vec_id < 20
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


# --- F6/F7: map + JSON (events.props is a JSON object) ------------------------------

@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select("event_id", k.alias("prop_k"), (k % 10).alias("k_bucket"))


@query(
    "map_funcs",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    # parse into a real MapType then element_at — the from_json→map path
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.select("event_type", F.element_at(m, "k").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )
