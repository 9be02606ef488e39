"""Exact-quota stratified train/val/test assignment over documents.

The split step every training-data pipeline runs before anything else:
assign each document to train/val/test such that (a) the assignment is a
pure deterministic function of the document id (reproducible across
engines, re-runs, and repartitions — no RNG state), (b) quotas are EXACT
integers per stratum (floor(0.8 n) train, floor(0.9 n) - floor(0.8 n)
val, remainder test — not Bernoulli-approximate like sample_stratified's
sampling), and (c) within a stratum the choice of WHICH documents land
where is unbiased w.r.t. any payload property (ordering by md5(doc_id),
a hash neither engine can correlate with content).

Spark shape: one window per stratum (rank by hash) + one partial-
aggregable rollup — a single exchange keyed by (lang, source). Quota
boundaries are rank comparisons (rn * 10 <= 8 * n etc.), all int64.
At 10^12 docs the window sort is the cost; the production variant
replaces rank-by-hash with the equivalent quantile-free threshold on the
hash value itself once per-stratum counts are known (two scans, no sort)
— noted because the EXACT quota needs the rank.

Oracle: identical window + quota algebra in DuckDB; md5 hex strings
compare identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wall = Window.partitionBy("lang", "source")
    r = d.select(
        "doc_id",
        "lang",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    split = (
        F.when(F.col("rn") * 10 <= F.col("n") * 8, F.lit("train"))
        .when(F.col("rn") * 10 <= F.col("n") * 9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        r.select("lang", "source", split.alias("split"), "doc_id")
        .groupBy("lang", "source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("lang", "source", "split")
    )


_SPLIT_SQL = """
WITH r AS (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM documents
),
s AS (
  SELECT lang, source, doc_id,
         CASE WHEN rn * 10 <= n * 8 THEN 'train'
              WHEN rn * 10 <= n * 9 THEN 'val'
              ELSE 'test' END AS split
  FROM r
)
SELECT lang, source, split, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM s GROUP BY 1, 2, 3
ORDER BY lang, source, split
"""


@query("dataset_split_assign", oracle=_SPLIT_SQL)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-ordered train/val/test assignment with exact
    80/10/10 integer quotas per (lang, source) stratum; per-cell counts +
    doc-id checksums (module docstring)."""
    return split_assign(spark, sf_dir)
