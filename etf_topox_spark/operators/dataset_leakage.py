"""Cross-split near-duplicate leakage census — the contamination gate.

The check every training pipeline must run after splitting: do any
TRAIN documents have near-duplicates in TEST? (If so, eval numbers are
contaminated.) This composes two existing verified components end to
end: the MinHash/LSH candidate funnel of operators/dedup.py (16 bands x
4 rows, signatures-only shuffle) and a deterministic hash split (first
md5 hex digit in {0,1} -> test, ~1/8 — threshold-on-hash rather than
rank-based so the assignment needs NO global window; the exact-quota
variant is operators/dataset_split.py), over the planted-near-dup corpus.

Output is one row per unordered split-pair class (test-test, test-train,
train-train — LEAST/GREATEST canonical): candidate-pair count at est_jaccard >= 0.5, how many are
the planted mutations (ground truth), and the integer sum of matching
signature rows (est * 64 — kept integral so the contract carries no raw
doubles). The test-train row is the leak report; planted pairs land
there whenever the hash split separates a document from its mutation,
which the test asserts happens.

Scale: identical to dedup_minhash_lsh — text never shuffles, the split
tag is a map-side expression, and the census is a 3-row aggregate.

Oracle: the shared _minhash_sql_body funnel (uint64-wraparound MinHash
in HUGEINT) + the same split CASE and census algebra in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.dedup import (
    MUT_OFFSET,
    N_MUTATED,
    N_PERM,
    _minhash_sql_body,
    _mutated_corpus,
    minhash_candidates,
)
from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

EST_MIN = 0.5


def _split_col(c) -> F.Column:
    return F.when(
        F.substring(F.md5(c.cast("string")), 1, 1).isin("0", "1"), F.lit("test")
    ).otherwise(F.lit("train"))


def leakage_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))
    splits = corpus.select(
        "doc_id", _split_col(F.col("doc_id")).alias("split")
    )
    cand = minhash_candidates(corpus, spark).filter(
        F.col("est_jaccard") >= EST_MIN
    )
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    tagged = cand.join(sa, "doc_a").join(sb, "doc_b")
    planted = (
        (F.col("doc_b") == F.col("doc_a") + MUT_OFFSET)
        & (F.col("doc_a") < N_MUTATED)
    ).cast("long")
    return (
        tagged.select(
            F.concat(
                F.least("split_a", "split_b"), F.lit("-"),
                F.greatest("split_a", "split_b"),
            ).alias("pair_class"),
            planted.alias("planted"),
            F.round(F.col("est_jaccard") * N_PERM, 0).cast("long").alias("m"),
        )
        .groupBy("pair_class")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("planted").alias("n_planted"),
            F.sum("m").alias("sum_sig_matches"),
        )
        .orderBy("pair_class")
    )


_LEAK_SQL = (
    _minhash_sql_body()
    + f""",
splits AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
              THEN 'test' ELSE 'train' END AS split
  FROM corpus
),
tagged AS (
  SELECT LEAST(x.split, y.split) || '-' || GREATEST(x.split, y.split)
           AS pair_class,
         CASE WHEN e.doc_b = e.doc_a + {MUT_OFFSET}
                   AND e.doc_a < {N_MUTATED} THEN 1 ELSE 0 END AS planted,
         CAST(ROUND(e.est_jaccard * {N_PERM}) AS BIGINT) AS m
  FROM est e
  JOIN splits x ON x.doc_id = e.doc_a
  JOIN splits y ON y.doc_id = e.doc_b
  WHERE e.est_jaccard >= {EST_MIN}
)
SELECT pair_class, COUNT(*) AS n_pairs,
       CAST(SUM(planted) AS BIGINT) AS n_planted,
       CAST(SUM(m) AS BIGINT) AS sum_sig_matches
FROM tagged GROUP BY pair_class ORDER BY pair_class
"""
)


@query("split_leakage_census", oracle=_LEAK_SQL)
def split_leakage_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs straddling the train/test hash split, per
    split-pair class, with planted-mutation ground truth (module
    docstring). The test-train row is the contamination report."""
    return leakage_census(spark, sf_dir)
