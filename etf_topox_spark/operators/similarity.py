"""Similarity search over the embeddings table (task brief: brute-force
cosine top-k baseline + an LSH-bucketed scale path).

- `ann_cosine_topk`: exact baseline — broadcast the (small) query set
  against the corpus, cosine via in-order double folds (zip_with +
  aggregate), per-query top-k window. DuckDB-oracled: list_zip/
  list_transform/list_aggregate fold in the same order → bit-identical.
- `ann_lsh_topk`: random-hyperplane LSH (deterministic planes) → bucket
  equi-join (+ multiprobe on 1-bit flips) → exact cosine rerank. At 10^12
  rows this is the shape that works: signatures are one map-side kernel,
  the join shuffles only bucket-matched pairs. Rows-only for the driver;
  recall vs the exact baseline is asserted in tests/test_dedup.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

N_QUERIES = 8
K = 5
DIM = 64
N_PLANES = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine_cols():
    dot = _dot("qe", "ce")
    na = _dot("qe", "qe")
    nb = _dot("ce", "ce")
    return dot / (F.sqrt(na) * F.sqrt(nb))


_COS_SQL_EXPR = """
  list_aggregate(list_transform(list_zip(qe, ce), x -> x[1] * x[2]), 'sum')
  / (sqrt(list_aggregate(list_transform(list_zip(qe, qe), x -> x[1] * x[2]), 'sum'))
   * sqrt(list_aggregate(list_transform(list_zip(ce, ce), x -> x[1] * x[2]), 'sum')))
"""

_ANN_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
s AS (SELECT query_id, neighbor_id, {_COS_SQL_EXPR} AS cosine
      FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM s)
SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= {K}
"""


@query("ann_cosine_topk", oracle=_ANN_SQL)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = T(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qe"),
    )
    c = em.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ce"),
    )
    win = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_cols())
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


# --- LSH-bucketed scale path -----------------------------------------------------

def _planes() -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(77))
    return rng.standard_normal((N_PLANES, DIM))


def _sign_bucket(vecs: np.ndarray) -> np.ndarray:
    proj = vecs @ _planes().T
    bits = (proj > 0).astype(np.int64)
    return (bits * (1 << np.arange(N_PLANES, dtype=np.int64))[None, :]).sum(axis=1)


def lsh_buckets(df: DataFrame, id_col: str, multiprobe: bool) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf["embedding"].to_list()).astype(np.float64)
            base = _sign_bucket(vecs)
            if multiprobe:
                # probe the bucket plus every 1- and 2-bit flip (query side
                # only): cheap recall for near-uniform embeddings, where a
                # single sign flip is common among true neighbors
                masks = [np.int64(0)]
                masks += [np.int64(1 << i) for i in range(N_PLANES)]
                masks += [
                    np.int64((1 << i) | (1 << j))
                    for i in range(N_PLANES)
                    for j in range(i + 1, N_PLANES)
                ]
                m = np.array(masks, np.int64)
                buckets = base[:, None] ^ m[None, :]
            else:
                buckets = base[:, None]
            n_b = buckets.shape[1]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_b),
                    "embedding": [e for e in pdf["embedding"] for _ in range(n_b)],
                    "bucket": buckets.ravel(),
                }
            )

    return df.mapInPandas(kernel, f"{id_col} long, embedding array<float>, bucket long")


def _ann_lsh_oracle() -> str:
    """DuckDB twin of the LSH funnel: the deterministic hyperplanes are
    inlined as double literals (repr round-trips exactly), buckets are
    sign-of-in-order-dot (verified sign-identical to numpy's dgemm on this
    corpus, min |projection| ≈ 1e-4 ≫ fp error), multiprobe masks are the
    same 0/1/2-bit flips, and the rerank is the in-order cosine fold shared
    with ann_cosine_topk."""
    planes = _planes()
    plane_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(v) for v in planes[p]))
        for p in range(N_PLANES)
    )
    masks = [0] + [1 << i for i in range(N_PLANES)] + [
        (1 << i) | (1 << j) for i in range(N_PLANES) for j in range(i + 1, N_PLANES)
    ]
    mask_rows = ", ".join(f"({m})" for m in masks)
    return f"""
WITH planes(p, pv) AS (VALUES
    {plane_rows}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
proj AS (
  SELECT m.vec_id, pl.p,
         list_aggregate(list_transform(list_zip(m.e, pl.pv), x -> x[1] * x[2]), 'sum') AS d
  FROM emb m, planes pl
),
bucket0 AS (
  SELECT vec_id, SUM(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS b
  FROM proj GROUP BY 1
),
masks(mk) AS (VALUES {mask_rows}),
qb AS (
  SELECT b0.vec_id AS query_id, xor(b0.b, m.mk) AS bucket
  FROM bucket0 b0, masks m WHERE b0.vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM qb q JOIN bucket0 c ON c.b = q.bucket
  WHERE q.query_id <> c.vec_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         {_COS_SQL_EXPR.replace('qe', 'qa.e').replace('ce', 'cb.e')} AS cosine
  FROM cand cd
  JOIN emb qa ON qa.vec_id = cd.query_id
  JOIN emb cb ON cb.vec_id = cd.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {K}
ORDER BY query_id, rn
"""


@query("ann_lsh_topk", oracle=_ann_lsh_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = T(spark, sf_dir, "embeddings")
    q = lsh_buckets(
        em.filter(F.col("vec_id") < N_QUERIES).withColumnRenamed("vec_id", "query_id")
        .select("query_id", "embedding"),
        "query_id",
        multiprobe=True,
    ).withColumnRenamed("embedding", "qe_raw")
    c = lsh_buckets(
        em.withColumnRenamed("vec_id", "neighbor_id").select("neighbor_id", "embedding"),
        "neighbor_id",
        multiprobe=False,
    ).withColumnRenamed("embedding", "ce_raw")
    cand = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("qe", F.transform("qe_raw", lambda x: x.cast("double")))
        .withColumn("ce", F.transform("ce_raw", lambda x: x.cast("double")))
    )
    win = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        cand.withColumn("cosine", _cosine_cols())
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )
