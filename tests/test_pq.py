"""Product quantization (operators/similarity.ann_pq_topk): a planted
exact duplicate achieves the global-minimum ADC for its query — since
code(v_m) = argmin_j d(v_m, cw_j), ADC(q, dup(q)) = Σ_m min_j d2(q_m, cw_j)
≤ ADC(q, v) for every v. So the dup must appear at rank 1 (ties broken by
neighbor_id can only be other vectors achieving the same minimum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.similarity import PQ_KSUB, PQ_M, PQ_SUBDIM


def _pq_reference(vecs: np.ndarray, n_queries: int, k: int):
    """Pure-numpy replay of the PQ funnel (training-free codebooks)."""
    n, dim = vecs.shape
    cw = vecs[:PQ_KSUB].reshape(PQ_KSUB, PQ_M, PQ_SUBDIM)
    sub = vecs.reshape(n, PQ_M, PQ_SUBDIM)
    d2 = np.empty((n, PQ_M, PQ_KSUB))
    for m in range(PQ_M):
        for j in range(PQ_KSUB):
            d2[:, m, j] = ((sub[:, m, :] - cw[j, m, :]) ** 2).sum(-1)
    codes = d2.argmin(axis=2)  # ties → lowest j (argmin default)
    out = []
    for q in range(n_queries):
        adc = d2[q, np.arange(PQ_M)[:, None], codes.T].sum(axis=0)
        order = [i for i in np.lexsort((np.arange(n), adc)) if i != q][:k]
        out.append(order)
    return out


def test_planted_duplicate_ranks_first(spark):
    from etf_topox_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    out = QUERIES["ann_pq_topk"](spark, "/root/testdata/sf0.001").toPandas()
    # reference replay on the same embeddings
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    vecs = np.stack(emb["embedding"].to_list()).astype(np.float64)
    ref = _pq_reference(vecs, 8, 5)
    for q in range(8):
        got = out[out["query_id"] == q].sort_values("rn")["neighbor_id"].tolist()
        # numpy float tree-sums differ from the engines' in-order folds at
        # the last ULP, so compare the SET at each distinct distance level
        # is overkill here: top-5 ids match in practice on this fixture
        assert got == [int(i) for i in ref[q]], f"query {q}: {got} vs {ref[q]}"


def test_codes_are_compact(spark):
    """Every corpus vector encodes to PQ_M codes in [0, PQ_KSUB)."""
    import pyspark.sql.functions as F

    from etf_topox_spark.operators.similarity import T

    em = T(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    slices = F.array(*[F.slice("e", m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)])
    sub = em.select("vec_id", F.posexplode(slices).alias("m", "se"))
    cw = sub.filter(F.col("vec_id") < PQ_KSUB).select(
        F.col("vec_id").alias("code"), "m", F.col("se").alias("ce")
    )
    l2 = F.aggregate(
        F.zip_with("se", "ce", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("vec_id", "m").orderBy(F.col("d2").asc(), F.col("code").asc())
    codes = (
        sub.join(F.broadcast(cw), "m")
        .select("vec_id", "m", "code", l2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    stats = codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("code").alias("mn"),
        F.max("code").alias("mx"),
        F.countDistinct("vec_id").alias("nv"),
    ).collect()[0]
    assert stats["n"] == stats["nv"] * PQ_M
    assert 0 <= stats["mn"] and stats["mx"] < PQ_KSUB
