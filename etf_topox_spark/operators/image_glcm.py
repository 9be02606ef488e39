"""GLCM texture features over decoded images — integer-exact.

The gray-level co-occurrence matrix (Haralick 1973), the classical
texture descriptor: quantize the channel to 16 gray levels, count
horizontally-adjacent level pairs, then reduce the matrix to scalar
features. All features here are pure int64 so both engines agree bit for
bit:

    contrast    = SUM n * (q1 - q2)^2
    energy      = SUM n^2
    homogeneity = SUM (n * 10^6) DIV (1 + |q1 - q2|)   (scaled integer)

Spark shape: the Arrow kernel decodes REAL bytes and emits one
pre-reduced <=256-row co-occurrence partial per image (np.bincount over
q1*16+q2) — pixels never cross the exchange; the feature reduction is a
partial-aggregable groupBy(image). Third independent proof of lossless
decode beside PSNR and the channel histogram (one wrong pixel perturbs
up to two matrix cells and therefore energy).

Oracle: symbolic replay of the generator formula (sources/images.py:40),
identical quantization (v DIV 16) and identical integer feature algebra,
via a self-join on x+1 in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_GLCM_IMGS = 150
Q = 16  # gray levels
HSCALE = 10**6


def glcm_features(spark: SparkSession, n_images: int = N_GLCM_IMGS) -> DataFrame:
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, n_images)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, q1s, q2s, ns = [], [], [], []
            for r in pdf.itertuples(index=False):
                px = IC.decode(bytes(r.bytes), r.fmt)[..., 0] // Q
                key = px[:, :-1].astype(np.int64) * Q + px[:, 1:]
                cnt = np.bincount(key.ravel(), minlength=Q * Q)
                nz = np.nonzero(cnt)[0]
                ids.append(np.full(len(nz), int(r.image_id[4:]), dtype=np.int64))
                q1s.append((nz // Q).astype(np.int64))
                q2s.append((nz % Q).astype(np.int64))
                ns.append(cnt[nz].astype(np.int64))
            yield pd.DataFrame(
                {
                    "i": np.concatenate(ids),
                    "q1": np.concatenate(q1s),
                    "q2": np.concatenate(q2s),
                    "n": np.concatenate(ns),
                }
            )

    m = (
        imgs.mapInPandas(kernel, "i long, q1 long, q2 long, n long")
        .groupBy("i", "q1", "q2")
        .agg(F.sum("n").alias("n"))
    )
    dq = F.col("q1") - F.col("q2")
    return (
        m.groupBy("i")
        .agg(
            F.sum("n").alias("n_pairs"),
            F.sum(F.col("n") * dq * dq).alias("contrast"),
            F.sum(F.col("n") * F.col("n")).alias("energy"),
            F.sum(F.expr(f"n * {HSCALE} DIV (1 + abs(q1 - q2))")).alias(
                "homogeneity_scaled"
            ),
        )
        .select(
            F.col("i").alias("image_id"), "n_pairs", "contrast", "energy",
            "homogeneity_scaled",
        )
        .orderBy("image_id")
    )


_GLCM_SQL = f"""
WITH imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_GLCM_IMGS}))
),
px AS (
  SELECT i, x.range AS x, y.range AS y,
         ((base + 3 * x.range + 5 * y.range) % 256) // {Q} AS q
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
),
m AS (
  SELECT a.i, a.q AS q1, b.q AS q2, COUNT(*) AS n
  FROM px a JOIN px b ON b.i = a.i AND b.y = a.y AND b.x = a.x + 1
  GROUP BY 1, 2, 3
)
SELECT i AS image_id,
       CAST(SUM(n) AS BIGINT) AS n_pairs,
       CAST(SUM(n * (q1 - q2) * (q1 - q2)) AS BIGINT) AS contrast,
       CAST(SUM(n * n) AS BIGINT) AS energy,
       CAST(SUM(n * {HSCALE} // (1 + ABS(q1 - q2))) AS BIGINT)
         AS homogeneity_scaled
FROM m GROUP BY i ORDER BY image_id
"""


@query("image_glcm_texture", oracle=_GLCM_SQL)
def image_glcm_texture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer GLCM texture features (contrast / energy / scaled
    homogeneity) per image from REAL decoded bytes, pre-reduced to <=256
    co-occurrence rows per image in the Arrow kernel (module docstring)."""
    return glcm_features(spark)
