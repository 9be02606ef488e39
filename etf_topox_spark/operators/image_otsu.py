"""Per-image Otsu threshold selection — exact, no floating point anywhere.

Otsu's method (Otsu 1979, "A Threshold Selection Method from Gray-Level
Histograms") picks the threshold t maximizing the between-class variance

    sigma_B^2(t) = (S*n0(t) - N*s0(t))^2 / (N^2 * n0(t) * (N - n0(t)))

where n0/s0 are the cumulative count / gray-mass below t and N/S the
totals. The N^2 factor is constant per image, so the argmax reduces to
maximizing num(t)/den(t) with num = (S*n0 - N*s0)^2 and den = n0*(N-n0) —
pure integers. Both engines compare candidates by 128-bit cross
multiplication (Spark DECIMAL(38,0) arithmetic, DuckDB HUGEINT), so the
selected threshold is exact and the driver hash cannot drift on a last
ULP (the supplier_wilson_ranking lesson: never ship raw float chains
through the contract when an integer formulation exists).

Spark shape: the only Python is the Arrow decode kernel, which emits ONE
pre-reduced 256-bin histogram per (image, batch) — pixels never cross an
exchange (same map-side-combine shape as image_channel_histogram, the
lossless-decode proof this query builds on). The cumulative pass is two
window functions over <= 256 rows per image; the exact argmax is a
broadcast self-anti-join on (image, candidate) pairs — <= 256^2 int128
comparisons per image, all JVM-side.

Oracle: the r-channel generator formula (base + 3x + 5y) % 256 replayed
symbolically in SQL (sources/images.py:40), identical cumulative windows,
identical HUGEINT cross-multiplied argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_OTSU_IMGS = 150  # same corpus as image_channel_histogram


def otsu_thresholds(spark: SparkSession, n_images: int = N_OTSU_IMGS) -> DataFrame:
    """(image_id, otsu_t, n_below, sum_below, n_total, sum_total) per image:
    the exact Otsu threshold over the decoded r channel, plus the class
    statistics at that threshold."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, n_images)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, bins, ns = [], [], []
            for r in pdf.itertuples(index=False):
                px = IC.decode(bytes(r.bytes), r.fmt)
                cnt = np.bincount(px[..., 0].ravel(), minlength=256)
                nz = np.nonzero(cnt)[0]
                ids.append(np.full(len(nz), int(r.image_id[4:]), dtype=np.int64))
                bins.append(nz.astype(np.int64))
                ns.append(cnt[nz].astype(np.int64))
            yield pd.DataFrame(
                {
                    "i": np.concatenate(ids),
                    "bin": np.concatenate(bins),
                    "n": np.concatenate(ns),
                }
            )

    hist = (
        imgs.mapInPandas(kernel, "i long, bin long, n long")
        .groupBy("i", "bin")
        .agg(F.sum("n").alias("n"))
    )
    wcum = Window.partitionBy("i").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("i")
    cum = hist.select(
        "i",
        "bin",
        F.sum("n").over(wcum).alias("n0"),
        F.sum(F.col("bin") * F.col("n")).over(wcum).alias("s0"),
        F.sum("n").over(wall).alias("nt"),
        F.sum(F.col("bin") * F.col("n")).over(wall).alias("st"),
    )
    # candidates: 0 < n0 < N; argmax t is always an occupied bin (between
    # occupied bins the cumulatives are flat and the tie-break takes the
    # run's first bin, which is occupied)
    diff = (F.col("st") * F.col("n0") - F.col("nt") * F.col("s0")).cast(
        "decimal(12,0)"
    )
    cand = cum.filter((F.col("n0") > 0) & (F.col("n0") < F.col("nt"))).select(
        "i",
        "bin",
        "n0",
        "s0",
        "nt",
        "st",
        (diff * diff).alias("num"),  # decimal(25,0)
        (F.col("n0") * (F.col("nt") - F.col("n0"))).cast("decimal(10,0)").alias("den"),
    )
    a, b = cand.alias("a"), cand.alias("b")
    beaten = (F.col("b.num") * F.col("a.den") > F.col("a.num") * F.col("b.den")) | (
        (F.col("b.num") * F.col("a.den") == F.col("a.num") * F.col("b.den"))
        & (F.col("b.bin") < F.col("a.bin"))
    )
    best = a.join(
        b, (F.col("b.i") == F.col("a.i")) & beaten, "left_anti"
    )
    return best.select(
        F.col("a.i").alias("image_id"),
        F.col("a.bin").alias("otsu_t"),
        F.col("a.n0").alias("n_below"),
        F.col("a.s0").alias("sum_below"),
        F.col("a.nt").alias("n_total"),
        F.col("a.st").alias("sum_total"),
    ).orderBy("image_id")


_OTSU_SQL = f"""
WITH imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_OTSU_IMGS}))
),
px AS (
  SELECT i, (base + 3 * x.range + 5 * y.range) % 256 AS bin
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
),
hist AS (SELECT i, bin, COUNT(*) AS n FROM px GROUP BY i, bin),
cum AS (
  SELECT i, bin,
         SUM(n) OVER (PARTITION BY i ORDER BY bin) AS n0,
         SUM(bin * n) OVER (PARTITION BY i ORDER BY bin) AS s0,
         SUM(n) OVER (PARTITION BY i) AS nt,
         SUM(bin * n) OVER (PARTITION BY i) AS st
  FROM hist
),
cand AS (
  SELECT i, bin, n0, s0, nt, st,
         CAST(st * n0 - nt * s0 AS HUGEINT)
           * CAST(st * n0 - nt * s0 AS HUGEINT) AS num,
         CAST(n0 * (nt - n0) AS HUGEINT) AS den
  FROM cum WHERE n0 > 0 AND n0 < nt
)
SELECT a.i AS image_id, a.bin AS otsu_t,
       a.n0 AS n_below, a.s0 AS sum_below,
       a.nt AS n_total, a.st AS sum_total
FROM cand a
WHERE NOT EXISTS (
  SELECT 1 FROM cand b
  WHERE b.i = a.i
    AND (b.num * a.den > a.num * b.den
         OR (b.num * a.den = a.num * b.den AND b.bin < a.bin))
)
ORDER BY image_id
"""


@query("image_otsu_threshold", oracle=_OTSU_SQL)
def image_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Otsu threshold per image over REAL decoded r-channel bytes,
    with class statistics at the selected threshold. Integer end-to-end
    (module docstring); the oracle replays the generator symbolically and
    re-derives the same argmax with HUGEINT cross multiplication."""
    return otsu_thresholds(spark)
