"""FAST-style corner census over REAL decoded pixels (SURVEY.md §2.C
vision surface — the keypoint-detection primitive feeding every
feature-matching / SLAM / stitching pipeline).

Simplified FAST-12 WITHOUT the contiguity constraint (the segment-test
count form): an interior pixel p is a corner when >= 12 of the 16
Bresenham-circle ring neighbors are brighter than p + T (bright corner)
or >= 12 are darker than p - T (dark corner). Pure integer comparisons on
the green channel. The census is per size class: interior pixels, bright
corners, dark corners, and the summed bright-exceedance score.

Scale shape: map-only decode kernel (numpy ring shifts, one pre-reduced
row per image); the oracle replays the green generator formula at all 16
ring offsets per pixel in SQL (~23M integer terms — a different
evaluation of the identical test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_FC_IMGS = 100
FAST_T = 20
FAST_N = 12

# the FAST-16 Bresenham circle, radius 3
RING = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]

_G = "(base * 7 + 11 * ({x}) + 2 * ({y}) + (({x}) * ({y})) % 17) % 256"


def _fc_sql() -> str:
    p = _G.format(x="x.range", y="y.range")
    brights = " + ".join(
        f"CASE WHEN ({_G.format(x=f'x.range + {dx}', y=f'y.range + {dy}')})"
        f" > ({p}) + {FAST_T} THEN 1 ELSE 0 END"
        for dx, dy in RING
    )
    darks = " + ".join(
        f"CASE WHEN ({_G.format(x=f'x.range + {dx}', y=f'y.range + {dy}')})"
        f" < ({p}) - {FAST_T} THEN 1 ELSE 0 END"
        for dx, dy in RING
    )
    return f"""
WITH px AS (
  SELECT i % 3 AS size_class, ({brights}) AS nb, ({darks}) AS nd
  FROM (
    SELECT i, (i * 2654435761) % 251 AS base,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
    FROM (SELECT range AS i FROM range(0, {N_FC_IMGS}))
  ), range(0, 128) x, range(0, 128) y
  WHERE x.range >= 3 AND x.range < w - 3 AND y.range >= 3 AND y.range < h - 3
)
SELECT CAST(size_class AS INT) AS size_class,
       COUNT(*) AS n_interior,
       CAST(SUM(CASE WHEN nb >= {FAST_N} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bright_corners,
       CAST(SUM(CASE WHEN nd >= {FAST_N} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dark_corners,
       CAST(SUM(CASE WHEN nb >= {FAST_N} THEN nb ELSE 0 END) AS BIGINT)
         AS sum_bright_score
FROM px GROUP BY 1 ORDER BY size_class
"""


@query("image_fast_corners", oracle=_fc_sql())
def image_fast_corners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus corner census per size class under the simplified FAST-12
    segment-count test on the green channel (module docstring)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_FC_IMGS)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                i = int(r.image_id.split("-")[1])
                g = IC.decode(bytes(r.bytes), r.fmt)[:, :, 1].astype(np.int64)
                h, w = g.shape
                c = g[3:h - 3, 3:w - 3]
                nb = np.zeros_like(c)
                nd = np.zeros_like(c)
                for dx, dy in RING:
                    nbr = g[3 + dy:h - 3 + dy, 3 + dx:w - 3 + dx]
                    nb += nbr > c + FAST_T
                    nd += nbr < c - FAST_T
                rows.append(
                    (i % 3, c.size, int((nb >= FAST_N).sum()),
                     int((nd >= FAST_N).sum()),
                     int(nb[nb >= FAST_N].sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["size_class", "n_interior", "n_bright_corners",
                         "n_dark_corners", "sum_bright_score"],
            )

    return (
        imgs.mapInPandas(
            kernel,
            "size_class int, n_interior long, n_bright_corners long, "
            "n_dark_corners long, sum_bright_score long",
        )
        .groupBy("size_class")
        .agg(
            F.sum("n_interior").alias("n_interior"),
            F.sum("n_bright_corners").alias("n_bright_corners"),
            F.sum("n_dark_corners").alias("n_dark_corners"),
            F.sum("sum_bright_score").alias("sum_bright_score"),
        )
        .orderBy("size_class")
    )
