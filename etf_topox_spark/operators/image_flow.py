"""Block-matching motion estimation between revisit pairs over REAL
decoded pixels (SURVEY.md §2.C vision surface — the MPEG/stitching motion
-vector primitive; sibling of image_column_align, which solves the 1-D
version over profiles).

For every interior 16x16 block of the pair's first image, the (dx, dy) in
[-SEARCH, SEARCH]^2 minimizing the integer SSD against the second image's
shifted window, tie-broken lexicographically by (ssd, dy, dx). Interior
blocks only (all candidate windows in-bounds), so the census needs no
boundary CASEs.

Scale shape: the pair's two payloads co-partition via ONE exchange on
pair_id (the image_change_detection shape); the 49-shift sweep runs
vectorized inside the grouped Arrow kernel and emits one row per block —
never a pixel — into the result. The oracle replays the generator
formulas per (block, shift, pixel) in SQL: ~5M integer terms, a genuinely
different evaluation with the identical argmin rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_OF_PAIRS = 24
BLK = 16
SEARCH = 3

_RA = "(base_a + 3 * ({x}) + 5 * ({y})) % 256"
_RB = "(base_b + 3 * ({x}) + 5 * ({y})) % 256"

_OF_SQL = f"""
WITH pairs AS (
  SELECT k, (k * 2654435761) % 251 AS base_a,
         ((k + {3 * N_OF_PAIRS}) * 2654435761) % 251 AS base_b,
         CASE k % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE k % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS k FROM range(0, {N_OF_PAIRS}))
),
blocks AS (
  SELECT k, base_a, base_b, bx.range AS bx, by.range AS by
  FROM pairs, range(1, 8) bx, range(1, 8) by
  WHERE (bx.range + 2) * {BLK} <= w AND (by.range + 2) * {BLK} <= h
),
sweep AS (
  SELECT b.k, b.bx, b.by, dx.range AS dx, dy.range AS dy,
         SUM(
           (({_RA.format(x=f'b.bx * {BLK} + u.range', y=f'b.by * {BLK} + v.range')})
            - ({_RB.format(x=f'b.bx * {BLK} + u.range + dx.range',
                           y=f'b.by * {BLK} + v.range + dy.range')}))
           * (({_RA.format(x=f'b.bx * {BLK} + u.range', y=f'b.by * {BLK} + v.range')})
              - ({_RB.format(x=f'b.bx * {BLK} + u.range + dx.range',
                             y=f'b.by * {BLK} + v.range + dy.range')}))
         ) AS ssd
  FROM blocks b,
       range(-{SEARCH}, {SEARCH + 1}) dx, range(-{SEARCH}, {SEARCH + 1}) dy,
       range(0, {BLK}) u, range(0, {BLK}) v
  GROUP BY 1, 2, 3, 4, 5
),
rk AS (
  SELECT k, bx, by, dx, dy, ssd,
         ROW_NUMBER() OVER (PARTITION BY k, bx, by ORDER BY ssd, dy, dx) AS rn
  FROM sweep
)
SELECT k AS pair_id, CAST(bx AS BIGINT) AS bx, CAST(by AS BIGINT) AS by,
       CAST(dx AS BIGINT) AS best_dx, CAST(dy AS BIGINT) AS best_dy,
       CAST(ssd AS BIGINT) AS best_ssd
FROM rk WHERE rn = 1 ORDER BY pair_id, by, bx
"""


@query("image_block_flow", oracle=_OF_SQL)
def image_block_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block motion vectors between the two acquisitions of each
    revisit pair: integer-SSD argmin over the (2*SEARCH+1)^2 search
    window with the (ssd, dy, dx) lexicographic tie rule (module
    docstring)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    n = 4 * N_OF_PAIRS
    imgs = synthetic_images(spark, n).withColumn(
        "i", F.expr("CAST(substring(image_id, 5) AS BIGINT)")
    ).filter((F.col("i") < N_OF_PAIRS) | (F.col("i") >= 3 * N_OF_PAIRS))
    keyed = imgs.withColumn("pair_id", F.expr(f"i % {3 * N_OF_PAIRS}"))

    def kernel(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("i")
        if len(pdf) != 2:
            raise ValueError(f"pair {key} has {len(pdf)} members")
        a_row, b_row = pdf.iloc[0], pdf.iloc[1]
        ra = IC.decode(bytes(a_row["bytes"]), a_row["fmt"])[:, :, 0].astype(np.int64)
        rb = IC.decode(bytes(b_row["bytes"]), b_row["fmt"])[:, :, 0].astype(np.int64)
        h, w = ra.shape
        bxs = [bx for bx in range(1, 8) if (bx + 2) * BLK <= w]
        bys = [by for by in range(1, 8) if (by + 2) * BLK <= h]
        best = {}
        # shifts iterated in (dy, dx) order with strict-less keeps the
        # lexicographic (ssd, dy, dx) argmin
        for dy in range(-SEARCH, SEARCH + 1):
            for dx in range(-SEARCH, SEARCH + 1):
                for by in bys:
                    for bx in bxs:
                        y0, x0 = by * BLK, bx * BLK
                        d = (
                            ra[y0:y0 + BLK, x0:x0 + BLK]
                            - rb[y0 + dy:y0 + dy + BLK, x0 + dx:x0 + dx + BLK]
                        )
                        ssd = int((d * d).sum())
                        cur = best.get((bx, by))
                        if cur is None or ssd < cur[0]:
                            best[(bx, by)] = (ssd, dx, dy)
        return pd.DataFrame(
            [
                (int(key[0]), bx, by, dx, dy, ssd)
                for (bx, by), (ssd, dx, dy) in sorted(
                    best.items(), key=lambda kv: (kv[0][1], kv[0][0])
                )
            ],
            columns=["pair_id", "bx", "by", "best_dx", "best_dy", "best_ssd"],
        )

    return (
        keyed.groupBy("pair_id")
        .applyInPandas(
            kernel,
            "pair_id long, bx long, by long, best_dx long, best_dy long, "
            "best_ssd long",
        )
        .orderBy("pair_id", "by", "bx")
    )
