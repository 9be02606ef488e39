"""Co-registered change detection and 1-D registration alignment over REAL
decoded pixels (SURVEY.md §2.C vision surface; the axes-A+B revisit
analytics next to image_geo_phash_dedup).

- ``image_change_detection``: pixel-aligned difference census between the
  two acquisitions of each revisit pair — the bitemporal change-mask
  primitive (NDVI differencing, urban-growth screening) reduced to its
  relational shape. Pairs are (k, k+3*N) so both members share a size
  class; the pair's two byte payloads are co-partitioned by ONE exchange
  on pair_id (the honest cost of pixel-aligned comparison — bytes move
  exactly once, then the grouped Arrow kernel decodes both and emits one
  summary row). At fleet scale the exchange is bounded by the revisit
  pairing, never all-pairs.

- ``image_column_align``: registration shift estimation — integer SSD of
  red-channel COLUMN PROFILES over shifts in [-SHIFT, SHIFT], argmin with
  the (ssd, shift) lexicographic tie rule. The stitching/alignment
  primitive run before mosaic seam selection. Profiles are pre-reduced
  map-side (w int64 rows per image — bytes never cross an exchange); the
  shift sweep is an explode+equi-join of the tiny profile table and the
  argmin a per-pair window.

Oracles replay the sources/images.py generator formulas symbolically in
SQL — any wrong byte in the decode path shifts a sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_CH_PAIRS = 60
CH_T = 64  # changed-pixel threshold on |d|

_CH_SQL = f"""
WITH pairs AS (
  SELECT k, (k * 2654435761) % 251 AS base_a,
         ((k + {3 * N_CH_PAIRS}) * 2654435761) % 251 AS base_b,
         CASE k % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE k % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS k FROM range(0, {N_CH_PAIRS}))
),
px AS (
  SELECT k, k % 3 AS size_class,
         (base_a + 3 * x.range + 5 * y.range) % 256
         - (base_b + 3 * x.range + 5 * y.range) % 256 AS d
  FROM pairs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
)
SELECT k AS pair_id, CAST(MIN(size_class) AS INT) AS size_class,
       COUNT(*) AS n_px,
       CAST(SUM(CASE WHEN ABS(d) >= {CH_T} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(SUM(ABS(d)) AS BIGINT) AS sad,
       CAST(MAX(ABS(d)) AS BIGINT) AS max_abs
FROM px GROUP BY k ORDER BY pair_id
"""


@query("image_change_detection", oracle=_CH_SQL)
def image_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal change census per revisit pair: changed-pixel count at
    |d| >= CH_T, total absolute difference and max excursion of the
    pixel-aligned red-channel diff (module docstring)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    n = 4 * N_CH_PAIRS
    imgs = synthetic_images(spark, n).filter(
        (F.expr("CAST(substring(image_id, 5) AS BIGINT)") < N_CH_PAIRS)
        | (F.expr("CAST(substring(image_id, 5) AS BIGINT)") >= 3 * N_CH_PAIRS)
    )
    keyed = imgs.withColumn(
        "i", F.expr("CAST(substring(image_id, 5) AS BIGINT)")
    ).withColumn("pair_id", F.expr(f"i % {3 * N_CH_PAIRS}"))

    def kernel(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("i")
        if len(pdf) != 2:  # pairing invariant (survives python -O)
            raise ValueError(f"pair {key} has {len(pdf)} members")
        a, b = pdf.iloc[0], pdf.iloc[1]
        ra = IC.decode(bytes(a["bytes"]), a["fmt"])[:, :, 0].astype(np.int64)
        rb = IC.decode(bytes(b["bytes"]), b["fmt"])[:, :, 0].astype(np.int64)
        d = np.abs(ra - rb)
        return pd.DataFrame(
            {
                "pair_id": [int(key[0])],
                "size_class": [int(a["i"]) % 3],
                "n_px": [int(d.size)],
                "n_changed": [int((d >= CH_T).sum())],
                "sad": [int(d.sum())],
                "max_abs": [int(d.max())],
            }
        )

    return (
        keyed.groupBy("pair_id")
        .applyInPandas(
            kernel,
            "pair_id long, size_class int, n_px long, n_changed long, "
            "sad long, max_abs long",
        )
        .orderBy("pair_id")
    )


# --- 1-D registration: column-profile SSD over shifts -------------------------

N_AL_PAIRS = 40
SHIFT = 8

_AL_PROFILES_SQL = f"""
  SELECT i % {3 * N_AL_PAIRS} AS pair_id,
         CASE WHEN i < {N_AL_PAIRS} THEN 0 ELSE 1 END AS role,
         x.range AS x,
         SUM((base + 3 * x.range + 5 * y.range) % 256) AS v
  FROM (
    SELECT i, (i * 2654435761) % 251 AS base,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
    FROM (SELECT range AS i FROM range(0, {4 * N_AL_PAIRS}))
    WHERE i < {N_AL_PAIRS} OR i >= {3 * N_AL_PAIRS}
  ), range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
  GROUP BY 1, 2, 3
"""

_AL_SQL = f"""
WITH prof AS ({_AL_PROFILES_SQL}),
sweep AS (
  SELECT a.pair_id, s.range AS s,
         SUM((a.v - b.v) * (a.v - b.v)) AS ssd,
         COUNT(*) AS n_cols
  FROM prof a
  JOIN prof b ON b.pair_id = a.pair_id AND b.role = 1
  CROSS JOIN range(-{SHIFT}, {SHIFT + 1}) s
  WHERE a.role = 0 AND b.x = a.x + s.range
  GROUP BY 1, 2
),
rk AS (
  SELECT pair_id, s, ssd, n_cols,
         ROW_NUMBER() OVER (PARTITION BY pair_id ORDER BY ssd, s) AS rn
  FROM sweep
)
SELECT pair_id, CAST(s AS BIGINT) AS best_shift,
       CAST(ssd AS BIGINT) AS best_ssd, n_cols AS n_overlap_cols
FROM rk WHERE rn = 1 ORDER BY pair_id
"""


@query("image_column_align", oracle=_AL_SQL)
def image_column_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registration shift per revisit pair: argmin over shifts in
    [-SHIFT, SHIFT] of the integer SSD between the pair's red-channel
    column profiles (module docstring)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    n = 4 * N_AL_PAIRS
    imgs = synthetic_images(spark, n).withColumn(
        "i", F.expr("CAST(substring(image_id, 5) AS BIGINT)")
    ).filter((F.col("i") < N_AL_PAIRS) | (F.col("i") >= 3 * N_AL_PAIRS))

    def profiles(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                red = IC.decode(bytes(r.bytes), r.fmt)[:, :, 0].astype(np.int64)
                cs = red.sum(axis=0)
                i = int(r.i)
                pair = i % (3 * N_AL_PAIRS)
                role = 0 if i < N_AL_PAIRS else 1
                out.append(
                    pd.DataFrame(
                        {"pair_id": pair, "role": role,
                         "x": np.arange(len(cs), dtype=np.int64), "v": cs}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    prof = imgs.mapInPandas(profiles, "pair_id long, role int, x long, v long")
    a = prof.filter(F.col("role") == 0).select(
        "pair_id", F.col("x").alias("ax"), F.col("v").alias("va")
    )
    b = prof.filter(F.col("role") == 1).select(
        F.col("pair_id").alias("pb"), F.col("x").alias("bx"), F.col("v").alias("vb")
    )
    shifts = F.array(*[F.lit(s) for s in range(-SHIFT, SHIFT + 1)])
    aw = a.select("pair_id", "ax", "va", F.explode(shifts).alias("s"))
    sweep = (
        aw.join(
            b,
            (F.col("pb") == F.col("pair_id")) & (F.col("bx") == F.col("ax") + F.col("s")),
        )
        .groupBy("pair_id", "s")
        .agg(
            F.sum((F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))).alias("ssd"),
            F.count(F.lit(1)).alias("n_cols"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pair_id").orderBy("ssd", "s")
    return (
        sweep.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "pair_id",
            F.col("s").cast("long").alias("best_shift"),
            "ssd",
            F.col("n_cols").alias("n_overlap_cols"),
        )
        .withColumnRenamed("ssd", "best_ssd")
        .orderBy("pair_id")
    )
