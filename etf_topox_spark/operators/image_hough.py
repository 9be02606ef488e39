"""Hough line transform over decoded images — integer votes, exact top-k.

The classic Hough accumulator (Duda-Hart 1972) recast relationally: an
edge pixel (x, y) votes for every (direction, offset-bucket) cell; peaks
in the accumulator are lines. Floating trig is replaced by a fixed table
of 16 integer direction vectors (a, b) — the vote key is
(a*x + b*y + 1024) DIV Q, pure int64 (the +1024
offset keeps dividends nonnegative so Spark DIV and DuckDB // agree) — so the whole transform is a map-side
explode + one partial-aggregable groupBy + a per-image top-k window, and
the DuckDB oracle replays it bit for bit.

Edge detection is REAL decode: a pixel is an edge iff its decoded
r-channel value is 0 — the wrap line of the generator's linear field
(base + 3x + 5y) % 256, which traces genuine parallel lines of direction
(3, 5) in every image, so the transform has true peaks to find (the test
asserts the winning direction is the lattice-collinear one).

Scale shape: the decode kernel emits ONLY edge pixels (~1/256 of pixels);
votes fan out 16x from those and pre-reduce map-side before the single
(image, dir, bucket) exchange; the top-k window partitions by image.
Bytes never cross an exchange. At 10^12 images nothing about the plan
changes — the accumulator is per-image bounded (<= 16 * diag/Q cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_HOUGH_IMGS = 150  # same corpus/formula as image_channel_histogram
TOP_K = 3
Q = 16  # rho bucket width

# 16 integer directions covering a half-turn (normal vectors); includes
# (3, 5) — the true normal of the generator's line family
DIRS = [
    (1, 0), (4, 1), (2, 1), (4, 3), (1, 1), (3, 4), (3, 5), (1, 2),
    (1, 4), (0, 1), (-1, 4), (-1, 2), (-3, 5), (-1, 1), (-4, 3), (-2, 1),
]


def hough_peaks(spark: SparkSession, n_images: int = N_HOUGH_IMGS) -> DataFrame:
    """Top-{TOP_K} accumulator peaks per image: (image_id, dir_id, bucket,
    votes, rank)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, n_images)

    def edges(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_i, out_x, out_y = [], [], []
            for r in pdf.itertuples(index=False):
                px = IC.decode(bytes(r.bytes), r.fmt)
                ey, ex = np.nonzero(px[..., 0] == 0)
                out_i.append(np.full(len(ex), int(r.image_id[4:]), dtype=np.int64))
                out_x.append(ex.astype(np.int64))
                out_y.append(ey.astype(np.int64))
            yield pd.DataFrame(
                {
                    "i": np.concatenate(out_i),
                    "x": np.concatenate(out_x),
                    "y": np.concatenate(out_y),
                }
            )

    e = imgs.mapInPandas(edges, "i long, x long, y long")
    dirs = spark.createDataFrame(
        [(d, a, b) for d, (a, b) in enumerate(DIRS)], "dir_id int, a long, b long"
    )
    votes = (
        e.join(F.broadcast(dirs))
        .select(
            "i",
            "dir_id",
            F.expr(f"(a * x + b * y + 1024) DIV {Q}").alias("bucket"),
        )
        .groupBy("i", "dir_id", "bucket")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("i").orderBy(
        F.col("votes").desc(), "dir_id", "bucket"
    )
    return (
        votes.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            F.col("i").alias("image_id"), "dir_id", "bucket", "votes",
            F.col("rank").cast("long").alias("rank")
        )
        .orderBy("image_id", "rank")
    )


def _hough_sql() -> str:
    dirs = ",\n    ".join(f"({d}, {a}, {b})" for d, (a, b) in enumerate(DIRS))
    return f"""
WITH imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_HOUGH_IMGS}))
),
edges AS (
  SELECT i, x.range AS x, y.range AS y
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
    AND (base + 3 * x.range + 5 * y.range) % 256 = 0
),
dirs(dir_id, a, b) AS (VALUES
    {dirs}
),
votes AS (
  SELECT e.i, d.dir_id, (d.a * e.x + d.b * e.y + 1024) // {Q} AS bucket,
         COUNT(*) AS votes
  FROM edges e CROSS JOIN dirs d
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT i, dir_id, bucket, votes,
         ROW_NUMBER() OVER (PARTITION BY i
                            ORDER BY votes DESC, dir_id, bucket) AS rank
  FROM votes
)
SELECT i AS image_id, dir_id, bucket, votes, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY image_id, rank
"""


@query("image_hough_lines", oracle=_hough_sql())
def image_hough_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} Hough accumulator peaks per image over REAL decoded
    edge pixels, with a 16-direction integer vote table (module
    docstring). The oracle replays edge extraction symbolically and the
    identical integer accumulator in SQL."""
    return hough_peaks(spark)
