"""Histogram equalization and cloud-mask coverage over REAL decoded pixels
(SURVEY.md §2.C multimodal/vision surface; axes A+B fusion for the
coverage op).

- ``image_histogram_equalization``: the classic contrast-enhancement
  remap, integer end to end — per image, the red-channel CDF drives
  eq(v) = ((cdf(v) - cdf_min) * 255) // (npix - cdf_min) (the OpenCV
  ``equalizeHist`` formula with floor division so both engines agree
  exactly); output is the corpus census of equalized values per
  (size class, 16-wide band). The kernel decodes each Arrow batch and
  emits <= 48 pre-reduced rows per batch — bytes never cross an exchange
  (the image_channel_histogram shape).

- ``image_cloud_cover_cells``: per 4-degree geo cell, the cloudy-pixel
  share of every acquisition anchored there (brightness r+g+b >= T — the
  Landsat QA-style whiteness screen reduced to its relational shape).
  One pre-reduced row per image leaves the map task; the exchange
  carries (cell, 3 ints) and the result is the coverage-quality mosaic
  planners consume next to spatial_coverage_gap_census.

Oracles re-derive every pixel from the sources/images.py generator
formulas in SQL (symbolic replay) — a single wrong byte anywhere in the
engine's decode path shifts a count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import (
    GEO_KX,
    GEO_KY,
    GEO_M,
    synthetic_images,
)

N_EQ_IMGS = 120
EQ_BAND = 16

_EQ_PIXELS_SQL = f"""
  SELECT i, i % 3 AS size_class, w * h AS npix,
         (base + 3 * x.range + 5 * y.range) % 256 AS v
  FROM (
    SELECT i, (i * 2654435761) % 251 AS base,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
    FROM (SELECT range AS i FROM range(0, {N_EQ_IMGS}))
  ), range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
"""

_EQ_SQL = f"""
WITH px AS ({_EQ_PIXELS_SQL}),
hist AS (
  SELECT i, size_class, npix, v, COUNT(*) AS cnt
  FROM px GROUP BY i, size_class, npix, v
),
cdf AS (
  SELECT i, size_class, npix, v, cnt,
         SUM(cnt) OVER (PARTITION BY i ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS c
  FROM hist
),
mn AS (
  SELECT i, size_class, npix, v, cnt, c,
         MIN(c) OVER (PARTITION BY i) AS cmin
  FROM cdf
),
eq AS (
  SELECT size_class, cnt,
         ((c - cmin) * 255) // (npix - cmin) AS e
  FROM mn
)
SELECT CAST(size_class AS INT) AS size_class,
       CAST(e // {EQ_BAND} AS INT) AS band,
       CAST(SUM(cnt) AS BIGINT) AS n_pixels,
       CAST(SUM(e * cnt) AS BIGINT) AS sum_eq
FROM eq GROUP BY 1, 2 ORDER BY size_class, band
"""


@query("image_histogram_equalization", oracle=_EQ_SQL)
def image_histogram_equalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus census of histogram-equalized red-channel values per
    (size class, 16-wide band) — exact integer remap (module docstring)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_EQ_IMGS)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc_n = np.zeros((3, 16), np.int64)
            acc_s = np.zeros((3, 16), np.int64)
            for r in pdf.itertuples(index=False):
                i = int(r.image_id.split("-")[1])
                red = IC.decode(bytes(r.bytes), r.fmt)[:, :, 0]
                hist = np.bincount(red.ravel(), minlength=256).astype(np.int64)
                c = hist.cumsum()
                occ = hist > 0
                cmin = int(c[occ].min())
                npix = int(c[-1])
                e = ((c - cmin) * 255) // (npix - cmin)
                band = e >> 4
                sc = i % 3
                np.add.at(acc_n[sc], band[occ], hist[occ])
                np.add.at(acc_s[sc], band[occ], (e * hist)[occ])
            sc_idx, b_idx = np.nonzero(acc_n)
            yield pd.DataFrame(
                {"size_class": sc_idx.astype(np.int32),
                 "band": b_idx.astype(np.int32),
                 "n_pixels": acc_n[sc_idx, b_idx],
                 "sum_eq": acc_s[sc_idx, b_idx]}
            )

    return (
        imgs.mapInPandas(kernel, "size_class int, band int, n_pixels long, sum_eq long")
        .groupBy("size_class", "band")
        .agg(F.sum("n_pixels").alias("n_pixels"), F.sum("sum_eq").alias("sum_eq"))
        .orderBy("size_class", "band")
    )


# --- cloud-mask coverage per geo cell ----------------------------------------

N_CLOUD_IMGS = 200
CLOUD_T = 600  # r+g+b whiteness threshold
CELL_MILLI = 4000  # 4-degree cells over the 20x20 window

_CLOUD_SQL = f"""
WITH px AS (
  SELECT i,
         ((i * {GEO_KX}) % {GEO_M}) // {CELL_MILLI} AS cell_x,
         ((i * {GEO_KY}) % {GEO_M}) // {CELL_MILLI} AS cell_y,
         (base + 3 * x.range + 5 * y.range) % 256
         + (base * 7 + 11 * x.range + 2 * y.range + (x.range * y.range) % 17) % 256
         + (base * 13 + x.range // 2 + 7 * y.range) % 256 AS bright
  FROM (
    SELECT i, (i * 2654435761) % 251 AS base,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
    FROM (SELECT range AS i FROM range(0, {N_CLOUD_IMGS}))
  ), range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
),
per_img AS (
  SELECT i, cell_x, cell_y, COUNT(*) AS n_px,
         SUM(CASE WHEN bright >= {CLOUD_T} THEN 1 ELSE 0 END) AS n_cloud
  FROM px GROUP BY i, cell_x, cell_y
)
SELECT cell_x, cell_y, COUNT(*) AS n_images,
       CAST(SUM(n_px) AS BIGINT) AS n_pixels,
       CAST(SUM(n_cloud) AS BIGINT) AS n_cloud
FROM per_img GROUP BY cell_x, cell_y ORDER BY cell_x, cell_y
"""


@query("image_cloud_cover_cells", oracle=_CLOUD_SQL)
def image_cloud_cover_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cloudy-pixel share per 4-degree geo cell across all acquisitions
    anchored there (module docstring). REAL decode; one 3-int row per
    image crosses the exchange."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_CLOUD_IMGS)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                i = int(r.image_id.split("-")[1])
                px = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                bright = px.sum(axis=2)
                rows.append(
                    (
                        ((i * GEO_KX) % GEO_M) // CELL_MILLI,
                        ((i * GEO_KY) % GEO_M) // CELL_MILLI,
                        bright.size,
                        int((bright >= CLOUD_T).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["cell_x", "cell_y", "n_px", "n_cloud"]
            )

    return (
        imgs.mapInPandas(kernel, "cell_x long, cell_y long, n_px long, n_cloud long")
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_px").alias("n_pixels"),
            F.sum("n_cloud").alias("n_cloud"),
        )
        .orderBy("cell_x", "cell_y")
    )
