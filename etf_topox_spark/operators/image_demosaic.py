"""Bayer-demosaic reconstruction error census over REAL decoded pixels
(SURVEY.md §2.C vision surface — the sensor-ingest primitive every raw
imagery pipeline runs before anything else).

The RGB truth is resampled onto an RGGB color filter array (even-row
even-col = R, odd-row odd-col = B, the other two sites G), then green is
reconstructed at every interior R and B site by the standard 4-neighbor
bilinear average. All CFA neighbors of an R/B site are G sites, so the
reconstruction is exact integers when kept as the x4 numerator:

    err(x, y) = | G(x-1,y) + G(x+1,y) + G(x,y-1) + G(x,y+1) - 4*G(x,y) |

i.e. the absolute discrete Laplacian of the green channel — the census
doubles as a sensor-noise / texture activity statistic. The kernel builds
the CFA mosaic from the decoded bytes and sums 4-neighbor values OF THE
MOSAIC (not the truth), so any mistake in the CFA layout or decode path
shifts the census; the oracle replays the green generator formula
symbolically in SQL.

Scale shape: map-only decode kernel, one pre-reduced row per (image,
site-color) — 2 rows per image cross the single census exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_DM_IMGS = 150

_G = "(base * 7 + 11 * ({x}) + 2 * ({y}) + (({x}) * ({y})) % 17) % 256"

_DM_SQL = f"""
WITH sites AS (
  SELECT i % 3 AS size_class,
         CASE WHEN y.range % 2 = 0 THEN 0 ELSE 2 END AS site_color,
         ABS({_G.format(x='x.range - 1', y='y.range')}
             + {_G.format(x='x.range + 1', y='y.range')}
             + {_G.format(x='x.range', y='y.range - 1')}
             + {_G.format(x='x.range', y='y.range + 1')}
             - 4 * ({_G.format(x='x.range', y='y.range')})) AS err
  FROM (
    SELECT i, (i * 2654435761) % 251 AS base,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
    FROM (SELECT range AS i FROM range(0, {N_DM_IMGS}))
  ), range(0, 128) x, range(0, 128) y
  WHERE x.range >= 1 AND x.range < w - 1 AND y.range >= 1 AND y.range < h - 1
    AND x.range % 2 = y.range % 2
)
SELECT CAST(size_class AS INT) AS size_class, CAST(site_color AS INT) AS site_color,
       COUNT(*) AS n_sites,
       CAST(SUM(err) AS BIGINT) AS sum_err, CAST(MAX(err) AS BIGINT) AS max_err
FROM sites GROUP BY 1, 2 ORDER BY size_class, site_color
"""


@query("image_bayer_demosaic", oracle=_DM_SQL)
def image_bayer_demosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Green-channel demosaic error census per (size class, CFA site
    color): interior R (0) and B (2) sites, 4-neighbor bilinear x4
    numerator vs truth (module docstring)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_DM_IMGS)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc: dict[tuple[int, int], list[int]] = {}
            for r in pdf.itertuples(index=False):
                i = int(r.image_id.split("-")[1])
                px = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                h, w = px.shape[:2]
                # RGGB CFA mosaic from the decoded truth
                yy, xx = np.mgrid[0:h, 0:w]
                chan = np.where((yy % 2 == 0) & (xx % 2 == 0), 0,
                                np.where((yy % 2 == 1) & (xx % 2 == 1), 2, 1))
                m = np.take_along_axis(px, chan[:, :, None], axis=2)[:, :, 0]
                g = px[:, :, 1]
                rec = (m[1:-1, :-2] + m[1:-1, 2:] + m[:-2, 1:-1] + m[2:, 1:-1])
                err = np.abs(rec - 4 * g[1:-1, 1:-1])
                ys, xs = yy[1:-1, 1:-1], xx[1:-1, 1:-1]
                for color, mask in ((0, (ys % 2 == 0) & (xs % 2 == 0)),
                                    (2, (ys % 2 == 1) & (xs % 2 == 1))):
                    e = err[mask]
                    a = acc.setdefault((i % 3, color), [0, 0, 0])
                    a[0] += int(e.size)
                    a[1] += int(e.sum())
                    a[2] = max(a[2], int(e.max()))
            yield pd.DataFrame(
                [(sc, c, *v) for (sc, c), v in acc.items()],
                columns=["size_class", "site_color", "n_sites", "sum_err", "max_err"],
            )

    return (
        imgs.mapInPandas(
            kernel,
            "size_class int, site_color int, n_sites long, sum_err long, max_err long",
        )
        .groupBy("size_class", "site_color")
        .agg(
            F.sum("n_sites").alias("n_sites"),
            F.sum("sum_err").alias("sum_err"),
            F.max("max_err").alias("max_err"),
        )
        .orderBy("size_class", "site_color")
    )
